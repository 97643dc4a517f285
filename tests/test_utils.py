"""Bag (diagnostics) and checkpoint round-trip tests."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.sim import srb_sim
from legged_mpc_control_tpu.utils import bag, checkpoint

DTYPE = jnp.float64


def make_loop():
    params = a1_params(DTYPE)
    return step_mod.LoopState(
        controller=step_mod.controller_init(params, dtype=DTYPE),
        sim=srb_sim.sim_init(params, height=0.3, dtype=DTYPE))


def test_bag_roundtrip_and_dataframe():
    loop = make_loop()
    rec = bag.diag_from_loop(loop)
    # stack 5 fake ticks
    series = jax.tree.map(lambda x: jnp.stack([x] * 5), rec)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "run.npz")
        bag.save_bag(path, series, meta={"dt": 0.01, "robot": "a1"})
        loaded, meta = bag.load_bag(path)
        assert meta["robot"] == "a1"
        np.testing.assert_allclose(loaded["root_pos"],
                                   np.asarray(series["root_pos"]))
        df = bag.bag_to_dataframe(loaded, dt=meta["dt"])
        assert "root_pos_2" in df.columns
        assert len(df) == 5


def test_checkpoint_roundtrip():
    loop = make_loop()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.pkl")
        checkpoint.save_checkpoint(path, loop, step=42)
        restored, step = checkpoint.load_checkpoint(path, target=loop)
        assert step == 42
        for a, b in zip(jax.tree.leaves(loop), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_structure_mismatch_rejected():
    loop = make_loop()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.pkl")
        checkpoint.save_checkpoint(path, {"a": jnp.zeros(3)})
        try:
            checkpoint.load_checkpoint(path, target=loop)
            assert False, "should have raised"
        except ValueError:
            pass
