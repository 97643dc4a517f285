"""Functional moving-window filters.

Replaces the reference's stateful `MovingWindowFilter` (O(1) compensated
moving average, reference: include/utils/MovingWindowFilter.hpp) with an
immutable ring-buffer pytree — the functional-state equivalent that composes
with `jit`/`vmap`/`scan`. Windows here are small (<= 50 taps) so a plain mean
over the buffer is exact enough; no Neumaier compensation needed.
"""

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MovingWindowState:
    """Ring buffer state. `buf` has shape (window,) + value_shape."""
    buf: Any
    idx: jnp.ndarray          # scalar int32, next write position
    count: jnp.ndarray        # scalar int32, number of valid samples


def moving_window_init(window: int, value_shape=(), dtype=jnp.float32):
    return MovingWindowState(
        buf=jnp.zeros((window,) + tuple(value_shape), dtype=dtype),
        idx=jnp.zeros((), dtype=jnp.int32),
        count=jnp.zeros((), dtype=jnp.int32),
    )


def moving_window_update(state: MovingWindowState, value):
    """Push `value`; returns (new_state, average over valid samples)."""
    window = state.buf.shape[0]
    buf = state.buf.at[state.idx].set(value)
    count = jnp.minimum(state.count + 1, window)
    idx = (state.idx + 1) % window
    avg = jnp.sum(buf, axis=0) / count.astype(buf.dtype)
    return MovingWindowState(buf=buf, idx=idx, count=count), avg
