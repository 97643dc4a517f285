"""Bezier swing-foot trajectory.

Re-design of the reference's 4th-degree Bezier swing curve
(reference: src/legged_ctrl/src/utils/Utils.cpp:136-206). Control points per
axis are [start, start, final, final, final] with two z-clearance lifts on
control points 1 and 2 (reference: Utils.cpp:169-170).

Note: the reference's `bezier_curve` never computes the velocity output (its
`dy` is always zero, Utils.cpp:179-192) — swing velocity comes from finite
differences in the gait FSM (LeggedContactFSM.cpp:253). We additionally expose
the true analytic derivative for consumers that want it.
"""

import jax.numpy as jnp

from legged_mpc_control_tpu.constants import (
    FOOT_SWING_CLEARANCE1,
    FOOT_SWING_CLEARANCE2,
)

# degree-4 Bernstein binomial coefficients (reference: Utils.cpp:187)
_BINOM = (1.0, 4.0, 6.0, 4.0, 1.0)


def _control_points(p_start, p_final, terrain_pitch_angle):
    """(..., 3) endpoints -> (..., 5, 3) control points."""
    lift = jnp.stack([
        jnp.zeros_like(p_start),
        jnp.concatenate([
            jnp.zeros_like(p_start[..., :2]),
            jnp.full_like(p_start[..., 2:], FOOT_SWING_CLEARANCE1),
        ], axis=-1),
        jnp.concatenate([
            jnp.zeros_like(p_start[..., :2]),
            FOOT_SWING_CLEARANCE2 + 0.5 * jnp.sin(terrain_pitch_angle)
            * jnp.ones_like(p_start[..., 2:]),
        ], axis=-1),
        jnp.zeros_like(p_start),
        jnp.zeros_like(p_start),
    ], axis=-2)
    base = jnp.stack([p_start, p_start, p_final, p_final, p_final], axis=-2)
    return base + lift


def swing_foot_pos(t, p_start, p_final, terrain_pitch_angle=0.0):
    """Swing-foot position at phase t in [0, 1].

    reference: Utils.cpp:136-176 (`BezierUtils::get_foot_pos_curve`).
    """
    cp = _control_points(p_start, p_final, terrain_pitch_angle)  # (...,5,3)
    t = jnp.asarray(t)[..., None]
    u = 1.0 - t
    w = jnp.stack([
        _BINOM[i] * t[..., 0] ** i * u[..., 0] ** (4 - i) for i in range(5)
    ], axis=-1)                                                   # (...,5)
    return jnp.einsum("...i,...ij->...j", w, cp)


def swing_foot_pos_vel(t, p_start, p_final, swing_duration,
                       terrain_pitch_angle=0.0):
    """Position and analytic velocity of the swing curve.

    Unlike the reference (whose analytic velocity path is dead code), this
    returns d(pos)/d(wall time) given the swing phase duration in seconds.
    """
    cp = _control_points(p_start, p_final, terrain_pitch_angle)
    t = jnp.asarray(t)[..., None]
    u = 1.0 - t
    w = jnp.stack([
        _BINOM[i] * t[..., 0] ** i * u[..., 0] ** (4 - i) for i in range(5)
    ], axis=-1)
    pos = jnp.einsum("...i,...ij->...j", w, cp)
    # derivative of a degree-4 Bezier: 4 * sum B_{3,i}(t) (P_{i+1}-P_i)
    dcp = cp[..., 1:, :] - cp[..., :-1, :]
    w3 = jnp.stack([
        (1.0, 3.0, 3.0, 1.0)[i] * t[..., 0] ** i * u[..., 0] ** (3 - i)
        for i in range(4)
    ], axis=-1)
    dpos_dt = 4.0 * jnp.einsum("...i,...ij->...j", w3, dcp)
    return pos, dpos_dt / swing_duration
