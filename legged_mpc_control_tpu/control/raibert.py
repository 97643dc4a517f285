"""Raibert-heuristic foothold planning.

reference: BaseInterface.cpp:358-399 — foothold = yaw-rotated default stance
position + delta, with
    delta = sqrt(h/g) (v - v_d) + T_stance/4 * v_d
(the reference writes T_stance/4 as (1/speed/2)/2) and per-axis clamping.
"""

import jax.numpy as jnp

from legged_mpc_control_tpu.constants import (
    FOOT_DELTA_X_LIMIT,
    FOOT_DELTA_Y_LIMIT,
)
from legged_mpc_control_tpu.config import RobotParams


def raibert_footholds(root_pos, root_lin_vel, root_rot_mat_z,
                      root_lin_vel_d_rel, params: RobotParams,
                      terrain=None):
    """Returns (target_abs (4,3), target_world (4,3)).

    reference: BaseInterface.cpp:358-399. With a height map, the foothold's
    z snaps to the terrain under the planned xy (height-map footholds — the
    reference's FSM instead discovers terrain height at touchdown,
    LeggedContactFSM.cpp:86-90; planning on the map steps boxes cleanly).
    """
    v = root_lin_vel.at[2].set(0.0)
    v_d = root_rot_mat_z @ root_lin_vel_d_rel

    target_abs = jnp.einsum("ab,lb->la", root_rot_mat_z,
                            params.default_foot_pos)
    k = jnp.sqrt(jnp.abs(root_pos[2]) / 9.8)
    t_factor = (1.0 / params.gait_counter_speed / 2.0) / 2.0
    delta = k * (v[:2] - v_d[:2]) + t_factor * v_d[:2]          # (2,)
    delta = jnp.clip(
        delta,
        jnp.array([-FOOT_DELTA_X_LIMIT, -FOOT_DELTA_Y_LIMIT],
                  dtype=delta.dtype),
        jnp.array([FOOT_DELTA_X_LIMIT, FOOT_DELTA_Y_LIMIT],
                  dtype=delta.dtype))
    target_abs = target_abs.at[:, 0:2].add(delta[None, :])
    target_world = target_abs + root_pos[None, :]
    if terrain is not None:
        from legged_mpc_control_tpu.sim import terrain as terrain_mod

        tz = terrain_mod.height_at(terrain, target_world[:, :2])   # (4,)
        # aim slightly BELOW the map surface: the flat-ground path's
        # default_foot_pos target naturally lands ~2-3 cm under the plane,
        # and that penetration is what drives the swing PD firmly into
        # contact — a target exactly AT the surface gives marginal
        # touchdowns that destabilize the trot over a few seconds
        target_world = target_world.at[:, 2].set(tz - 0.02)
        target_abs = target_abs.at[:, 2].set(tz - 0.02 - root_pos[2])
    return target_abs, target_world
