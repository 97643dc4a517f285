"""MPC reference-trajectory rollout and linearization schedule.

Re-design of `ConvexQPSolver::calc_mpc_reference`
(reference: ConvexQPSolver.cpp:254-313): builds, per MPC tick,
  * the reference states x_ref[k] tracked by x_{k+1} (note the reference's
    one-step offset: the state one step ahead tracks the ref evaluated at
    k, reference: :264-276 vs :308);
  * the per-step discrete A (yaw linearized at the *reference* yaw for that
    step, reference: :279);
  * the single discrete B from current foot positions (reference: :280-283).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from legged_mpc_control_tpu.models import srb


class MpcCmd(NamedTuple):
    """Desired-motion command for the MPC (from joystick processing)."""
    root_pos_d: jnp.ndarray        # (3,) only z (body height) is tracked
    root_euler_d: jnp.ndarray      # (3,) desired roll/pitch (yaw integrated)
    root_lin_vel_d_rel: jnp.ndarray   # (3,) body-frame velocity command
    root_ang_vel_d_rel: jnp.ndarray   # (3,) body-frame rate command (yaw)


def build_reference(root_euler, root_pos, root_rot_mat, cmd: MpcCmd,
                    horizon: int, dt):
    """Returns (x_ref (H,12), yaw_ref (H,), lin_vel_d_world (3,)).

    reference: ConvexQPSolver.cpp:260-276.
    """
    dtype = root_pos.dtype
    lin_vel_d_world = root_rot_mat @ cmd.root_lin_vel_d_rel
    k = jnp.arange(horizon, dtype=dtype)

    yaw_ref = root_euler[2] + cmd.root_ang_vel_d_rel[2] * dt * k     # (H,)
    x_ref = jnp.stack([
        jnp.broadcast_to(cmd.root_euler_d[0], (horizon,)),
        jnp.broadcast_to(cmd.root_euler_d[1], (horizon,)),
        yaw_ref,
        root_pos[0] + lin_vel_d_world[0] * dt * k,
        root_pos[1] + lin_vel_d_world[1] * dt * k,
        jnp.broadcast_to(cmd.root_pos_d[2], (horizon,)),
        jnp.broadcast_to(cmd.root_ang_vel_d_rel[0], (horizon,)),
        jnp.broadcast_to(cmd.root_ang_vel_d_rel[1], (horizon,)),
        jnp.broadcast_to(cmd.root_ang_vel_d_rel[2], (horizon,)),
        jnp.broadcast_to(lin_vel_d_world[0], (horizon,)),
        jnp.broadcast_to(lin_vel_d_world[1], (horizon,)),
        jnp.zeros((horizon,), dtype=dtype),
    ], axis=-1).astype(dtype)
    return x_ref, yaw_ref, lin_vel_d_world


def build_linearization(yaw_ref, mass, trunk_inertia, root_rot_mat,
                        foot_pos_abs, dt):
    """(A_seq (H,12,12), B (12,12)). reference: ConvexQPSolver.cpp:198-228."""
    A_seq = jax.vmap(lambda y: srb.discrete_A(y, dt))(yaw_ref)
    B = srb.discrete_B(mass, trunk_inertia, root_rot_mat, foot_pos_abs, dt)
    return A_seq, B
