"""Single-rigid-body (SRB) model: MPC linearization and nonlinear dynamics.

The convex MPC models the trunk as a single rigid body driven by foot ground
reaction forces. State x = [rpy(3), pos(3), omega_world(3), v_world(3)]
(reference: ConvexQPSolver.cpp:256-259).

Linearization (reference: ConvexQPSolver.cpp:198-228):
    Ac[0:3, 6:9] = M(yaw_ref)   (yaw-only angular velocity -> rpy-rate map)
    Ac[3:6, 9:12] = I
    Bc[6:9, 3i:3i+3]  = (R I_b R^T)^{-1} [p_i]x
    Bc[9:12, 3i:3i+3] = I / m
    Ad = I + Ac dt,  Bd = Bc dt          (Euler discretization)
Gravity enters as the affine term d = -g*dt on the v_z row
(reference: ConvexQPSolver.cpp:175-177, 294-297).
"""

import jax.numpy as jnp

from legged_mpc_control_tpu.constants import GRAVITY, MPC_STATE_DIM, NUM_LEG
from legged_mpc_control_tpu.ops.so3 import angvel_to_rpy_rate, skew


def discrete_A(yaw_ref, dt):
    """Ad(yaw) = I + Ac(yaw)*dt. yaw_ref: (...,) -> (..., 12, 12)."""
    m = angvel_to_rpy_rate(yaw_ref)                   # (...,3,3)
    batch = m.shape[:-2]
    A = jnp.zeros(batch + (MPC_STATE_DIM, MPC_STATE_DIM), dtype=m.dtype)
    A = A + jnp.eye(MPC_STATE_DIM, dtype=m.dtype)
    A = A.at[..., 0:3, 6:9].set(m * dt)
    A = A.at[..., 3:6, 9:12].set(jnp.eye(3, dtype=m.dtype) * dt)
    return A


def discrete_B(mass, trunk_inertia, root_rot_mat, foot_pos_abs, dt):
    """Bd for the 4-leg GRF input.

    foot_pos_abs: (4,3) foot positions relative to CoM in world axes
    (reference: BaseInterface.cpp:296 — rotation of body-frame FK, no
    translation). Returns (12, 12).
    """
    dtype = root_rot_mat.dtype
    I_world = root_rot_mat @ trunk_inertia @ root_rot_mat.T
    from legged_mpc_control_tpu.ops import la3

    I_inv = la3.inv3(I_world)
    torque_blocks = jnp.einsum("ab,lbc->lac", I_inv, skew(foot_pos_abs))
    B = jnp.zeros((MPC_STATE_DIM, 3 * NUM_LEG), dtype=dtype)
    for i in range(NUM_LEG):
        B = B.at[6:9, 3 * i:3 * i + 3].set(torque_blocks[i] * dt)
        B = B.at[9:12, 3 * i:3 * i + 3].set(
            jnp.eye(3, dtype=dtype) / mass * dt)
    return B


def gravity_affine(dt, dtype=jnp.float32):
    """Affine term d: x_{k+1} = Ad x_k + Bd u_k + d, d = [-g*dt on v_z]."""
    return jnp.zeros((MPC_STATE_DIM,), dtype=dtype).at[11].set(-GRAVITY * dt)


def srb_continuous_dynamics(pos, rotmat, omega_world, vel, grf_world,
                            foot_pos_world, mass, trunk_inertia):
    """Nonlinear SRB accelerations from world-frame foot forces.

    Used by the on-device simulator (the reference's Gazebo stand-in).
    Returns (v_dot, omega_dot) in world frame.
    """
    total_f = jnp.sum(grf_world, axis=-2)
    v_dot = total_f / mass + jnp.array([0.0, 0.0, -GRAVITY],
                                       dtype=pos.dtype)
    I_world = rotmat @ trunk_inertia @ rotmat.T
    torque = jnp.sum(jnp.cross(foot_pos_world - pos[None, :], grf_world),
                     axis=-2)
    from legged_mpc_control_tpu.ops import la3

    omega_dot = la3.solve3(
        I_world, torque - jnp.cross(omega_world, I_world @ omega_world))
    return v_dot, omega_dot
