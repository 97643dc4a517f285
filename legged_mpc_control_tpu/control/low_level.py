"""Low-level control: GRF -> joint torques, swing-leg IK targets, PD law.

Functional equivalent of `BaseInterface::tau_ctrl_update`
(reference: BaseInterface.cpp:451-500) plus the PD torque synthesis the sim
interface applies before sending (reference: GazeboInterface.cpp:99-118).
"""

import jax.numpy as jnp

from legged_mpc_control_tpu.config import RobotParams
from legged_mpc_control_tpu.models import kinematics as kin


def tau_ctrl_update(fbk, optimized_state, optimized_input, movement_mode,
                    params: RobotParams):
    """Compute joint targets (q, dq) and feedforward torques.

    Returns (joint_ang_tgt (12,), joint_vel_tgt (12,), joint_tau_tgt (12,)).
    reference: BaseInterface.cpp:451-500.
    """
    R = fbk.root_rot_mat
    grf_world = optimized_input[0:12].reshape(4, 3)
    grf_rel = jnp.einsum("ba,lb->la", R, grf_world)     # R^T f
    # tau = -J^T f (reference: :459)
    tau = -jnp.einsum("lba,lb->la", fbk.jac_foot, grf_rel)

    walking = movement_mode > 0

    # swing-leg tracking targets (reference: :463-484)
    foot_target_world = optimized_state[6:18].reshape(4, 3)
    foot_vel_target_world = optimized_input[12:24].reshape(4, 3)
    foot_target_rel = jnp.einsum(
        "ba,lb->la", R, foot_target_world - fbk.root_pos[None, :])
    foot_vel_target_rel = jnp.einsum(
        "ba,lb->la", R, foot_vel_target_world - fbk.root_lin_vel[None, :])

    q_meas = fbk.joint_pos.reshape(4, 3)
    dq_meas = fbk.joint_vel.reshape(4, 3)

    q_ik = kin.ik_legs(foot_target_rel, q_meas, params.rho_fix)
    q_ik = jnp.where(jnp.isnan(q_ik), q_meas, q_ik)     # NaN guard (:472-478)
    from legged_mpc_control_tpu.ops import la3

    dq_ik = la3.solve3(fbk.jac_foot, foot_vel_target_rel)
    dq_ik = jnp.where(jnp.isnan(dq_ik), dq_meas, dq_ik)

    q_tgt = jnp.where(walking, q_ik, q_meas)
    dq_tgt = jnp.where(walking, dq_ik, dq_meas)
    return q_tgt.reshape(-1), dq_tgt.reshape(-1), tau.reshape(-1)


def pd_torque(joint_pos, joint_vel, joint_ang_tgt, joint_vel_tgt,
              joint_tau_tgt, params: RobotParams):
    """Final motor torque: Kp (q_d - q) + Kd (dq_d - dq) + tau_ff.

    reference: GazeboInterface.cpp:107-110 (gains are per-axis, shared
    across legs, LeggedState.cpp:134-141)."""
    kp = jnp.tile(params.kp_foot, 4)
    kd = jnp.tile(params.kd_foot, 4)
    return (kp * (joint_ang_tgt - joint_pos)
            + kd * (joint_vel_tgt - joint_vel) + joint_tau_tgt)
