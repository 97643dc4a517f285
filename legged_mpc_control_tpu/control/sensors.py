"""Sensor processing: raw proprioception -> enriched Feedback.

Functional equivalent of `BaseInterface::sensor_update`
(reference: src/legged_ctrl/src/interfaces/BaseInterface.cpp:212-402):
orientation products, per-leg FK/Jacobian in all frames, sigmoid contact
detection, and GRF estimation from joint torques.

Note on contact flags: the reference stores the sigmoid
`1/(1+exp(-10(F - thresh)))` as a double (BaseInterface.cpp:316-329) and then
implicitly converts it to bool when feeding the gait FSM (any nonzero ->
true, which in IEEE double means "force above thresh - ~71N" due to exp
saturation). We keep the continuous sigmoid for the estimator (as the
reference's KF does, BasicKF.cpp:87) and use the *intended* threshold test
`F > thresh` for the FSM's boolean early-contact input.
"""

import jax
import jax.numpy as jnp

from legged_mpc_control_tpu.config import RobotParams
from legged_mpc_control_tpu.models import kinematics as kin
from legged_mpc_control_tpu.ops import so3
from legged_mpc_control_tpu.types import Feedback


def sensor_update(fbk: Feedback, params: RobotParams,
                  joint_ang_tgt=None, joint_vel_tgt=None) -> Feedback:
    """Recompute derived feedback from raw fields (quat, imu, joints).

    joint_ang_tgt/joint_vel_tgt: previous commanded joint targets, used to
    strip the PD command out of the torque-based force estimate
    (reference: BaseInterface.cpp:331-350). Pass None to skip.
    """
    R = so3.quat_to_rotmat(fbk.root_quat)
    euler = so3.quat_to_euler(fbk.root_quat)
    Rz = so3.rot_z(euler[2])
    ang_vel_world = R @ fbk.imu_ang_vel

    q_legs = fbk.joint_pos.reshape(4, 3)
    dq_legs = fbk.joint_vel.reshape(4, 3)
    foot_pos_rel = kin.fk_legs(q_legs, params.rho_fix)
    jac = kin.jac_legs(q_legs, params.rho_fix)
    foot_vel_rel = jnp.einsum("lab,lb->la", jac, dq_legs)

    foot_pos_abs = jnp.einsum("ab,lb->la", R, foot_pos_rel)
    foot_vel_abs = jnp.einsum("ab,lb->la", R, foot_vel_rel)
    foot_pos_world = foot_pos_abs + fbk.root_pos[None, :]
    # reference: BaseInterface.cpp:300-301 (omega x p term)
    omega_term = jnp.einsum(
        "ab,lb->la", R,
        jnp.cross(jnp.broadcast_to(fbk.imu_ang_vel, (4, 3)), foot_pos_rel))
    foot_vel_world = foot_vel_abs + fbk.root_lin_vel[None, :] + omega_term

    # contact detection (reference: :316-329)
    thresh = (params.foot_sensor_min + params.foot_sensor_ratio
              * (params.foot_sensor_max - params.foot_sensor_min))
    contact_sig = jax.nn.sigmoid(10.0 * (fbk.foot_force_sensor - thresh))
    contact_bool = fbk.foot_force_sensor > thresh

    # GRF estimate from actuation torques: F = J^-T tau (reference: :331-350)
    tau = fbk.joint_tau_est.reshape(4, 3)
    if joint_ang_tgt is not None:
        tau = tau - params.kp_foot[None, :] * (
            joint_ang_tgt.reshape(4, 3) - q_legs)
    if joint_vel_tgt is not None:
        tau = tau - params.kd_foot[None, :] * (
            joint_vel_tgt.reshape(4, 3) - dq_legs)
    from legged_mpc_control_tpu.ops import la3

    force_rel = la3.solve3_t(jac, tau)
    force_world = jnp.einsum("ab,lb->la", R, force_rel)

    return fbk.replace(
        root_rot_mat=R, root_euler=euler, root_rot_mat_z=Rz,
        root_ang_vel=ang_vel_world,
        foot_pos_rel=foot_pos_rel, foot_vel_rel=foot_vel_rel,
        jac_foot=jac,
        foot_pos_abs=foot_pos_abs, foot_vel_abs=foot_vel_abs,
        foot_pos_world=foot_pos_world, foot_vel_world=foot_vel_world,
        foot_contact_flag=contact_sig.astype(fbk.root_pos.dtype),
        foot_contact_bool=contact_bool,
        foot_force_tau_est=force_world,
    )
