"""Whole-body controller: hierarchical task-priority QP with inequality
tiers.

Re-design of the reference's `Wbc` + `HoQp`
(reference: src/wbc_ctrl/wbc.cpp:93-259, src/wbc_ctrl/HoQp.cpp:147-174).
Decision vector x = [q_dd (18), F (12), tau (12)]
(reference: wbc.h:18, wbc.cpp:24) over the task hierarchy:

  priority 0 (hard physics + actuation/contact feasibility):
    - floating-base dynamics  M q_dd - J^T F - S^T tau = -nle
      (reference: wbc.cpp:106-120, full-J form — swing forces are pinned
      to zero by the friction task's equality block, not by masking J)
    - no contact motion  J_c q_dd = -Jdot_c v   (reference: wbc.cpp:137-152)
    - swing-foot forces = 0                      (reference: wbc.cpp:156-166)
    - INEQ torque limits  |tau| <= 33.5 Nm       (reference: wbc.cpp:122-135,
      task.info:225-230)
    - INEQ friction pyramid on contact feet, mu = 0.3, fz >= 0
      (reference: wbc.cpp:168-176)
  priority 1 (tracking):
    - base linear + angular acceleration (reference: wbc.cpp:181-208; the
      reference converts the MPC's desired state through the centroidal
      momentum matrix — here the equivalent PD law on the base pose, the
      classic SRB-WBC form, since our MPC targets are poses/velocities)
    - swing foot Cartesian PD, kp=350 kd=37 (reference: wbc.cpp:210-246,
      task.info:237-240)
  priority 2:
    - contact force tracking of the MPC GRFs (reference: wbc.cpp:248-259)

The reference resolves the hierarchy with recursive null-space QPs in
qpOASES. Here each level is a fixed-iteration batched interior-point solve
with slack variables and the null basis is a soft-rank SVD — branchless and
static-shaped, see control/hoqp.py. Inequalities are HARD constraints
resolved inside the hierarchy (not post-hoc clamps). All dynamics
quantities come from the autodiff rigid-body layer (models/whole_body.py).
"""

import jax
import jax.numpy as jnp

from legged_mpc_control_tpu.control import hoqp
from legged_mpc_control_tpu.models import whole_body as wb

N_X = 18 + 12 + 12      # [q_dd, F, tau]
TAU_LIMIT = 33.5         # reference: task.info:225-230
WBC_MU = 0.3             # reference: task.info frictionConeTask
SWING_KP = 350.0         # reference: task.info:237-240
SWING_KD = 37.0
BASE_KP_POS = jnp.array([100.0, 100.0, 100.0])
BASE_KD_POS = jnp.array([10.0, 10.0, 10.0])
BASE_KP_ANG = jnp.array([100.0, 100.0, 100.0])
BASE_KD_ANG = jnp.array([10.0, 10.0, 10.0])

# 5-row friction pyramid per foot (reference: wbc.cpp:168-171):
# fz >= 0, |fx| <= mu fz, |fy| <= mu fz
_PYR = ((0.0, 0.0, -1.0),
        (1.0, 0.0, -WBC_MU),
        (-1.0, 0.0, -WBC_MU),
        (0.0, 1.0, -WBC_MU),
        (0.0, -1.0, -WBC_MU))


def build_tasks(q, v, contact, grf_mpc, base_pos_des, base_euler_des,
                foot_pos_des, foot_vel_des, model: wb.WbModel,
                base_lin_vel_des=None, base_eul_rate_des=None):
    """Assemble the three reference priority levels as HoTasks (contact-
    dependent rows zero-masked so shapes stay static).

    base_lin_vel_des (3,) world / base_eul_rate_des (3,) ZYX rates: desired
    base velocities for the tracking tier (the reference encodes them via
    the centroidal dynamics of the desired state, wbc.cpp:196-201; zero
    targets damp all base motion, which fights walking)."""
    dtype = q.dtype
    M = wb.mass_matrix(q, model)
    nle = wb.nonlinear_effects(q, v, model)
    J = wb.foot_jacobians(q, model)               # (4,3,18)
    jdv = wb.foot_jdot_v(q, v, model)             # (4,3)
    feet = wb.foot_positions(q, model)
    foot_vel = jnp.einsum("lij,j->li", J, v)
    Jflat = J.reshape(12, 18)
    cm = jnp.repeat(contact, 3)                   # (12,) row masks
    sm = jnp.repeat(1.0 - contact, 3)

    # --- priority 0 ---
    # EoM (full J; reference: wbc.cpp:106-120)
    A_dyn = jnp.concatenate([
        M, -Jflat.T,
        -jnp.concatenate([jnp.zeros((6, 12), dtype),
                          jnp.eye(12, dtype=dtype)], axis=0)], axis=1)
    b_dyn = -nle
    # no contact motion (masked by contact; reference: wbc.cpp:137-152)
    A_cm = jnp.concatenate([Jflat, jnp.zeros((12, 24), dtype)],
                           axis=1) * cm[:, None]
    b_cm = -jdv.reshape(12) * cm
    # swing-foot force = 0 (masked by 1-contact; reference: wbc.cpp:156-166)
    A_sf = jnp.concatenate([
        jnp.zeros((12, 18), dtype), jnp.eye(12, dtype=dtype),
        jnp.zeros((12, 12), dtype)], axis=1) * sm[:, None]
    b_sf = jnp.zeros((12,), dtype)
    A0 = jnp.concatenate([A_dyn, A_cm, A_sf], axis=0)
    b0 = jnp.concatenate([b_dyn, b_cm, b_sf])

    # torque limits +-TAU_LIMIT (reference: wbc.cpp:122-135)
    sel_tau = jnp.concatenate([
        jnp.zeros((12, 30), dtype), jnp.eye(12, dtype=dtype)], axis=1)
    D_tau = jnp.concatenate([sel_tau, -sel_tau], axis=0)
    f_tau = jnp.full((24,), TAU_LIMIT, dtype)
    # friction pyramid on contact feet (reference: wbc.cpp:168-176)
    pyr = jnp.asarray(_PYR, dtype)                # (5,3)
    blocks = []
    for leg in range(4):
        Dl = jnp.zeros((5, N_X), dtype)
        Dl = Dl.at[:, 18 + 3 * leg:18 + 3 * leg + 3].set(pyr)
        blocks.append(Dl * contact[leg])
    D_pyr = jnp.concatenate(blocks, axis=0)       # (20, N_X)
    f_pyr = jnp.zeros((20,), dtype)
    D0 = jnp.concatenate([D_tau, D_pyr], axis=0)
    f0 = jnp.concatenate([f_tau, f_pyr])
    task0 = hoqp.HoTask(A=A0, b=b0, D=D0, f=f0)

    # --- priority 1: base + swing tracking ---
    if base_lin_vel_des is None:
        base_lin_vel_des = jnp.zeros(3, dtype)
    if base_eul_rate_des is None:
        base_eul_rate_des = jnp.zeros(3, dtype)
    base_acc_des = (BASE_KP_POS.astype(dtype) * (base_pos_des - q[0:3])
                    + BASE_KD_POS.astype(dtype)
                    * (base_lin_vel_des - v[0:3]))
    base_ang_des = (BASE_KP_ANG.astype(dtype) * (base_euler_des - q[3:6])
                    + BASE_KD_ANG.astype(dtype)
                    * (base_eul_rate_des - v[3:6]))
    A_base = jnp.concatenate([
        jnp.eye(6, dtype=dtype), jnp.zeros((6, N_X - 6), dtype)], axis=1)
    b_base = jnp.concatenate([base_acc_des, base_ang_des])
    acc_sw = (SWING_KP * (foot_pos_des - feet)
              + SWING_KD * (foot_vel_des - foot_vel) - jdv)
    A_sw = jnp.concatenate([Jflat, jnp.zeros((12, 24), dtype)],
                           axis=1) * sm[:, None]
    b_sw = acc_sw.reshape(12) * sm
    A1 = jnp.concatenate([A_base, A_sw], axis=0)
    b1 = jnp.concatenate([b_base, b_sw])
    empty_D = jnp.zeros((0, N_X), dtype)
    empty_f = jnp.zeros((0,), dtype)
    task1 = hoqp.HoTask(A=A1, b=b1, D=empty_D, f=empty_f)

    # --- priority 2: follow MPC forces (reference: wbc.cpp:248-259) ---
    A2 = jnp.concatenate([
        jnp.zeros((12, 18), dtype), jnp.eye(12, dtype=dtype),
        jnp.zeros((12, 12), dtype)], axis=1)
    b2 = grf_mpc.reshape(12)
    task2 = hoqp.HoTask(A=A2, b=b2, D=empty_D, f=empty_f)

    return task0, task1, task2


def wbc_update(q, v, contact, grf_mpc, base_pos_des, base_euler_des,
               foot_pos_des, foot_vel_des, model: wb.WbModel, *,
               base_lin_vel_des=None, base_eul_rate_des=None,
               ip_iters: int = 18):
    """One WBC solve through the inequality-constrained hierarchy.

    Args:
      q, v: (18,) generalized position/velocity (see whole_body.py).
      contact: (4,) in {0.,1.} planned contacts.
      grf_mpc: (4,3) world GRFs from the MPC.
      base_pos_des: (3,), base_euler_des: (3,) ZYX euler desired.
      foot_pos_des / foot_vel_des: (4,3) world swing targets.
    Returns (tau (12,), q_dd (18,), F (12,)).
    """
    tasks = build_tasks(q, v, contact, grf_mpc, base_pos_des,
                        base_euler_des, foot_pos_des, foot_vel_des, model,
                        base_lin_vel_des=base_lin_vel_des,
                        base_eul_rate_des=base_eul_rate_des)
    x = hoqp.hoqp_solve(tasks, N_X, iters=ip_iters)
    q_dd = x[0:18]
    F = x[18:30]
    tau = x[30:42]
    return tau, q_dd, F


def wbc_from_controller(fbk, ctrl, model: wb.WbModel, *, ip_iters: int = 14):
    """Adapter: controller feedback/targets -> WBC feedforward torques.

    Mirrors the reference's state packing for `Wbc::update`
    (reference: BaseInterface.cpp:502-557, wbc.cpp:49-57): generalized
    coordinates [base pos, euler ZYX (yaw,pitch,roll), joints] with
    euler-rate base angular velocity; desired base pose / swing targets /
    GRFs come from the MPC's optimized_state / optimized_input packing.

    Returns (tau (12,), F (12,)).
    """
    from legged_mpc_control_tpu.ops import so3

    rpy = fbk.root_euler
    q = jnp.concatenate([fbk.root_pos, rpy[::-1], fbk.joint_pos])
    eul_rates = so3.euler_zyx_rates_from_omega_world(
        rpy[2], rpy[1], fbk.root_ang_vel)
    v = jnp.concatenate([fbk.root_lin_vel, eul_rates, fbk.joint_vel])

    grf_mpc = ctrl.optimized_input[0:12].reshape(4, 3)
    # xy position targets come through the commanded velocity (the MPC's
    # root_pos_d carries only height, reference ConvexMpc.cpp:33-38) — hold
    # height + attitude by position, track xy by velocity
    base_pos_des = jnp.concatenate([fbk.root_pos[0:2],
                                    ctrl.optimized_state[2:3]])
    base_euler_des = ctrl.optimized_state[3:6][::-1]       # rpy -> zyx
    base_lin_vel_des = fbk.root_rot_mat_z @ ctrl.root_lin_vel_d_rel
    base_eul_rate_des = jnp.zeros(3, q.dtype).at[0].set(
        ctrl.root_ang_vel_d_rel[2])
    foot_pos_des = ctrl.optimized_state[6:18].reshape(4, 3)
    foot_vel_des = ctrl.optimized_input[12:24].reshape(4, 3)

    tau, _q_dd, F = wbc_update(
        q, v, ctrl.plan_contacts, grf_mpc, base_pos_des, base_euler_des,
        foot_pos_des, foot_vel_des, model,
        base_lin_vel_des=base_lin_vel_des,
        base_eul_rate_des=base_eul_rate_des, ip_iters=ip_iters)
    return tau, F
