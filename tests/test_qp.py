"""Condensed-QP + PDIP solver correctness vs the reference QP formulation.

Strategy (SURVEY.md §4 "Implication for the rebuild"): build BOTH the
reference's sparse QP (states as decision variables, degenerate swing boxes,
exactly ConvexQPSolver.cpp:33-196) and our condensed QP from the same
linearization, solve the sparse one with an independent float64 CPU oracle,
and require the GRF trajectories to agree to <= 1e-4 (BASELINE.md target).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_mpc_control_tpu.config import a1_params, go1_params
from legged_mpc_control_tpu.mpc import qp_builder, pdip, reference, gait
from legged_mpc_control_tpu.models import srb
from legged_mpc_control_tpu.ops import so3

from oracle import solve_qp_oracle

DT = 0.01


def make_problem(params, horizon, contact_np, x0_np, vel_cmd=(0.0, 0.0, 0.0),
                 yaw_rate=0.0, height=0.3):
    dtype = jnp.float64
    x0 = jnp.asarray(x0_np, dtype)
    root_euler = x0[0:3]
    root_pos = x0[3:6]
    R = so3.quat_to_rotmat(so3.euler_to_quat(root_euler))
    cmd = reference.MpcCmd(
        root_pos_d=jnp.array([0.0, 0.0, height], dtype),
        root_euler_d=jnp.stack([jnp.zeros((), dtype), jnp.zeros((), dtype),
                                root_euler[2]]),
        root_lin_vel_d_rel=jnp.asarray(vel_cmd, dtype),
        root_ang_vel_d_rel=jnp.array([0.0, 0.0, yaw_rate], dtype),
    )
    x_ref, yaw_ref, _ = reference.build_reference(
        root_euler, root_pos, R, cmd, horizon, DT)
    # feet at default stance positions under the body
    foot_pos_abs = (R @ params.default_foot_pos.astype(dtype).T).T
    A_seq, B = reference.build_linearization(
        yaw_ref, params.mass.astype(dtype),
        params.trunk_inertia.astype(dtype), R, foot_pos_abs, DT)
    contact = jnp.asarray(contact_np, dtype)
    return x0, x_ref, A_seq, B, contact


def solve_both(params, horizon, contact_np, x0_np, **kw):
    x0, x_ref, A_seq, B, contact = make_problem(
        params, horizon, contact_np, x0_np, **kw)
    qw = params.q_weights.astype(jnp.float64)
    rw = params.r_weights.astype(jnp.float64)

    qp = qp_builder.build_condensed_qp(
        x0, x_ref, A_seq, B, contact, qw, rw, params.mu, params.fz_max, DT)
    res = pdip.solve_qp_pdip(qp.P, qp.q, qp.mu, qp.fz_max,
                             contact=contact, iters=25)

    Hs, g, Ac, lb, ub = qp_builder.reference_sparse_qp(
        x0, x_ref, A_seq, B, contact, qw, rw, params.mu, params.fz_max, DT)
    z = solve_qp_oracle(Hs, g, Ac, lb, ub)
    # oracle decision layout: [u_0, x_1, u_1, ...]
    n_step = 24
    u_oracle = np.concatenate(
        [z[k * n_step:k * n_step + 12] for k in range(horizon)])
    return np.asarray(res.u), u_oracle, res


def test_standing_qp_matches_oracle_and_physics():
    """BASELINE.json config 1: A1 standing balance, H=10, all feet down."""
    params = a1_params(jnp.float64)
    H = 10
    contact = np.ones((H, 4))
    x0 = np.zeros(12)
    x0[5] = 0.3                      # body at commanded height
    u, u_oracle, res = solve_both(params, H, contact, x0)

    assert float(res.gap) < 1e-8
    np.testing.assert_allclose(u, u_oracle, atol=1e-4)

    # physics: at equilibrium height, total normal force ~ m g, symmetric
    grf0 = u[:12].reshape(4, 3)
    total_fz = grf0[:, 2].sum()
    np.testing.assert_allclose(total_fz, 13.0 * 9.8, rtol=0.04)
    np.testing.assert_allclose(grf0[:, 2], grf0[0, 2], rtol=0.05)


def test_standing_low_body_pushes_up():
    params = a1_params(jnp.float64)
    H = 10
    contact = np.ones((H, 4))
    x0 = np.zeros(12)
    x0[5] = 0.25                     # 5 cm below target height
    u, u_oracle, _ = solve_both(params, H, contact, x0)
    np.testing.assert_allclose(u, u_oracle, atol=1e-4)
    assert u[:12].reshape(4, 3)[:, 2].sum() > 13.0 * 9.8   # net upward


def test_trot_contact_schedule_matches_oracle():
    """Go1 trot QP (the headline benchmark problem): alternating diagonal
    contacts down the horizon."""
    params = go1_params(jnp.float64)
    H = 10
    # trot: diagonal pairs alternate every 5 steps
    contact = np.zeros((H, 4))
    contact[:5, [0, 3]] = 1.0
    contact[5:, [1, 2]] = 1.0
    x0 = np.zeros(12)
    x0[5] = 0.3
    x0[9] = 0.4                      # forward velocity
    u, u_oracle, res = solve_both(params, H, contact, x0,
                                  vel_cmd=(0.4, 0.0, 0.0))
    assert float(res.gap) < 1e-8
    np.testing.assert_allclose(u, u_oracle, atol=1e-4)

    # swing legs carry exactly zero force
    grf = u.reshape(H, 4, 3)
    assert np.max(np.abs(grf[:5, [1, 2], :])) < 1e-5
    assert np.max(np.abs(grf[5:, [0, 3], :])) < 1e-5


def test_friction_cone_respected():
    params = a1_params(jnp.float64)
    H = 10
    contact = np.ones((H, 4))
    x0 = np.zeros(12)
    x0[5] = 0.3
    x0[9] = 2.0                      # large velocity error -> large fx demand
    u, u_oracle, _ = solve_both(params, H, contact, x0,
                                vel_cmd=(-2.0, 0.0, 0.0))
    np.testing.assert_allclose(u, u_oracle, atol=1e-4)
    grf = u.reshape(H, 4, 3)
    mu = 0.3
    assert np.all(np.abs(grf[..., 0]) <= mu * grf[..., 2] + 1e-6)
    assert np.all(np.abs(grf[..., 1]) <= mu * grf[..., 2] + 1e-6)
    assert np.all(grf[..., 2] >= -1e-8)
    assert np.all(grf[..., 2] <= 180.0 + 1e-6)


def test_yaw_turn_long_horizon():
    """H=30 long-horizon config with yaw-rate command (time-varying A)."""
    params = go1_params(jnp.float64)
    H = 30
    rng = np.random.default_rng(0)
    contact = (rng.uniform(size=(H, 4)) > 0.4).astype(float)
    contact[0] = 1.0                 # at least the first step all-stance
    x0 = np.zeros(12)
    x0[2] = 0.7                      # nonzero yaw
    x0[5] = 0.28
    u, u_oracle, res = solve_both(params, H, contact, x0,
                                  vel_cmd=(0.3, 0.1, 0.0), yaw_rate=0.5)
    # BASELINE GRF parity: <= 1e-4 vs the reference-grade oracle, at the
    # reference's full H=30 horizon (measured deviation ~2.7e-5)
    np.testing.assert_allclose(u, u_oracle, atol=1e-4)

    # the stagewise Riccati solver hits the same optimum without ever
    # condensing (identical Newton systems, mpc/riccati.py)
    from legged_mpc_control_tpu.mpc import riccati as riccati_mod

    x0j, x_ref, A_seq, B, c = make_problem(
        params, H, contact, x0, vel_cmd=(0.3, 0.1, 0.0), yaw_rate=0.5)
    u_r = riccati_mod.solve_qp_riccati_batched(
        x0j[None], x_ref[None], A_seq[None], B[None], c[None],
        params.q_weights.astype(jnp.float64),
        params.r_weights.astype(jnp.float64),
        params.mu, params.fz_max, DT, iters=25).u[0]
    np.testing.assert_allclose(np.asarray(u_r), u_oracle, atol=1e-4)


def test_pdip_batch_vmap():
    """The solver must vmap: 8 randomized standing scenarios at once."""
    params = a1_params(jnp.float64)
    H = 10
    contact = np.ones((H, 4))
    rng = np.random.default_rng(3)
    x0s = np.zeros((8, 12))
    x0s[:, 5] = 0.3 + rng.uniform(-0.03, 0.03, 8)
    x0s[:, 9:12] = rng.uniform(-0.2, 0.2, (8, 3))

    def solve_one(x0):
        x0, x_ref, A_seq, B, c = make_problem(params, H, contact, x0)
        qp = qp_builder.build_condensed_qp(
            x0, x_ref, A_seq, B, c,
            params.q_weights.astype(jnp.float64),
            params.r_weights.astype(jnp.float64),
            params.mu, params.fz_max, DT)
        return pdip.solve_qp_pdip(qp.P, qp.q, qp.mu, qp.fz_max,
                                 contact=c, iters=25)

    # reference single solves
    singles = [solve_one(x0s[i]).u for i in range(2)]
    batched = jax.vmap(lambda x: solve_one(x).u)(jnp.asarray(x0s))
    assert batched.shape == (8, 12 * H)
    np.testing.assert_allclose(np.asarray(batched[0]),
                               np.asarray(singles[0]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(batched[1]),
                               np.asarray(singles[1]), atol=1e-9)
