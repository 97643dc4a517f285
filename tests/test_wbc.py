"""Hierarchical whole-body controller tests (standing equilibrium).

Mirrors the reference's wbc_test scenario: all-stance standing state, check
the physics tier is satisfied and torques support the body
(reference: src/test/test_wbc.cpp:99-231, but with numeric assertions
instead of printouts)."""

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.control import wbc
from legged_mpc_control_tpu.models import whole_body as wb

MODEL = wb.a1_wb_model()
TOTAL_MASS = 6.0 + 4 * (0.595 + 0.888 + 0.151 + 0.06)


def standing_state(height=0.35):
    q = jnp.zeros(18)
    q = q.at[2].set(height)
    q = q.at[6:18].set(jnp.tile(jnp.array([0.0, 0.8, -1.6]), 4))
    v = jnp.zeros(18)
    return q, v


def test_standing_equilibrium():
    q, v = standing_state()
    contact = jnp.ones(4)
    mg4 = TOTAL_MASS * 9.81 / 4
    grf = jnp.tile(jnp.array([0.0, 0.0, mg4]), (4, 1))
    feet = wb.foot_positions(q, MODEL)

    tau, q_dd, F = wbc.wbc_update(
        q, v, contact, grf, q[0:3], q[3:6], feet, jnp.zeros((4, 3)), MODEL)

    # physics tier: M qdd - Jc^T F - S^T tau = -nle satisfied tightly
    M = wb.mass_matrix(q, MODEL)
    nle = wb.nonlinear_effects(q, v, MODEL)
    J = wb.foot_jacobians(q, MODEL).reshape(12, 18)
    S = jnp.concatenate([jnp.zeros((6, 12)), jnp.eye(12)], axis=0)
    resid = M @ q_dd - J.T @ F - S @ tau + nle
    assert float(jnp.max(jnp.abs(resid))) < 1e-4

    # forces near the MPC request, torques bounded, accelerations small
    np.testing.assert_allclose(np.asarray(F.reshape(4, 3)[:, 2]), mg4,
                               rtol=0.1)
    assert float(jnp.max(jnp.abs(tau))) <= wbc.TAU_LIMIT + 1e-9
    assert float(jnp.max(jnp.abs(q_dd))) < 1.0


def test_swing_leg_tracks_cartesian_target():
    q, v = standing_state()
    contact = jnp.array([1.0, 0.0, 0.0, 1.0])   # FR, RL swinging
    mg2 = TOTAL_MASS * 9.81 / 2
    grf = jnp.zeros((4, 3)).at[0, 2].set(mg2).at[3, 2].set(mg2)
    feet = wb.foot_positions(q, MODEL)
    # command swing feet 5 cm higher
    target = feet.at[1, 2].add(0.05).at[2, 2].add(0.05)

    tau, q_dd, F = wbc.wbc_update(
        q, v, contact, grf, q[0:3], q[3:6], target, jnp.zeros((4, 3)), MODEL)

    # swing feet accelerate upward toward the raised target
    J = wb.foot_jacobians(q, MODEL)
    jdv = wb.foot_jdot_v(q, v, MODEL)
    foot_acc = jnp.einsum("lij,j->li", J, q_dd) + jdv
    assert float(foot_acc[1, 2]) > 1.0
    assert float(foot_acc[2, 2]) > 1.0
    # swing legs carry ~no force
    assert float(jnp.max(jnp.abs(F.reshape(4, 3)[jnp.array([1, 2])]))) < 1.0


def test_friction_cone_enforced_as_hard_constraint():
    """MPC requests a GRF far outside the mu=0.3 pyramid; the WBC's output
    forces must satisfy the cone (reference enforces it as inequality rows,
    wbc.cpp:168-176 — not as a post-hoc clamp)."""
    q, v = standing_state()
    contact = jnp.ones(4)
    mg4 = TOTAL_MASS * 9.81 / 4
    # lateral force = 2*mu*fz: infeasible request
    grf = jnp.tile(jnp.array([0.6 * mg4, 0.0, mg4]), (4, 1))
    feet = wb.foot_positions(q, MODEL)

    tau, q_dd, F = wbc.wbc_update(
        q, v, contact, grf, q[0:3], q[3:6], feet, jnp.zeros((4, 3)), MODEL)

    Fl = np.asarray(F.reshape(4, 3))
    assert np.all(Fl[:, 2] > -1e-6)
    assert np.all(np.abs(Fl[:, 0]) <= wbc.WBC_MU * Fl[:, 2] + 1e-4)
    assert np.all(np.abs(Fl[:, 1]) <= wbc.WBC_MU * Fl[:, 2] + 1e-4)
    # the physics tier still holds exactly despite the infeasible request
    M = wb.mass_matrix(q, MODEL)
    nle = wb.nonlinear_effects(q, v, MODEL)
    J = wb.foot_jacobians(q, MODEL).reshape(12, 18)
    S = jnp.concatenate([jnp.zeros((6, 12)), jnp.eye(12)], axis=0)
    resid = M @ q_dd - J.T @ F - S @ tau + nle
    assert float(jnp.max(jnp.abs(resid))) < 1e-4


def test_torque_limits_hard_with_consistent_dynamics():
    """An aggressive base-acceleration demand saturates the actuators; the
    solution must keep |tau| <= 33.5 while STILL satisfying the EoM (a
    post-hoc clamp would break the dynamics consistency)."""
    q, v = standing_state(height=0.2)
    contact = jnp.ones(4)
    grf = jnp.tile(jnp.array([0.0, 0.0, 200.0]), (4, 1))
    feet = wb.foot_positions(q, MODEL)
    # demand a violent 2 m upward base jump -> huge accelerations
    base_pos_des = q[0:3] + jnp.array([0.0, 0.0, 2.0])

    tau, q_dd, F = wbc.wbc_update(
        q, v, contact, grf, base_pos_des, q[3:6], feet,
        jnp.zeros((4, 3)), MODEL)

    assert float(jnp.max(jnp.abs(tau))) <= wbc.TAU_LIMIT + 1e-4
    M = wb.mass_matrix(q, MODEL)
    nle = wb.nonlinear_effects(q, v, MODEL)
    J = wb.foot_jacobians(q, MODEL).reshape(12, 18)
    S = jnp.concatenate([jnp.zeros((6, 12)), jnp.eye(12)], axis=0)
    resid = M @ q_dd - J.T @ F - S @ tau + nle
    assert float(jnp.max(jnp.abs(resid))) < 1e-3


def test_wbc_closed_loop_trot():
    """Closed-loop trot with WBC feedforward torques (low_level_type=1,
    reference wbc_update path): stays upright, makes forward progress,
    commands within torque limits."""
    from legged_mpc_control_tpu.config import a1_params
    from legged_mpc_control_tpu.mpc import gait
    from legged_mpc_control_tpu.parallel import runner

    dtype = jnp.float64
    params = a1_params(dtype)
    pattern = gait.trot_pattern(dtype)
    batch = 2
    loop = runner.init_loop_batch(params, batch, jax.random.PRNGKey(3),
                                  dtype=dtype)
    # stand, then walk with WBC low-level
    stand = jax.jit(runner.make_batched_rollout(
        pattern, horizon=5, n_ticks=4, pdip_iters=10, low_level_type=1))
    loop, _ = stand(loop, params)
    cs = loop.controller
    cs = cs.replace(ctrl=cs.ctrl.replace(
        movement_mode=jnp.ones((batch,), jnp.int32)))
    loop = loop.replace(controller=cs)
    x0 = np.asarray(loop.sim.pos[:, 0])

    walk = jax.jit(runner.make_batched_rollout(
        pattern, horizon=5, n_ticks=25, pdip_iters=10, walk_velx=0.25,
        low_level_type=1))
    fin, _ = walk(loop, params)
    z = np.asarray(fin.sim.pos[:, 2])
    dx = np.asarray(fin.sim.pos[:, 0]) - x0
    assert np.all(z > 0.2), z
    assert np.all(dx > 0.01), dx
    assert float(jnp.max(jnp.abs(
        fin.controller.ctrl.joint_tau_tgt))) <= wbc.TAU_LIMIT + 1e-4


def test_jittable_and_vmappable():
    q, v = standing_state()
    contact = jnp.ones(4)
    grf = jnp.tile(jnp.array([0.0, 0.0, 30.0]), (4, 1))
    feet = wb.foot_positions(q, MODEL)
    f = jax.jit(lambda qq: wbc.wbc_update(
        qq, v, contact, grf, qq[0:3], qq[3:6], feet,
        jnp.zeros((4, 3)), MODEL))
    tau, _, _ = f(q)
    assert tau.shape == (12,)
    batch_q = jnp.stack([q, q + 0.01])
    taus = jax.vmap(lambda qq: wbc.wbc_update(
        qq, v, contact, grf, qq[0:3], qq[3:6], feet,
        jnp.zeros((4, 3)), MODEL)[0])(batch_q)
    assert taus.shape == (2, 12)
