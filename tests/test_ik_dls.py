"""Numerical DLS IK tests (reference: LeggedIKSolver.cpp:129-160; validated
the way the reference validates analytic IK — FK/IK round trips,
test_inv_kin.cpp:28-54 and test_wbc.cpp's 10-iteration FK/IK loop)."""

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.models import ik_dls
from legged_mpc_control_tpu.models import whole_body as wb

DTYPE = jnp.float64
MODEL = wb.a1_wb_model()
Q_STAND = jnp.tile(jnp.array([0.0, 0.8, -1.6], DTYPE), 4)
BASE = jnp.array([0.0, 0.0, 0.3, 0.0, 0.0, 0.0], DTYPE)


def test_roundtrip_from_perturbed_start():
    """FK(q_true) -> IK from a perturbed warm start recovers foot targets."""
    rng = np.random.default_rng(0)
    for trial in range(5):
        q_true = Q_STAND + jnp.asarray(
            rng.uniform(-0.3, 0.3, 12), DTYPE)
        feet_des = wb.foot_positions(jnp.concatenate([BASE, q_true]), MODEL)
        q0 = q_true + jnp.asarray(rng.uniform(-0.2, 0.2, 12), DTYPE)
        q_sol, err, conv = ik_dls.ik_feet(q0, BASE, feet_des, MODEL)
        assert bool(conv), f"trial {trial} did not converge"
        feet_sol = wb.foot_positions(
            jnp.concatenate([BASE, q_sol]), MODEL)
        np.testing.assert_allclose(np.asarray(feet_sol),
                                   np.asarray(feet_des), atol=1e-4)


def test_single_leg_matches_full():
    rng = np.random.default_rng(1)
    q_true = Q_STAND + jnp.asarray(rng.uniform(-0.25, 0.25, 12), DTYPE)
    feet_des = wb.foot_positions(jnp.concatenate([BASE, q_true]), MODEL)
    for leg in range(4):
        q0 = q_true[3 * leg:3 * leg + 3] + jnp.asarray(
            rng.uniform(-0.15, 0.15, 3), DTYPE)
        q_sol, err, conv = ik_dls.ik_single_leg(
            q0, BASE, leg, feet_des[leg], MODEL, q_other=q_true)
        assert bool(conv)
        np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-4)


def test_warm_start_converges_fast():
    """From the exact solution the residual must already be < eps — the
    converged mask freezes the iterate (no drift on a converged solve)."""
    feet_des = wb.foot_positions(jnp.concatenate([BASE, Q_STAND]), MODEL)
    q_sol, err, conv = ik_dls.ik_feet(Q_STAND, BASE, feet_des, MODEL,
                                      iters=3)
    assert bool(conv)
    np.testing.assert_allclose(np.asarray(q_sol), np.asarray(Q_STAND),
                               atol=1e-6)


def test_vmap_over_scenarios():
    batch = 6
    rng = np.random.default_rng(2)
    q_true = jnp.asarray(rng.uniform(-0.2, 0.2, (batch, 12)),
                         DTYPE) + Q_STAND[None, :]
    feet = jax.vmap(
        lambda qj: wb.foot_positions(jnp.concatenate([BASE, qj]), MODEL))(
        q_true)
    q0 = jnp.tile(Q_STAND, (batch, 1))
    q_sol, err, conv = jax.vmap(
        lambda a, b: ik_dls.ik_feet(a, BASE, b, MODEL))(q0, feet)
    assert q_sol.shape == (batch, 12)
    assert np.asarray(conv).all()
