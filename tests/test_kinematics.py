import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.models import kinematics as kin


PARAMS = a1_params(jnp.float64)

# single compiled batched forms reused by all tests (keeps CI fast on CPU)
_fk_b = jax.jit(jax.vmap(kin.fk, in_axes=(0, 0)))
_jac_b = jax.jit(jax.vmap(kin.jac, in_axes=(0, 0)))
_ik_b = jax.jit(jax.vmap(kin.ik, in_axes=(0, 0, 0)))


def random_q(n, seed=0):
    """Random joint angles within A1 mechanical limits
    (reference: test_inv_kin.cpp:28-54 samples the same ranges)."""
    rng = np.random.default_rng(seed)
    q1 = rng.uniform(-0.8, 0.8, n)        # hip roll
    q2 = rng.uniform(-1.0, 1.7, n)        # thigh
    q3 = rng.uniform(-2.6, -0.95, n)      # calf (always flexed)
    return jnp.stack([jnp.array(q1), jnp.array(q2), jnp.array(q3)], axis=-1)


def tile_rho(n):
    """(n,5) cycling through the 4 legs' geometry."""
    reps = -(-n // 4)
    return jnp.tile(PARAMS.rho_fix, (reps, 1))[:n]


def test_fk_neutral_pose():
    # q = 0: leg points straight down below the hip+motor offset
    rho = PARAMS.rho_fix[0]
    p = kin.fk(jnp.zeros(3, dtype=jnp.float64), rho)
    np.testing.assert_allclose(
        np.asarray(p),
        [float(rho[0]), float(rho[1] + rho[2]), -float(rho[3] + rho[4])],
        atol=1e-12)


def test_jacobian_matches_autodiff():
    qs = random_q(64, seed=3)
    rhos = tile_rho(64)
    Jana = _jac_b(qs, rhos)
    Jad = jax.vmap(jax.jacfwd(kin.fk), in_axes=(0, 0))(qs, rhos)
    np.testing.assert_allclose(np.asarray(Jana), np.asarray(Jad), atol=1e-10)


def test_ik_fk_roundtrip_all_legs():
    # property test mirroring reference: src/test/test_inv_kin.cpp:28-54
    qs = random_q(2000, seed=10)
    rhos = tile_rho(2000)
    ps = _fk_b(qs, rhos)
    q_sol = _ik_b(ps, qs, rhos)
    err = jnp.max(jnp.abs(q_sol - qs))
    assert float(err) < 1e-9, f"max roundtrip err {float(err)}"


def test_ik_branch_selection_perturbed_reference():
    # IK should still find the true branch when the reference guess is a
    # perturbed version of the true angles (the controller's warm start)
    qs = random_q(500, seed=42)
    rhos = tile_rho(500)
    rng = np.random.default_rng(7)
    q_ref = qs + jnp.array(rng.normal(scale=0.2, size=qs.shape))
    ps = _fk_b(qs, rhos)
    q_sol = _ik_b(ps, q_ref, rhos)
    # whichever branch is selected, it must reproduce the target exactly
    p_back = _fk_b(q_sol, rhos)
    np.testing.assert_allclose(np.asarray(p_back), np.asarray(ps), atol=1e-9)
    # and stay within a plausible neighborhood of the guess
    assert float(jnp.max(jnp.abs(q_sol - q_ref))) < 1.5


def test_ik_out_of_workspace_is_finite():
    rho = PARAMS.rho_fix[0]
    p_far = jnp.array([2.0, 2.0, -2.0], dtype=jnp.float64)
    q = kin.ik(p_far, jnp.zeros(3, dtype=jnp.float64), rho)
    assert bool(jnp.all(jnp.isfinite(q)))


def test_foot_velocity_consistency():
    rho = PARAMS.rho_fix[3]
    q = random_q(1, seed=5)[0]
    dq = jnp.array([0.3, -0.5, 0.8], dtype=jnp.float64)
    v = kin.jac(q, rho) @ dq
    h = 1e-7
    fd = (kin.fk(q + h * dq, rho) - kin.fk(q - h * dq, rho)) / (2 * h)
    np.testing.assert_allclose(np.asarray(v), np.asarray(fd), atol=1e-6)


def test_calibration_derivatives():
    """dfk_drho equals the reference's closed-form calf rotation
    (reference: A1Kinematics.cpp autoFunc_d_fk_dc), and the jacfwd
    derivatives agree with finite differences."""
    rho_fix = jnp.array([0.1805, 0.047, 0.0838, 0.21, 0.21])
    rho_opt = jnp.array([0.01, -0.005, 0.02])
    q = jnp.array([0.12, 0.7, -1.4])

    D = kin.dfk_drho(q, rho_opt, rho_fix)
    q1, q23 = float(q[0]), float(q[1] + q[2])
    s1, c1 = np.sin(q1), np.cos(q1)
    s, c = np.sin(q23), np.cos(q23)
    want = np.array([[c, 0.0, s],
                     [s1 * s, c1, -s1 * c],
                     [-c1 * s, s1, c1 * c]])
    np.testing.assert_allclose(np.asarray(D), want, atol=1e-12)

    # finite-difference checks of dJ_dq / dJ_drho
    eps = 1e-6
    J0 = np.asarray(kin.jac_cal(q, rho_opt, rho_fix))
    dJq = np.asarray(kin.dJ_dq(q, rho_opt, rho_fix)).reshape(3, 3, 3)
    dJr = np.asarray(kin.dJ_drho(q, rho_opt, rho_fix)).reshape(3, 3, 3)
    for k in range(3):
        Jp = np.asarray(kin.jac_cal(q.at[k].add(eps), rho_opt, rho_fix))
        np.testing.assert_allclose(dJq[:, :, k], (Jp - J0) / eps, atol=1e-5)
        Jp = np.asarray(kin.jac_cal(q, rho_opt.at[k].add(eps), rho_fix))
        np.testing.assert_allclose(dJr[:, :, k], (Jp - J0) / eps, atol=1e-5)

    # zero offset reduces to the plain analytic FK/J
    np.testing.assert_allclose(
        np.asarray(kin.fk_cal(q, jnp.zeros(3), rho_fix)),
        np.asarray(kin.fk(q, rho_fix)), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(kin.jac_cal(q, jnp.zeros(3), rho_fix)),
        np.asarray(kin.jac(q, rho_fix)), atol=1e-12)
