"""Whole-body dynamics tests: structure, gravity, energy conservation."""

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.models import whole_body as wb

MODEL = wb.a1_wb_model()
TOTAL_MASS = float(6.0 + 4 * (0.595 + 0.888 + 0.151 + 0.06))


def rand_q(seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    q = np.zeros(18)
    q[0:3] = rng.normal(scale=0.2, size=3)
    q[3:6] = rng.normal(scale=0.3, size=3)
    q[6:18] = np.tile([0.0, 0.8, -1.6], 4) + rng.normal(scale=scale, size=12)
    return jnp.asarray(q)


def rand_v(seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(scale=0.7, size=18))


def test_neutral_foot_positions():
    q = jnp.zeros(18)
    feet = wb.foot_positions(q, MODEL)
    expected = np.array([
        [0.1805, 0.047 + 0.0838, -0.4],
        [0.1805, -(0.047 + 0.0838), -0.4],
        [-0.1805, 0.047 + 0.0838, -0.4],
        [-0.1805, -(0.047 + 0.0838), -0.4]])
    np.testing.assert_allclose(np.asarray(feet), expected, atol=1e-12)


def test_mass_matrix_structure():
    q = rand_q(2)
    M = wb.mass_matrix(q, MODEL)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M).T, atol=1e-10)
    eigs = np.linalg.eigvalsh(np.asarray(M))
    assert eigs.min() > 0
    # translational block = total mass * I (independent of configuration)
    np.testing.assert_allclose(np.asarray(M[0:3, 0:3]),
                               TOTAL_MASS * np.eye(3), atol=1e-9)


def test_gravity_vector():
    q = rand_q(3)
    g = wb.nonlinear_effects(q, jnp.zeros(18), MODEL)
    # translational components: the robot only feels its own weight
    np.testing.assert_allclose(np.asarray(g[0:3]),
                               [0.0, 0.0, TOTAL_MASS * 9.81], atol=1e-8)


def test_energy_conservation_free_fall():
    """Unforced dynamics q_dd = -M^-1 nle must conserve total energy."""
    q = rand_q(4, scale=0.3)
    v = rand_v(5) * 0.3
    dt = 1e-4

    @jax.jit
    def step(q, v):
        M = wb.mass_matrix(q, MODEL)
        nle = wb.nonlinear_effects(q, v, MODEL)
        a = jnp.linalg.solve(M, -nle)
        return q + v * dt + 0.5 * a * dt * dt, v + a * dt

    @jax.jit
    def energy(q, v):
        return (wb.kinetic_energy(q, v, MODEL)
                + wb.potential_energy(q, MODEL))

    e0 = float(energy(q, v))
    for _ in range(200):
        q, v = step(q, v)
    e1 = float(energy(q, v))
    assert abs(e1 - e0) < 5e-4 * max(1.0, abs(e0)), (e0, e1)


def test_foot_jacobian_finite_diff():
    q = rand_q(6)
    J = wb.foot_jacobians(q, MODEL)
    h = 1e-7
    for i in range(18):
        dq = jnp.zeros(18).at[i].set(h)
        fd = (wb.foot_positions(q + dq, MODEL)
              - wb.foot_positions(q - dq, MODEL)) / (2 * h)
        np.testing.assert_allclose(np.asarray(J[:, :, i]), np.asarray(fd),
                                   atol=1e-6)


def test_jdot_v_finite_diff():
    q = rand_q(7)
    v = rand_v(8)
    jv = wb.foot_jdot_v(q, v, MODEL)
    h = 1e-6

    def Jv(qq):
        return jnp.einsum("lij,j->li", wb.foot_jacobians(qq, MODEL), v)

    fd = (Jv(q + h * v) - Jv(q - h * v)) / (2 * h)
    np.testing.assert_allclose(np.asarray(jv), np.asarray(fd), atol=1e-5)


def test_leg_jacobian_matches_leg_kinematics_shape():
    """Joint columns of the foot Jacobian at zero base pose, compared to the
    analytic leg Jacobian with the URDF's 0.2 m links."""
    from legged_mpc_control_tpu.models import kinematics as kin

    q = jnp.zeros(18).at[6:18].set(
        jnp.tile(jnp.array([0.1, 0.7, -1.4]), 4))
    J = wb.foot_jacobians(q, MODEL)
    rho = jnp.array([0.1805, 0.047, 0.0838, 0.2, 0.2])
    Jleg = kin.jac(jnp.array([0.1, 0.7, -1.4]), rho)
    np.testing.assert_allclose(np.asarray(J[0, :, 6:9]), np.asarray(Jleg),
                               atol=1e-10)


# --- Go1 model (reference: urdf/go1_description/xacro/const.xacro) ---

GO1 = wb.go1_wb_model()
GO1_TOTAL = float(5.204 + 4 * (0.591 + 0.92 + 0.131 + 0.06))


def test_go1_neutral_foot_positions():
    feet = wb.foot_positions(jnp.zeros(18), GO1)
    y = 0.04675 + 0.08
    expected = np.array([
        [0.1881, y, -0.426], [0.1881, -y, -0.426],
        [-0.1881, y, -0.426], [-0.1881, -y, -0.426]])
    np.testing.assert_allclose(np.asarray(feet), expected, atol=1e-12)


def test_go1_mass_matrix_structure():
    M = wb.mass_matrix(rand_q(12), GO1)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M).T, atol=1e-10)
    assert np.linalg.eigvalsh(np.asarray(M)).min() > 0
    np.testing.assert_allclose(np.asarray(M[0:3, 0:3]),
                               GO1_TOTAL * np.eye(3), atol=1e-9)


def test_go1_gravity_vector():
    g = wb.nonlinear_effects(rand_q(13), jnp.zeros(18), GO1)
    np.testing.assert_allclose(np.asarray(g[0:3]),
                               [0.0, 0.0, GO1_TOTAL * 9.81], atol=1e-8)


def test_go1_mirror_symmetry():
    """FL and FR legs in mirrored configurations produce exactly mirrored
    foot positions (the joint geometry mirrors, go1 leg.xacro:9-147) and
    NEAR-identical leg mass-matrix blocks — near, not exact: the go1 URDF
    deliberately applies the same unmirrored calf COM (y = +0.001307,
    leg.xacro:136) to both sides, unlike hip/thigh."""
    qj = jnp.array([0.2, 0.7, -1.4])
    q_fl = jnp.zeros(18).at[6:9].set(qj)
    q_fr = jnp.zeros(18).at[9:12].set(qj * jnp.array([-1.0, 1.0, 1.0]))
    f_fl = wb.foot_positions(q_fl, GO1)[0]
    f_fr = wb.foot_positions(q_fr, GO1)[1]
    np.testing.assert_allclose(
        np.asarray(f_fl) * np.array([1.0, -1.0, 1.0]),
        np.asarray(f_fr), atol=1e-12)
    M_fl = np.asarray(wb.mass_matrix(q_fl, GO1)[6:9, 6:9])
    M_fr = np.asarray(wb.mass_matrix(q_fr, GO1)[9:12, 9:12])
    # mirrored blocks are congruent, not equal: the hip-roll axis (x) flips
    # under the y-mirror, so M_fr = S M_fl S with S = diag(-1, 1, 1)
    S = np.diag([-1.0, 1.0, 1.0])
    diff = np.abs(S @ M_fl @ S - M_fr)
    assert diff.max() < 2e-4, diff          # calf-COM asymmetry only
    assert diff.max() > 1e-8                # ... and it IS asymmetric


def test_wb_model_for_selector():
    import pytest

    assert wb.wb_model_for("a1").trunk_mass == MODEL.trunk_mass
    assert wb.wb_model_for("go1").trunk_mass == GO1.trunk_mass
    with pytest.raises(ValueError):
        wb.wb_model_for("b2")
