"""Contact-gated linear KF tests (reference behavior: BasicKF.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.estimation import basic_kf
from legged_mpc_control_tpu.models import kinematics as kin

DTYPE = jnp.float64
PARAMS = a1_params(DTYPE)
DT = 0.00125   # feedback rate


def standing_fk(height=0.3):
    """Body-frame foot positions for a standing pose at given height."""
    foot_rel = PARAMS.default_foot_pos.at[:, 2].set(-height)
    q_guess = jnp.tile(jnp.array([0.0, 0.8, -1.6], DTYPE), (4, 1))
    q = kin.ik_legs(foot_rel, q_guess, PARAMS.rho_fix)
    return kin.fk_legs(q, PARAMS.rho_fix)


def test_static_convergence_to_true_height():
    """Stationary robot, clean sensors: the estimate must converge to the
    kinematically-consistent pose (z = 0.3) despite the deliberately wrong
    init height of 0.09 (reference: BasicKF.cpp:65)."""
    R = jnp.eye(3, dtype=DTYPE)
    foot_rel = standing_fk(0.3)
    kf = basic_kf.kf_init(R, foot_rel, dtype=DTYPE)
    imu_acc = jnp.array([0.0, 0.0, 9.81], DTYPE)
    gyro = jnp.zeros(3, DTYPE)
    contacts = jnp.ones(4, DTYPE)
    vel_rel = jnp.zeros((4, 3), DTYPE)

    step = jax.jit(lambda k: basic_kf.kf_update(
        k, DT, R, imu_acc, gyro, foot_rel, vel_rel, contacts))
    for _ in range(2000):
        kf, pos, vel = step(kf)
    np.testing.assert_allclose(float(pos[2]), 0.3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(vel), 0.0, atol=1e-4)
    # foot states on the ground
    feet_z = np.asarray(kf.x[6:18]).reshape(4, 3)[:, 2]
    np.testing.assert_allclose(feet_z, 0.0, atol=1e-3)


def test_velocity_tracking_from_leg_odometry():
    """Constant-velocity skate: leg odometry implies v = (0.5, 0, 0)."""
    R = jnp.eye(3, dtype=DTYPE)
    foot_rel = standing_fk(0.3)
    kf = basic_kf.kf_init(R, foot_rel, dtype=DTYPE)
    imu_acc = jnp.array([0.0, 0.0, 9.81], DTYPE)   # no acceleration
    gyro = jnp.zeros(3, DTYPE)
    contacts = jnp.ones(4, DTYPE)
    v_true = jnp.array([0.5, 0.0, 0.0], DTYPE)
    # stance-foot velocity in body frame: J dq = -R^T v
    vel_rel = jnp.tile(-v_true, (4, 1))

    step = jax.jit(lambda k: basic_kf.kf_update(
        k, DT, R, imu_acc, gyro, foot_rel, vel_rel, contacts))
    for _ in range(1500):
        kf, pos, vel = step(kf)
    np.testing.assert_allclose(np.asarray(vel), np.asarray(v_true),
                               atol=5e-3)


def test_swing_legs_do_not_corrupt_velocity():
    """Legs flagged non-contact get 1e3 noise inflation: garbage leg odometry
    on swing legs must not move the velocity estimate
    (reference: BasicKF.cpp:94-110)."""
    R = jnp.eye(3, dtype=DTYPE)
    foot_rel = standing_fk(0.3)
    kf = basic_kf.kf_init(R, foot_rel, dtype=DTYPE)
    imu_acc = jnp.array([0.0, 0.0, 9.81], DTYPE)
    gyro = jnp.zeros(3, DTYPE)
    contacts = jnp.array([1.0, 0.0, 0.0, 1.0], DTYPE)   # diagonal stance
    vel_rel = jnp.zeros((4, 3), DTYPE)
    # swing legs report absurd velocities
    vel_rel = vel_rel.at[1].set(jnp.array([50.0, -50.0, 30.0], DTYPE))
    vel_rel = vel_rel.at[2].set(jnp.array([-40.0, 20.0, -30.0], DTYPE))

    step = jax.jit(lambda k: basic_kf.kf_update(
        k, DT, R, imu_acc, gyro, foot_rel, vel_rel, contacts))
    for _ in range(800):
        kf, pos, vel = step(kf)
    np.testing.assert_allclose(np.asarray(vel), 0.0, atol=5e-3)


def test_vmap_over_scenarios():
    R = jnp.eye(3, dtype=DTYPE)
    foot_rel = standing_fk(0.3)
    kfs = jax.vmap(lambda _: basic_kf.kf_init(R, foot_rel, dtype=DTYPE))(
        jnp.arange(4))
    imu_acc = jnp.tile(jnp.array([0.0, 0.0, 9.81], DTYPE), (4, 1))
    out = jax.vmap(
        lambda k, a: basic_kf.kf_update(
            k, DT, R, a, jnp.zeros(3, DTYPE), foot_rel,
            jnp.zeros((4, 3), DTYPE), jnp.ones(4, DTYPE)))(kfs, imu_acc)
    assert out[1].shape == (4, 3)


def test_sequential_update_equals_joint_solve():
    """Sequential scalar processing is algebraically identical to the joint
    S = H P H^T + R solve when R is diagonal."""
    rng = np.random.default_rng(0)
    n, m = 18, 28
    A = rng.standard_normal((n, n))
    P = A @ A.T + np.eye(n)
    H = rng.standard_normal((m, n))
    rdiag = rng.uniform(0.01, 1.0, m)
    err = rng.standard_normal(m)
    xbar = rng.standard_normal(n)

    # joint update (textbook)
    S = H @ P @ H.T + np.diag(rdiag)
    K = P @ H.T @ np.linalg.inv(S)
    x_joint = xbar + K @ err
    P_joint = (np.eye(n) - K @ H) @ P

    x_seq, P_seq = basic_kf.sequential_update(
        jnp.asarray(xbar), jnp.asarray(P), jnp.asarray(H),
        jnp.asarray(err), jnp.asarray(rdiag))
    np.testing.assert_allclose(np.asarray(x_seq), x_joint, atol=1e-9)
    np.testing.assert_allclose(np.asarray(P_seq), P_joint, atol=1e-9)
