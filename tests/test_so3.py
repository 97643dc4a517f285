import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_mpc_control_tpu.ops import so3


def random_eulers(n, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.uniform(-1.4, 1.4, size=(n,))
    p = rng.uniform(-1.4, 1.4, size=(n,))
    y = rng.uniform(-np.pi, np.pi, size=(n,))
    return jnp.stack([jnp.array(r), jnp.array(p), jnp.array(y)], axis=-1)


def test_euler_quat_roundtrip():
    e = random_eulers(200)
    q = so3.euler_to_quat(e)
    e2 = so3.quat_to_euler(q)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e), atol=1e-12)


def test_quat_rotmat_consistency():
    e = random_eulers(50, seed=1)
    q = so3.euler_to_quat(e)
    R = so3.quat_to_rotmat(q)
    # R must be orthonormal with det 1
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(np.asarray(eye),
                               np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-12)


def test_rotmat_matches_intrinsic_rpy():
    # world-from-body = Rz(yaw) Ry(pitch) Rx(roll)
    e = jnp.array([0.3, -0.2, 0.7])
    q = so3.euler_to_quat(e)
    R = so3.quat_to_rotmat(q)

    def rx(a):
        return np.array([[1, 0, 0],
                         [0, np.cos(a), -np.sin(a)],
                         [0, np.sin(a), np.cos(a)]])

    def ry(a):
        return np.array([[np.cos(a), 0, np.sin(a)],
                         [0, 1, 0],
                         [-np.sin(a), 0, np.cos(a)]])

    def rz(a):
        return np.array([[np.cos(a), -np.sin(a), 0],
                         [np.sin(a), np.cos(a), 0],
                         [0, 0, 1]])

    expected = rz(0.7) @ ry(-0.2) @ rx(0.3)
    np.testing.assert_allclose(np.asarray(R), expected, atol=1e-12)


def test_skew_cross_equivalence():
    rng = np.random.default_rng(2)
    a = jnp.array(rng.normal(size=3))
    b = jnp.array(rng.normal(size=3))
    np.testing.assert_allclose(np.asarray(so3.skew(a) @ b),
                               np.cross(np.asarray(a), np.asarray(b)),
                               atol=1e-12)


def test_quat_integrate_pure_yaw():
    q0 = jnp.array([1.0, 0.0, 0.0, 0.0])
    omega = jnp.array([0.0, 0.0, 1.0])   # 1 rad/s about z
    q = q0
    for _ in range(100):
        q = so3.quat_integrate(q, omega, 0.01)
    e = so3.quat_to_euler(q)
    np.testing.assert_allclose(np.asarray(e), [0.0, 0.0, 1.0], atol=1e-9)


def test_angvel_to_rpy_rate_zero_yaw_identity():
    np.testing.assert_allclose(np.asarray(so3.angvel_to_rpy_rate(0.0)),
                               np.eye(3), atol=1e-15)


def test_vmap_jit_compat():
    e = random_eulers(16)
    f = jax.jit(jax.vmap(lambda x: so3.quat_to_rotmat(so3.euler_to_quat(x))))
    out = f(e)
    assert out.shape == (16, 3, 3)
