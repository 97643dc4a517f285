"""Pallas batched-Cholesky kernels vs numpy reference (interpret mode on
CPU; the same kernels compile for TPU in bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.ops import chol_pallas


def spd_batch(b, n, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(b, n, n)).astype(np.float64)
    K = A @ A.transpose(0, 2, 1) * 0.05 + 5.0 * np.eye(n)
    return jnp.asarray(K.transpose(1, 2, 0), dtype)   # (n, n, b)


def test_cholesky_matches_numpy():
    n, b = 24, 16
    Kt = spd_batch(b, n, dtype=jnp.float64)
    Lt = chol_pallas.cholesky_lanes(Kt, interpret=True)
    L = np.asarray(Lt).transpose(2, 0, 1)
    K = np.asarray(Kt).transpose(2, 0, 1)
    Lref = np.linalg.cholesky(K)
    tril = np.tril(np.ones((n, n), dtype=bool))
    np.testing.assert_allclose(L[:, tril], Lref[:, tril], atol=1e-10)


def test_cholesky_nondivisible_batch_padding():
    n, b = 16, 5       # not a multiple of the lane tile
    Kt = spd_batch(b, n, seed=2, dtype=jnp.float64)
    Lt = chol_pallas.cholesky_lanes(Kt, interpret=True)
    assert Lt.shape == (n, n, b)
    L = np.asarray(Lt).transpose(2, 0, 1)
    Lref = np.linalg.cholesky(np.asarray(Kt).transpose(2, 0, 1))
    tril = np.tril(np.ones((n, n), dtype=bool))
    np.testing.assert_allclose(L[:, tril], Lref[:, tril], atol=1e-10)


def test_cho_solve_matches_numpy():
    n, b = 24, 16
    Kt = spd_batch(b, n, seed=3, dtype=jnp.float64)
    rng = np.random.default_rng(4)
    rhs = jnp.asarray(rng.normal(size=(n, b)))
    Lt = chol_pallas.cholesky_lanes(Kt, interpret=True)
    x = chol_pallas.cho_solve_lanes(Lt, rhs, interpret=True)
    K = np.asarray(Kt).transpose(2, 0, 1)
    want = np.stack([np.linalg.solve(K[i], np.asarray(rhs)[:, i])
                     for i in range(b)], axis=-1)
    np.testing.assert_allclose(np.asarray(x), want, atol=1e-9)


def test_mpc_sized_problem():
    """The actual Newton-system shape: n=120 (H=10), f32 accuracy."""
    n, b = 120, 8
    Kt = spd_batch(b, n, seed=5, dtype=jnp.float32)
    rng = np.random.default_rng(6)
    rhs = jnp.asarray(rng.normal(size=(n, b)), jnp.float32)
    Lt = chol_pallas.cholesky_lanes(Kt, interpret=True)
    x = chol_pallas.cho_solve_lanes(Lt, rhs, interpret=True)
    K = np.asarray(Kt, np.float64).transpose(2, 0, 1)
    want = np.stack([np.linalg.solve(K[i], np.asarray(rhs, np.float64)[:, i])
                     for i in range(b)], axis=-1)
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-4, atol=2e-4)
