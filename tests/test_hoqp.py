"""Hierarchical QP (control/hoqp.py) vs the independent f64 QP oracle.

Mirrors the reference's ho_qp_test (reference: src/test/ho_qp_test.cpp:10-47)
— two-level random hierarchies with equalities satisfied tightly and
inequalities held — plus direct oracle checks of the interior-point level
solver and of the hierarchy's per-level optimality.
"""

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.control import hoqp
from tests.oracle import solve_qp_oracle

INF = 1e20


def _rand_qp(rng, n=8, m=10):
    R = rng.standard_normal((n, n))
    H = R.T @ R + np.eye(n)
    c = rng.standard_normal(n)
    D = rng.standard_normal((m, n))
    f = rng.uniform(0.5, 2.0, m)        # x=0 strictly feasible
    return H, c, D, f


def test_solve_ineq_qp_matches_oracle():
    rng = np.random.default_rng(0)
    for _ in range(5):
        H, c, D, f = _rand_qp(rng)
        x = hoqp.solve_ineq_qp(jnp.asarray(H), jnp.asarray(c),
                               jnp.asarray(D), jnp.asarray(f), iters=25)
        want = solve_qp_oracle(H, c, D, np.full(D.shape[0], -INF), f)
        np.testing.assert_allclose(np.asarray(x), want, atol=1e-6)


def test_two_level_hierarchy_against_oracle():
    """Level-0 solved exactly; level-1 as good as the oracle's constrained
    least squares in level-0's feasible null space."""
    rng = np.random.default_rng(1)
    n = 6
    for trial in range(4):
        A0 = rng.standard_normal((2, n))
        b0 = rng.standard_normal(2)
        D0 = rng.standard_normal((3, n))
        f0 = rng.uniform(0.5, 2.0, 3)
        A1 = rng.standard_normal((3, n))
        b1 = rng.standard_normal(3)

        t0 = hoqp.HoTask(A=jnp.asarray(A0), b=jnp.asarray(b0),
                         D=jnp.asarray(D0), f=jnp.asarray(f0))
        t1 = hoqp.HoTask(A=jnp.asarray(A1), b=jnp.asarray(b1),
                         D=jnp.zeros((0, n)), f=jnp.zeros((0,)))
        x = np.asarray(hoqp.hoqp_solve([t0, t1], n, iters=25))

        # level 0 equalities met tightly, inequalities hold
        # (reference test tolerance 1e-6, ho_qp_test.cpp:36-44)
        np.testing.assert_allclose(A0 @ x, b0, atol=1e-6)
        assert np.all(D0 @ x <= f0 + 1e-6)

        # level-1 residual matches the oracle's optimum over the same set
        Hm = A1.T @ A1 + 1e-9 * np.eye(n)
        g = -A1.T @ b1
        Ac = np.concatenate([A0, D0], axis=0)
        lb = np.concatenate([b0, np.full(3, -INF)])
        ub = np.concatenate([b0, f0])
        want = solve_qp_oracle(Hm, g, Ac, lb, ub)
        r_got = np.linalg.norm(A1 @ x - b1)
        r_want = np.linalg.norm(A1 @ want - b1)
        assert r_got <= r_want + 1e-5, (trial, r_got, r_want)


def test_lower_level_cannot_violate_upper_inequalities():
    """A lower level pulling hard toward an infeasible point must stay on
    the upper level's constraint boundary (slack-relaxed recursion,
    reference HoQp.cpp buildDMatrix/buildFVector)."""
    n = 3
    # level 0: no equalities, box |x_i| <= 1
    D0 = np.concatenate([np.eye(n), -np.eye(n)], axis=0)
    f0 = np.ones(2 * n)
    t0 = hoqp.HoTask(A=jnp.zeros((0, n)), b=jnp.zeros((0,)),
                     D=jnp.asarray(D0), f=jnp.asarray(f0))
    # level 1: x = 5 (infeasible)
    t1 = hoqp.HoTask(A=jnp.eye(n), b=jnp.full((n,), 5.0),
                     D=jnp.zeros((0, n)), f=jnp.zeros((0,)))
    x = np.asarray(hoqp.hoqp_solve([t0, t1], n, iters=30))
    np.testing.assert_allclose(x, 1.0, atol=1e-4)


def test_jit_and_vmap():
    rng = np.random.default_rng(2)
    H, c, D, f = _rand_qp(rng, n=5, m=6)
    fn = jax.jit(lambda cc: hoqp.solve_ineq_qp(
        jnp.asarray(H), cc, jnp.asarray(D), jnp.asarray(f), iters=20))
    x = fn(jnp.asarray(c))
    assert x.shape == (5,)
    cs = jnp.stack([jnp.asarray(c), jnp.asarray(c) * 0.5])
    xs = jax.vmap(fn)(cs)
    assert xs.shape == (2, 5)
    want = solve_qp_oracle(H, 0.5 * c, D, np.full(6, -INF), f)
    np.testing.assert_allclose(np.asarray(xs[1]), want, atol=1e-6)
