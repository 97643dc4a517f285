"""Unrolled batched Cholesky + triangular solves for tiny SPD matrices.

The Riccati MPC solver (mpc/riccati.py) factorizes an (B, 12, 12) SPD input
Hessian per horizon stage. XLA's library Cholesky/TriangularSolve custom
calls are catastrophically slow in this batched-tiny regime (see
ops/chol_pallas.py for measurements at 120x120); for n <= ~16 the right tool
is full unrolling — every step becomes a (B,)-wide elementwise VPU op that
XLA fuses freely, no custom calls, no Pallas needed.

All functions take batch-leading arrays and static tiny n.
"""

import jax.numpy as jnp


def chol_small(A):
    """Lower Cholesky of (..., n, n) SPD, unrolled over static n."""
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(n):
        if j:
            d = A[..., j, j] - jnp.sum(L[..., j, :j] ** 2, axis=-1)
        else:
            d = A[..., j, j]
        dsq = jnp.sqrt(d)
        L = L.at[..., j, j].set(dsq)
        if j + 1 < n:
            r = A[..., j + 1:, j]
            if j:
                r = r - jnp.einsum("...ik,...k->...i",
                                   L[..., j + 1:, :j], L[..., j, :j])
            L = L.at[..., j + 1:, j].set(r / dsq[..., None])
    return L


def solve_lower(L, B):
    """Solve L Y = B with L (..., n, n) lower, B (..., n, m). Unrolled."""
    n = L.shape[-1]
    ys = []
    for i in range(n):
        acc = B[..., i, :]
        if i:
            prev = jnp.stack(ys, axis=-2)                 # (..., i, m)
            acc = acc - jnp.einsum("...j,...jm->...m",
                                   L[..., i, :i], prev)
        ys.append(acc / L[..., i, i][..., None])
    return jnp.stack(ys, axis=-2)


def solve_upper_t(L, B):
    """Solve L^T Y = B (same lower L), B (..., n, m). Unrolled."""
    n = L.shape[-1]
    ys = [None] * n
    for i in range(n - 1, -1, -1):
        acc = B[..., i, :]
        if i + 1 < n:
            below = jnp.stack(ys[i + 1:], axis=-2)        # (..., n-1-i, m)
            acc = acc - jnp.einsum("...j,...jm->...m",
                                   L[..., i + 1:, i], below)
        ys[i] = acc / L[..., i, i][..., None]
    return jnp.stack(ys, axis=-2)


def cho_solve_small(L, B):
    """Solve (L L^T) Y = B, B (..., n, m)."""
    return solve_upper_t(L, solve_lower(L, B))
