"""Pallas TPU kernels: batched Cholesky factorization + triangular solves.

Why: the MPC's interior-point solver factorizes thousands of small (12H x
12H) Newton matrices per tick. XLA's TPU `Cholesky`/`InvertDiagBlocks...`
library calls run this batched-small regime at ~40 GFLOP/s (~57 ms for
4096 x 120 x 120 — measured, it dominates the whole solve). These kernels
instead put the *batch* dimension on the vector lanes: every scalar step of
the factorization is a 128-wide VPU op, the sequential n-step recursion
happens once for all scenarios in a tile simultaneously.

Data layout: matrices live as (n, n, B) — batch last (lanes), matrix rows on
sublanes. Callers transpose from the natural (B, n, n); the transposes are
cheap relative to the library calls they replace.

The factorization is blocked right-looking (panel width 8 = sublane tile):
factor an 8-column panel with rank-1 eliminations, then apply the panel's
Schur update to trailing column blocks (skipped per-block with `pl.when`).
Only the lower triangle is meaningful on output; the strict upper triangle
holds garbage that the solves never read.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 8          # panel width (sublane granularity)
LANES = 128     # batch tile width


def _chol_kernel(K_ref, L_ref):
    n = K_ref.shape[0]
    npan = n // NB
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)

    L_ref[...] = K_ref[...]

    def panel(p, _):
        base = p * NB

        # --- factor the 8-column panel ---
        def col_step(jj, _):
            j = base + jj
            d = L_ref[pl.ds(j, 1), pl.ds(j, 1), :]          # (1,1,B)
            inv = jax.lax.rsqrt(d)
            col = L_ref[:, pl.ds(j, 1), :]                  # (n,1,B)
            below = rows > j
            col = jnp.where(below, col * inv, col)
            L_ref[:, pl.ds(j, 1), :] = col
            L_ref[pl.ds(j, 1), pl.ds(j, 1), :] = d * inv    # sqrt(d)

            # eliminate the remaining columns of this panel
            for k_off in range(1, NB):
                @pl.when(jj + k_off < NB)
                def _():
                    k = j + k_off
                    f = L_ref[pl.ds(k, 1), pl.ds(j, 1), :]  # (1,1,B)
                    colk = L_ref[:, pl.ds(k, 1), :]
                    colk = jnp.where(below, colk - col * f, colk)
                    L_ref[:, pl.ds(k, 1), :] = colk
            return 0

        jax.lax.fori_loop(0, NB, col_step, 0)

        # --- trailing Schur update: blocks to the right of the panel ---
        Lp = L_ref[:, pl.ds(base, NB), :]                   # (n,NB,B)

        def trail(cb, _):
            @pl.when(cb > p)
            def _():
                cbase = cb * NB
                Lc = L_ref[pl.ds(cbase, NB), pl.ds(base, NB), :]  # (NB,NB,B)
                acc = L_ref[:, pl.ds(cbase, NB), :]
                for j in range(NB):
                    # acc[i, c, :] -= Lp[i, j, :] * L[cbase+c, base+j, :]
                    acc = acc - Lp[:, j:j + 1, :] * Lc[:, j:j + 1, :].reshape(
                        1, NB, Lc.shape[-1])
                L_ref[:, pl.ds(cbase, NB), :] = acc
            return 0

        jax.lax.fori_loop(0, npan, trail, 0)
        return 0

    jax.lax.fori_loop(0, npan, panel, 0)


def _solve_kernel(L_ref, rhs_ref, x_ref):
    """Solve L L^T x = rhs for one batch tile. rhs/x: (n, B)."""
    n = L_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    x_ref[...] = rhs_ref[...]

    # forward: L y = rhs
    def fwd(j, _):
        diag = L_ref[pl.ds(j, 1), pl.ds(j, 1), :].reshape(1, -1)   # (1,B)
        xj = x_ref[pl.ds(j, 1), :] / diag
        x_ref[pl.ds(j, 1), :] = xj
        col = L_ref[:, pl.ds(j, 1), :].reshape(x_ref.shape)        # (n,B)
        x = x_ref[...]
        x_ref[...] = jnp.where(rows > j, x - col * xj, x)
        return 0

    jax.lax.fori_loop(0, n, fwd, 0)

    # backward: L^T x = y  (column j of L^T is row j of L)
    def bwd(i, _):
        j = n - 1 - i
        diag = L_ref[pl.ds(j, 1), pl.ds(j, 1), :].reshape(1, -1)
        xj = x_ref[pl.ds(j, 1), :] / diag
        x_ref[pl.ds(j, 1), :] = xj
        rowj = L_ref[pl.ds(j, 1), :, :].reshape(x_ref.shape)       # (n,B)
        x = x_ref[...]
        x_ref[...] = jnp.where(rows < j, x - rowj * xj, x)
        return 0

    jax.lax.fori_loop(0, n, bwd, 0)


def _pad_batch(x, tile):
    b = x.shape[-1]
    pad = (-b) % tile
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x, b


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_lanes(Kt, interpret=False):
    """Batched Cholesky of (n, n, B) SPD matrices (batch on lanes).

    Returns Lt (n, n, B); only the lower triangle is valid."""
    n = Kt.shape[0]
    Kt, b0 = _pad_batch(Kt, LANES)
    B = Kt.shape[-1]
    out = pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n, B), Kt.dtype),
        grid=(B // LANES,),
        in_specs=[pl.BlockSpec((n, n, LANES), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, LANES), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        # in-place: the (n, n, LANES) tile is ~7.4 MB at n=120; separate
        # in/out buffers with pipeline double-buffering blow the ~16 MB
        # VMEM budget
        input_output_aliases={0: 0},
        interpret=interpret,
    )(Kt)
    return out[..., :b0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def cho_solve_lanes(Lt, rhs_t, interpret=False):
    """Solve L L^T x = rhs. Lt (n, n, B) from `cholesky_lanes`,
    rhs_t (n, B); returns x (n, B)."""
    n = Lt.shape[0]
    Lt, b0 = _pad_batch(Lt, LANES)
    rhs_t, _ = _pad_batch(rhs_t, LANES)
    B = Lt.shape[-1]
    out = pl.pallas_call(
        _solve_kernel,
        out_shape=jax.ShapeDtypeStruct((n, B), rhs_t.dtype),
        grid=(B // LANES,),
        in_specs=[
            pl.BlockSpec((n, n, LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, LANES), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(Lt, rhs_t)
    return out[..., :b0]
