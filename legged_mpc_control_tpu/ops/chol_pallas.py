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

# scoped-VMEM budget for the (n, n, LANES) resident tile (v5e limit 16 MB;
# leave headroom for the rhs tiles and pipeline state)
VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def fits_vmem(n: int, itemsize: int = 4) -> bool:
    """True if the matrix-resident kernels' (n, n, LANES) scratch fits the
    scoped-VMEM budget. Callers should fall back to the XLA backend (or the
    Riccati-structured solver for long horizons) when it does not."""
    return n * n * LANES * itemsize <= VMEM_BUDGET_BYTES


def _chol_kernel(K_hbm, L_hbm, L_ref, sem_in, sem_out):
    # K/L stay in HBM; one (n, n, LANES) VMEM scratch holds the active tile.
    # Automatic pipelining would double-buffer input AND output tiles
    # (4 x 7 MB at n=120 > the 16 MB scoped-VMEM budget on v5e); the
    # factorization is compute-bound, so serial DMA costs ~nothing.
    b = pl.program_id(0)
    n = L_ref.shape[0]
    lanes = L_ref.shape[-1]
    npan = n // NB
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)

    cp_in = pltpu.make_async_copy(
        K_hbm.at[:, :, pl.ds(b * lanes, lanes)], L_ref, sem_in)
    cp_in.start()
    cp_in.wait()

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

    cp_out = pltpu.make_async_copy(
        L_ref, L_hbm.at[:, :, pl.ds(b * lanes, lanes)], sem_out)
    cp_out.start()
    cp_out.wait()


def _solve_kernel(L_hbm, rhs_ref, x_ref, L_ref, sem_in):
    """Solve L L^T x = rhs for one batch tile. rhs/x: (n, B).

    L stays in HBM and is DMA'd into a single VMEM scratch — pipelined
    double-buffering of the 7 MB L tile would breach the scoped-VMEM limit."""
    b = pl.program_id(0)
    n = L_ref.shape[0]
    lanes = L_ref.shape[-1]
    cp_in = pltpu.make_async_copy(
        L_hbm.at[:, :, pl.ds(b * lanes, lanes)], L_ref, sem_in)
    cp_in.start()
    cp_in.wait()
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


def _solve_multi_kernel(L_hbm, rhs_ref, x_ref, L_ref, sem_in):
    """Solve L L^T X = RHS for one batch tile with MULTIPLE right-hand
    sides. rhs/x: (n, m, B) — RHS columns on sublanes, batch on lanes.
    Same recursion as `_solve_kernel`; every step updates all m columns
    of all B scenarios in one (n, m, B) vector op."""
    b = pl.program_id(0)
    n = L_ref.shape[0]
    lanes = L_ref.shape[-1]
    cp_in = pltpu.make_async_copy(
        L_hbm.at[:, :, pl.ds(b * lanes, lanes)], L_ref, sem_in)
    cp_in.start()
    cp_in.wait()
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    x_ref[...] = rhs_ref[...]

    # forward: L Y = RHS
    def fwd(j, _):
        diag = L_ref[pl.ds(j, 1), pl.ds(j, 1), :]                # (1,1,B)
        xj = x_ref[pl.ds(j, 1), :, :] / diag                     # (1,m,B)
        x_ref[pl.ds(j, 1), :, :] = xj
        col = L_ref[:, pl.ds(j, 1), :]                           # (n,1,B)
        x = x_ref[...]
        x_ref[...] = jnp.where(rows > j, x - col * xj, x)
        return 0

    jax.lax.fori_loop(0, n, fwd, 0)

    # backward: L^T X = Y  (column j of L^T is row j of L)
    def bwd(i, _):
        j = n - 1 - i
        diag = L_ref[pl.ds(j, 1), pl.ds(j, 1), :]
        xj = x_ref[pl.ds(j, 1), :, :] / diag
        x_ref[pl.ds(j, 1), :, :] = xj
        rowj = L_ref[pl.ds(j, 1), :, :]                          # (1,n,B)
        rowj = jnp.swapaxes(rowj, 0, 1)                          # (n,1,B)
        x = x_ref[...]
        x_ref[...] = jnp.where(rows < j, x - rowj * xj, x)
        return 0

    jax.lax.fori_loop(0, n, bwd, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cho_solve_lanes_multi(Lt, rhs_t, interpret=False):
    """Solve L L^T X = RHS with m right-hand sides per scenario.
    Lt (n, n, B) from `cholesky_lanes`, rhs_t (n, m, B); returns (n, m, B).

    m is padded up to the sublane tile (8); the pad columns solve against
    zero RHS and are dropped on return."""
    n, m = rhs_t.shape[0], rhs_t.shape[1]
    mp = ((m + NB - 1) // NB) * NB
    if mp != m:
        rhs_t = jnp.pad(rhs_t, ((0, 0), (0, mp - m), (0, 0)))
    Lt, b0 = _pad_batch(Lt, LANES)
    rhs_t, _ = _pad_batch(rhs_t, LANES)
    B = Lt.shape[-1]
    out = pl.pallas_call(
        _solve_multi_kernel,
        out_shape=jax.ShapeDtypeStruct((n, mp, B), rhs_t.dtype),
        grid=(B // LANES,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n, mp, LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, mp, LANES), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n, n, LANES), Lt.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(Lt, rhs_t)
    return out[:, :m, :b0]


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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((n, n, LANES), Kt.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n, LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, LANES), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n, n, LANES), Lt.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(Lt, rhs_t)
    return out[..., :b0]
