"""Fully-fused Pallas TPU kernel: the ENTIRE Riccati interior-point MPC
solve in one launch.

The XLA formulation (mpc/riccati.py) runs ~6 sequential stage scans per IP
iteration; each stage body is a tiny fused block, so the solve is
launch/boundary-bound, not FLOP- or bandwidth-bound. This kernel holds one
128-lane batch tile's ENTIRE problem in VMEM — stage matrices, iterates,
Riccati caches — and executes all Mehrotra iterations in a single
pallas_call: zero HBM round-trips between stages or iterations.

Identical algorithm to mpc/riccati.py (same predictor-corrector, same
freeze/guard logic); all tensors live stage-major with the batch on the
lane axis, and every 12x12 / 6x3 contraction is hand-unrolled into
lane-wide VPU ops (the same batch-in-lanes playbook as ops/chol_pallas.py).

VMEM budget per tile ~ (6 + 3H/5) MB at f32 — fits comfortably to H ~ 12,
which covers the H=10 flagship path; longer horizons use the XLA version
(`fits(H)`).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from legged_mpc_control_tpu.constants import GRAVITY
from legged_mpc_control_tpu.mpc.pdip import _GA, _GB

NX = 12
LANES = 128
MAX_H_RESIDENT = 12


def fits(horizon: int, dtype=jnp.float32) -> bool:
    """True if the full-resident kernel serves this horizon."""
    return horizon <= MAX_H_RESIDENT and jnp.dtype(dtype) == jnp.float32


# --- lanes-layout small algebra (operands (..., n, n, L) / (..., n, L)) ----

def _mm(A, C):
    n = A.shape[-2]
    acc = A[..., :, 0, :][..., :, None, :] * C[..., 0, :, :][..., None, :, :]
    for j in range(1, n):
        acc = acc + (A[..., :, j, :][..., :, None, :]
                     * C[..., j, :, :][..., None, :, :])
    return acc


def _mtm(A, C):
    n = A.shape[-3]
    acc = A[..., 0, :, :][..., :, None, :] * C[..., 0, :, :][..., None, :, :]
    for j in range(1, n):
        acc = acc + (A[..., j, :, :][..., :, None, :]
                     * C[..., j, :, :][..., None, :, :])
    return acc


def _mv(A, x):
    n = A.shape[-2]
    acc = A[..., :, 0, :] * x[..., 0, :][..., None, :]
    for j in range(1, n):
        acc = acc + A[..., :, j, :] * x[..., j, :][..., None, :]
    return acc


def _mtv(A, x):
    n = A.shape[-3]
    acc = A[..., 0, :, :] * x[..., 0, :][..., None, :]
    for j in range(1, n):
        acc = acc + A[..., j, :, :] * x[..., j, :][..., None, :]
    return acc


def _chol(A):
    """Lower Cholesky of (n, n, L), unrolled."""
    n = A.shape[0]
    rows = [[None] * n for _ in range(n)]
    for j in range(n):
        d = A[j, j]
        for k in range(j):
            d = d - rows[j][k] * rows[j][k]
        dj = jnp.sqrt(d)
        rows[j][j] = dj
        inv = 1.0 / dj
        for i in range(j + 1, n):
            v = A[i, j]
            for k in range(j):
                v = v - rows[i][k] * rows[j][k]
            rows[i][j] = v * inv
    zero = jnp.zeros_like(A[0, 0])
    return jnp.stack([jnp.stack([rows[i][j] if j <= i else zero
                                 for j in range(n)]) for i in range(n)])


def _cho_solve(L, M):
    """(L L^T) Y = M; M (n, m, L) or (n, L)."""
    vec = M.ndim == 2
    if vec:
        M = M[:, None, :]
    n = L.shape[0]
    ys = []
    for i in range(n):
        acc = M[i]
        for k in range(i):
            acc = acc - L[i, k][None, :] * ys[k]
        ys.append(acc / L[i, i][None, :])
    zs = [None] * n
    for i in range(n - 1, -1, -1):
        acc = ys[i]
        for k in range(i + 1, n):
            acc = acc - L[k, i][None, :] * zs[k]
        zs[i] = acc / L[i, i][None, :]
    out = jnp.stack(zs)
    return out[:, 0, :] if vec else out


# --- G(mu) operators, lanes layout, mu a (L,) lane vector ------------------

def _g_apply(u, mu):
    """G u: u (H,4,3,L) -> (H,4,6,L)."""
    rows = []
    for r in range(6):
        acc = None
        for i in range(3):
            coef = _GA[r][i] + mu * _GB[r][i]          # (L,)
            term = u[..., i, :] * coef
            acc = term if acc is None else acc + term
        rows.append(acc)
    return jnp.stack(rows, axis=-2)


def _gt_apply(w, mu):
    """G^T w: w (H,4,6,L) -> (H,4,3,L)."""
    cols = []
    for i in range(3):
        acc = None
        for r in range(6):
            coef = _GA[r][i] + mu * _GB[r][i]
            term = w[..., r, :] * coef
            acc = term if acc is None else acc + term
        cols.append(acc)
    return jnp.stack(cols, axis=-2)


def _gtdg(d, mu):
    """3x3 blocks of G^T diag(d) G: d (H,4,6,L) -> (H,4,3,3,L)."""
    out = []
    for i in range(3):
        row = []
        for j in range(3):
            acc = None
            for r in range(6):
                ci = _GA[r][i] + mu * _GB[r][i]
                cj = _GA[r][j] + mu * _GB[r][j]
                term = d[..., r, :] * (ci * cj)
                acc = term if acc is None else acc + term
            row.append(acc)
        out.append(jnp.stack(row, axis=-2))
    return jnp.stack(out, axis=-3)


def _make_kernel(H, iters, dt, tol, d_max, reg, eps, warm):
    m_con = H * 4 * 6

    def kernel(x0_ref, xref_ref, A_ref, B_ref, qw_ref, rw_ref, mu_ref,
               fz_ref, u0_ref, u_out, gap_out, lam_out, L_s, K_s, Hx_s,
               vec_s, kff_s, du_s, blk_s, u_s, g_s):
        # tile views (all VMEM)
        x0 = x0_ref[...]                   # (12, L)
        Bm = B_ref[...]                    # (H, 12, 12, L) (contact-masked)
        qw = qw_ref[...]                   # (12, L)
        rw = rw_ref[...]                   # (12, L)
        mu = mu_ref[0]                     # (L,)
        fz = fz_ref[0]                     # (L,)
        dtype = x0.dtype
        L_lanes = x0.shape[-1]

        # constants assembled scatter-free AND closure-free (Pallas rejects
        # captured constant arrays; iota arithmetic materializes in-kernel)
        row12 = jax.lax.broadcasted_iota(jnp.int32, (NX, 1), 0)
        d_aff = jnp.where(row12 == NX - 1, -GRAVITY * dt,
                          0.0).astype(dtype)                   # (12,1)
        ii = jax.lax.broadcasted_iota(jnp.int32, (NX, NX), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (NX, NX), 1)
        eyeq = (ii == jj).astype(dtype)
        h = jnp.concatenate([
            jnp.zeros((H, 4, 4, L_lanes), dtype),
            jnp.broadcast_to(fz, (H, 4, 1, L_lanes)),
            jnp.zeros((H, 4, 1, L_lanes), dtype),
        ], axis=2)

        def read_stage(ref, k):
            return ref[pl.ds(k, 1)][0]

        def rollout_psi(u):
            """X rollout then backward adjoint, both through vec_s.
            Returns psi (H,12,L) = dJ/dx_{k+1} (value read from scratch).
            Stage-indexed operands go through refs (u_s) — Mosaic TC has
            no dynamic_slice on values."""
            u_s[...] = u

            def fwd(k, x):
                x = (_mv(read_stage(A_ref, k), x)
                     + _mv(read_stage(B_ref, k), read_stage(u_s, k))
                     + d_aff)
                vec_s[pl.ds(k, 1)] = x[None]
                return x

            jax.lax.fori_loop(0, H, fwd, x0)

            def bwd(i, p):
                k = H - 1 - i
                xk = read_stage(vec_s, k)
                qx = qw * (xk - read_stage(xref_ref, k))
                pk = qx + jnp.where(k + 1 < H, 1.0, 0.0) * _mtv(
                    read_stage(A_ref, jnp.minimum(k + 1, H - 1)), p)
                vec_s[pl.ds(k, 1)] = pk[None]
                return pk

            jax.lax.fori_loop(0, H, bwd, jnp.zeros((NX, L_lanes), dtype))
            return vec_s[...]

        def factor():
            """Backward Riccati factor sweep; caches to L_s/K_s/Hx_s.
            Reads the (H,4,3,3,L) interior-point G^T D G leg blocks from
            the blk_s scratch ref — a dynamic stage slice of a VALUE is
            not lowerable on Mosaic TC, a ref slice is."""
            qdiag = eyeq[:, :, None] * qw[:, None, :]
            rdiag = eyeq[:, :, None] * (rw[:, None, :] + reg)
            zero33 = jnp.zeros((3, 3, L_lanes), dtype)

            def step(i, Pn):
                k = H - 1 - i
                Ak = read_stage(A_ref, k)
                Bk = read_stage(B_ref, k)
                blk = read_stage(blk_s, k)
                rows = []
                for leg in range(4):
                    rows.append(jnp.concatenate(
                        [blk[leg] if c == leg else zero33
                         for c in range(4)], axis=1))
                Huk = jnp.concatenate(rows, axis=0) + rdiag
                W = Pn + qdiag
                BW = _mtm(Bk, W)
                Huu = Huk + _mm(BW, Bk)
                Hux = _mm(BW, Ak)
                Lc = _chol(Huu)
                K = -_cho_solve(Lc, Hux)
                Pn = _mm(_mtm(Ak, W), Ak) + _mtm(Hux, K)
                Pn = 0.5 * (Pn + jnp.swapaxes(Pn, 0, 1))
                L_s[pl.ds(k, 1)] = Lc[None]
                K_s[pl.ds(k, 1)] = K[None]
                Hx_s[pl.ds(k, 1)] = Hux[None]
                return Pn

            jax.lax.fori_loop(0, H, step,
                              jnp.zeros((NX, NX, L_lanes), dtype))

        def lqr_solve(g):
            """du = -K^{-1} g using the L_s/K_s/Hx_s caches."""
            g_s[...] = g

            def bwd(i, p):
                k = H - 1 - i
                gtot = read_stage(g_s, k) + _mtv(read_stage(B_ref, k), p)
                kff = -_cho_solve(read_stage(L_s, k), gtot)
                p = (_mtv(read_stage(A_ref, k), p)
                     + _mtv(read_stage(Hx_s, k), kff))
                kff_s[pl.ds(k, 1)] = kff[None]
                return p

            jax.lax.fori_loop(0, H, bwd, jnp.zeros((NX, L_lanes), dtype))

            def fwd(k, dx):
                du = read_stage(kff_s, k) + _mv(read_stage(K_s, k), dx)
                dx = (_mv(read_stage(A_ref, k), dx)
                      + _mv(read_stage(B_ref, k), du))
                du_s[pl.ds(k, 1)] = du[None]
                return dx

            jax.lax.fori_loop(0, H, fwd, jnp.zeros((NX, L_lanes), dtype))
            return du_s[...]

        def body(carry, _):
            u, s, lam, done = carry
            u_legs = u.reshape(H, 4, 3, L_lanes)
            psi = rollout_psi(u)
            r_dual = (u * rw[None] + _mtv(Bm, psi)
                      + _gt_apply(lam, mu).reshape(H, NX, L_lanes))
            r_prim = _g_apply(u_legs, mu) + s - h
            mu_gap = jnp.sum(s * lam, axis=(0, 1, 2)) / m_con    # (L,)

            dscale = jnp.clip(lam / jnp.maximum(s, eps), 0.0, d_max)
            blk_s[...] = _gtdg(dscale, mu)
            factor()                                   # caches -> scratch

            def solve_dir(rc):
                w = (lam * r_prim - rc) / jnp.maximum(s, eps)
                g = r_dual + _gt_apply(w, mu).reshape(H, NX, L_lanes)
                du = lqr_solve(g)
                ds = -(r_prim + _g_apply(du.reshape(H, 4, 3, L_lanes), mu))
                dlam = -(rc + lam * ds) / jnp.maximum(s, eps)
                return du, ds, dlam

            du_a, ds_a, dl_a = solve_dir(lam * s)

            def max_step(v, dv):
                ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0),
                                  jnp.inf)
                return jnp.minimum(1.0, jnp.min(ratio, axis=(0, 1, 2)))

            def bc(x):
                return x[None, None, None, :]

            a_p = max_step(s, ds_a)
            a_d = max_step(lam, dl_a)
            mu_aff = jnp.sum((s + bc(a_p) * ds_a) * (lam + bc(a_d) * dl_a),
                             axis=(0, 1, 2)) / m_con
            sigma = jnp.clip((mu_aff / jnp.maximum(mu_gap, eps)) ** 3,
                             1e-4, 0.9)
            corr = jnp.clip(ds_a * dl_a, -10.0 * bc(mu_gap),
                            10.0 * bc(mu_gap))
            rc = lam * s + corr - bc(sigma) * bc(mu_gap)
            du, ds, dlam = solve_dir(rc)

            a_p = 0.99 * max_step(s, ds)
            a_d = 0.99 * max_step(lam, dlam)

            # triple residual gate (see mpc/riccati.py: a warm start can
            # hold tiny complementarity with an unconverged dual residual)
            conv = ((mu_gap < tol)
                    & (jnp.max(jnp.abs(r_prim), axis=(0, 1, 2)) < 1e3 * tol)
                    & (jnp.max(jnp.abs(r_dual), axis=(0, 1)) < 1e3 * tol))
            bad = ~(jnp.all(jnp.isfinite(du), axis=(0, 1))
                    & jnp.all(jnp.isfinite(ds), axis=(0, 1, 2))
                    & jnp.all(jnp.isfinite(dlam), axis=(0, 1, 2)))
            # `done` is carried as f32 (1.0 = frozen): an i1 lane-vector in
            # the scf.for carry fails Mosaic legalization
            done = jnp.maximum(done,
                               jnp.where(conv | bad, 1.0, 0.0).astype(dtype))
            dn_u = done[None, None, :] > 0.5
            dn4 = bc(done) > 0.5
            u2 = jnp.where(dn_u, u, u + a_p[None, None, :] * du)
            s2 = jnp.where(dn4, s, s + bc(a_p) * ds)
            lam2 = jnp.where(dn4, lam, lam + bc(a_d) * dlam)
            return (u2, s2, lam2, done), None

        u0 = u0_ref[...]
        if warm:
            # primal warm start from the shifted previous-tick solution,
            # slacks clipped interior, duals recentered (mpc/riccati.py)
            s0 = jnp.maximum(h - _g_apply(u0.reshape(H, 4, 3, L_lanes), mu),
                             0.1)
            lam0 = jnp.clip(1.0 / s0, 1e-3, 1e2)
        else:
            s0 = jnp.maximum(h - _g_apply(u0.reshape(H, 4, 3, L_lanes), mu),
                             1.0)
            lam0 = jnp.ones_like(s0)
        done0 = jnp.zeros((L_lanes,), dtype)
        (u, s, lam, done) = jax.lax.fori_loop(
            0, iters, lambda _i, c: body(c, None)[0],
            (u0, s0, lam0, done0))
        u_out[...] = u
        gap_out[...] = (jnp.sum(s * lam, axis=(0, 1, 2)) / m_con)[None]
        lam_out[...] = lam

    return kernel


@functools.partial(jax.jit, static_argnames=("dt", "iters", "interpret"))
def solve_qp_riccati_fused(x0, x_ref, A_seq, Bmat, contact, q_weights,
                           r_weights, mu, fz_max, dt, *, iters=18,
                           interpret=False, warm_u=None):
    """One-launch Riccati IPM. Same contract as
    mpc.riccati.solve_qp_riccati_batched but f32-only and H <= 12
    (dispatched by riccati.solve_qp_riccati when it `fits`).
    Returns (u (B, 12H) with swing legs zeroed, duality gap (B,),
    inequality duals lam (B, H, 4, 6) — consumed by the optional
    post-solve dual-residual diagnostic, mpc/riccati.py)."""
    B, H, _ = x_ref.shape
    dtype = x_ref.dtype
    tol = 1e-6
    d_max = 1e6
    reg = 1e-6
    eps = 1e-20

    legmask = jnp.repeat(contact, 3, axis=-1)                  # (B,H,12)
    B_seq = Bmat[:, None] * legmask[:, :, None, :]

    # lanes layout, padded to the tile width
    pad = (-B) % LANES
    Bp = B + pad

    def lanes(x, ndim_stage):
        """(B, ...) -> (..., Bp) with zero padding."""
        perm = tuple(range(1, x.ndim)) + (0,)
        xt = jnp.transpose(x, perm)
        if pad:
            xt = jnp.pad(xt, [(0, 0)] * (xt.ndim - 1) + [(0, pad)],
                         constant_values=1.0 if ndim_stage == "one" else 0.0)
        return xt

    x0_t = lanes(x0, 0)                                        # (12,Bp)
    xref_t = lanes(x_ref, 0)                                   # (H,12,Bp)
    A_t = lanes(A_seq, 0)                                      # (H,12,12,Bp)
    B_t = lanes(B_seq, 0)
    qw = jnp.broadcast_to(jnp.asarray(q_weights, dtype),
                          (B, NX))
    rw = jnp.broadcast_to(jnp.asarray(r_weights, dtype), (B, NX))
    qw_t = lanes(qw, 0)
    rw_t = lanes(rw, 0)
    mu_t = lanes(jnp.broadcast_to(jnp.asarray(mu, dtype), (B,))[:, None],
                 0)                                            # (1,Bp)
    fz_t = lanes(jnp.broadcast_to(jnp.asarray(fz_max, dtype),
                                  (B,))[:, None], "one")       # (1,Bp)
    # padded lanes: identity-ish problem (A=I would help conditioning, but
    # zeros are fine — fz pad=1 keeps s0 interior and the lane frozen-safe)

    if warm_u is None:
        u0_t = jnp.zeros((H, NX, Bp), dtype)
    else:
        u0 = warm_u.reshape(B, H, NX) * legmask
        u0_t = lanes(u0, 0)                                    # (H,12,Bp)

    kernel = _make_kernel(H, iters, float(dt), tol, d_max, reg, eps,
                          warm_u is not None)
    grid = (Bp // LANES,)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape[:-1] + (LANES,),
                            lambda b, _nd=nd: (0,) * (_nd - 1) + (b,),
                            memory_space=pltpu.VMEM)

    u, gap, lam = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((H, NX, Bp), dtype),
                   jax.ShapeDtypeStruct((1, Bp), dtype),
                   jax.ShapeDtypeStruct((H, 4, 6, Bp), dtype)],
        grid=grid,
        in_specs=[
            spec((NX, Bp)),
            spec((H, NX, Bp)),
            spec((H, NX, NX, Bp)),
            spec((H, NX, NX, Bp)),
            spec((NX, Bp)),
            spec((NX, Bp)),
            spec((1, Bp)),
            spec((1, Bp)),
            spec((H, NX, Bp)),
        ],
        out_specs=[spec((H, NX, Bp)), spec((1, Bp)),
                   spec((H, 4, 6, Bp))],
        scratch_shapes=[
            pltpu.VMEM((H, NX, NX, LANES), dtype),     # L cache
            pltpu.VMEM((H, NX, NX, LANES), dtype),     # K cache
            pltpu.VMEM((H, NX, NX, LANES), dtype),     # Hux cache
            pltpu.VMEM((H, NX, LANES), dtype),         # X/psi workspace
            pltpu.VMEM((H, NX, LANES), dtype),         # kff workspace
            pltpu.VMEM((H, NX, LANES), dtype),         # du workspace
            pltpu.VMEM((H, 4, 3, 3, LANES), dtype),    # G^T D G leg blocks
            pltpu.VMEM((H, NX, LANES), dtype),         # u (stage reads)
            pltpu.VMEM((H, NX, LANES), dtype),         # lqr rhs g
        ],
        interpret=interpret,
    )(x0_t, xref_t, A_t, B_t, qw_t, rw_t, mu_t, fz_t, u0_t)

    u = u[..., :B]                                             # (H,12,B)
    u = u.transpose(2, 0, 1).reshape(B, H * NX)
    lam = lam[..., :B].transpose(3, 0, 1, 2)                   # (B,H,4,6)
    return u * legmask.reshape(B, H * NX), gap[0, :B], lam
