"""Fully-fused Pallas TPU kernel: ALL contact-implicit GN-iLQR sweeps in
one launch (flat-terrain, wall-free product path).

The XLA formulation (mpc/ci_mpc.ci_solve_batched) runs, per sweep, a
10-stage backward scan (quadratize + gain solve + value update), six
10-stage forward scans (line-search candidates + the applied step), each
stage a small fused block — so the solve is launch/boundary-bound exactly
like the convex Riccati was before ops/riccati_pallas.py. This kernel
holds one 128-lane batch tile's ENTIRE problem in VMEM — trajectory,
references, gain caches — and executes every sweep in a single
pallas_call.

Same algorithm as ci_solve_batched (same per-foot Gauss-Newton
quadratization with the Fischer-Burmeister violation-side curvature, same
Levenberg state-space regularization, same 5-candidate line search with
the alpha=0 baseline), with two structural specializations:

  * FLAT-ZERO TERRAIN: gap(foot) = foot_z, so the per-foot residual
    Jacobian has ~11 static nonzeros and the stage Hessian collapses to a
    diagonal Hxx, a per-foot-sparse Huu, and a one-entry-per-foot Hux
    (callers gate on `terrain_is_flat_zero`; height-field/wall problems
    stay on the XLA path);
  * BLOCK-SPARSE dynamics algebra: Fz = I + dt S and Fu = dt T are never
    materialized — Fz'Vxx Fz = Vxx + dt(Y' + Y) + dt^2 S'Y with Y = Vxx S
    etc., where applying S/T is a handful of 3x3 lane products instead of
    dense 24x24 chains.

All tensors live stage-major with the batch on the lane axis; every
contraction is hand-unrolled into lane-wide VPU ops (the batch-in-lanes
playbook of ops/chol_pallas.py / ops/riccati_pallas.py).

VMEM per tile ~ 5 MB at H = 12 f32 (K cache dominates) — `fits(H)` gates.
Equivalence to the XLA path is pinned by tests/test_ci_fused.py
(interpret mode on CPU, real kernel on TPU)."""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NZ = 24
NU = 24
LANES = 128
MAX_H_RESIDENT = 12
F0 = 50.0
G0 = 0.02


def fits(horizon: int, dtype=jnp.float32) -> bool:
    """True if the full-resident kernel serves this horizon/dtype."""
    return horizon <= MAX_H_RESIDENT and jnp.dtype(dtype) == jnp.float32


def terrain_is_flat_zero(terrain) -> bool:
    """Concrete check (policy-build time) that the height field is
    identically zero — the kernel's gap(foot) = foot_z specialization."""
    import numpy as np
    try:
        return bool(np.all(np.asarray(terrain.heights) == 0.0))
    except Exception:
        return False


# --- lanes-layout small algebra ((n, m, L) values) -------------------------

def _mm(A, B):
    """(n, m, L) @ (m, k, L) -> (n, k, L).

    Index-then-newaxis (two steps): the combined `A[:, j, None, :]` form
    lowers as an unsupported >2D gather on Mosaic TC."""
    m = A.shape[1]
    acc = A[:, 0, :][:, None, :] * B[0, :, :][None, :, :]
    for j in range(1, m):
        acc = acc + A[:, j, :][:, None, :] * B[j, :, :][None, :, :]
    return acc


def _mtm(A, B):
    """(m, n, L)^T @ (m, k, L) -> (n, k, L)."""
    m = A.shape[0]
    acc = A[0, :, :][:, None, :] * B[0, :, :][None, :, :]
    for j in range(1, m):
        acc = acc + A[j, :, :][:, None, :] * B[j, :, :][None, :, :]
    return acc


def _mv(A, x):
    """(n, m, L) @ (m, L) -> (n, L)."""
    m = A.shape[1]
    acc = A[:, 0, :] * x[0][None, :]
    for j in range(1, m):
        acc = acc + A[:, j, :] * x[j][None, :]
    return acc


def _mtv(A, x):
    """(m, n, L)^T @ (m, L) -> (n, L)."""
    m = A.shape[0]
    acc = A[0, :, :] * x[0][None, :]
    for j in range(1, m):
        acc = acc + A[j, :, :] * x[j][None, :]
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
    """(L L^T) Y = M; M (n, m, L)."""
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
    return jnp.stack(zs)


def _skew(v):
    """(3, L) -> (3, 3, L)."""
    z = jnp.zeros_like(v[0])
    return jnp.stack([
        jnp.stack([z, -v[2], v[1]]),
        jnp.stack([v[2], z, -v[0]]),
        jnp.stack([-v[1], v[0], z])])


def _cross(a, b):
    """(3, L) x (3, L)."""
    return jnp.stack([a[1] * b[2] - a[2] * b[1],
                      a[2] * b[0] - a[0] * b[2],
                      a[0] * b[1] - a[1] * b[0]])


def _softplus(x):
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _make_kernel(H, iters, dt, s_f, rho_min, reg, state_reg):
    alphas = (1.0, 0.5, 0.25, 0.05, 0.0)
    sfF0 = s_f / F0

    def kernel(z0_ref, u0_ref, refzu_ref, refT_ref, fm_ref, rho0_ref,
               misc_ref, iwinv_ref, trackh_ref,
               u_out, z_out, c_out,
               Z_s, U_s, kff_s, K_s):
        dtype = jnp.float32
        z0 = z0_ref[...]                       # (24, L)
        L_lanes = z0.shape[-1]
        misc = misc_ref[...]                   # (8, L)
        c_fb, c_slip, c_cone, c_mask = misc[0], misc[1], misc[2], misc[3]
        mu, mass = misc[4], misc[5]
        inv_m = 1.0 / mass                     # (L,)
        rho0 = rho0_ref[0]                     # (L,)
        trackh = trackh_ref[...]               # (48, L)
        Iwi = iwinv_ref[...]                   # (3, 3, L)
        refT = refT_ref[...]                   # (24, L)

        row24 = jax.lax.broadcasted_iota(jnp.int32, (NZ, 1), 0)
        hT = jnp.where(row24 < 9, trackh[:NZ], 0.0).astype(dtype)
        ii = jax.lax.broadcasted_iota(jnp.int32, (NZ, NZ), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (NZ, NZ), 1)
        dmask = (ii == jj).astype(dtype)[:, :, None]
        eyeNU = dmask * reg

        def read_stage(ref, k):
            return ref[pl.ds(k, 1)][0]

        def dyn(z, uh):
            """One SRB+feet step, lanes layout (== ci_mpc._dyn_b)."""
            pos, v, om = z[0:3], z[6:9], z[9:12]
            fsum = jnp.zeros((3, L_lanes), dtype)
            tau = jnp.zeros((3, L_lanes), dtype)
            for i in range(4):
                fi = s_f * uh[3 * i:3 * i + 3]
                fsum = fsum + fi
                tau = tau + _cross(z[12 + 3 * i:15 + 3 * i] - pos, fi)
            gvec = jnp.where(row24[0:3] == 2, -9.81, 0.0).astype(dtype)
            acc = fsum * inv_m[None, :] + gvec
            return jnp.concatenate([
                pos + dt * v,
                z[3:6] + dt * om,
                v + dt * acc,
                om + dt * _mv(Iwi, tau),
                z[12:24] + dt * uh[12:24]])

        def stage_cost(z, uh, refzu, fm8, rho):
            """Exact flat-terrain stage cost (== ci_mpc.ci_stage_cost)."""
            zu = jnp.concatenate([z, uh])
            d = zu - refzu
            cost = 0.5 * jnp.sum(trackh * d * d, axis=0)
            for i in range(4):
                a = sfF0 * uh[3 * i + 2]
                b = z[14 + 3 * i] / G0
                s = jnp.sqrt(a * a + b * b + rho * rho)
                r1 = a + b - s
                spa = rho * _softplus(a / rho)
                w0, w1 = uh[12 + 3 * i], uh[13 + 3 * i]
                fx, fy, fz = (s_f * uh[3 * i], s_f * uh[3 * i + 1],
                              s_f * uh[3 * i + 2])
                t4 = (jnp.abs(fx) - mu * fz) / F0
                t5 = (jnp.abs(fy) - mu * fz) / F0
                sp4 = rho * _softplus(t4 / rho)
                sp5 = rho * _softplus(t5 / rho)
                r6 = (1.0 - fm8[i]) * a
                cost = (cost + c_fb * r1 * r1
                        + c_slip * spa * (w0 * w0 + w1 * w1)
                        + c_cone * (sp4 * sp4 + sp5 * sp5)
                        + c_mask * r6 * r6)
            return cost

        # ---- block-sparse S/T operators (stage-local closures) ----------

        def backward(rho):
            zH = read_stage(Z_s, H)
            Vx = hT * (zH - refT)
            Vxx = dmask * hT[:, None, :]

            def bstep(i, carry):
                Vx, Vxx = carry
                k = H - 1 - i
                zk = read_stage(Z_s, k)
                uk = read_stage(U_s, k)
                refzu = read_stage(refzu_ref, k)
                fm8 = read_stage(fm_ref, k)

                # stage-dependent S/T blocks
                pos = zk[0:3]
                fsum = jnp.zeros((3, L_lanes), dtype)
                Gs, Rs = [], []
                for i4 in range(4):
                    fi = s_f * uk[3 * i4:3 * i4 + 3]
                    fsum = fsum + fi
                    Gs.append(-_mm(Iwi, _skew(fi)))
                    ri = zk[12 + 3 * i4:15 + 3 * i4] - pos
                    Rs.append(s_f * _mm(Iwi, _skew(ri)))
                Pm = _mm(Iwi, _skew(fsum))

                def S_right(W):
                    """W @ S (W (n,24,L))."""
                    WO = W[:, 9:12, :]
                    return jnp.concatenate(
                        [_mm(WO, Pm), jnp.zeros_like(W[:, 0:3, :]),
                         W[:, 0:3, :], W[:, 3:6, :]]
                        + [_mm(WO, Gs[i4]) for i4 in range(4)], axis=1)

                def S_T_left(X):
                    """S^T @ X (X (24,k,L))."""
                    XO = X[9:12]
                    return jnp.concatenate(
                        [_mtm(Pm, XO), jnp.zeros_like(X[0:3]),
                         X[0:3], X[3:6]]
                        + [_mtm(Gs[i4], XO) for i4 in range(4)], axis=0)

                def T_T_left(X):
                    """T^T @ X (X (24,k,L))."""
                    XV, XO = X[6:9], X[9:12]
                    frows = [inv_m[None, None, :] * (s_f * XV)
                             + _mtm(Rs[i4], XO) for i4 in range(4)]
                    return jnp.concatenate(frows + [X[12:24]], axis=0)

                def S_T_vec(x):
                    xo = x[9:12]
                    return jnp.concatenate(
                        [_mtv(Pm, xo), jnp.zeros_like(x[0:3]),
                         x[0:3], x[3:6]]
                        + [_mtv(Gs[i4], xo) for i4 in range(4)], axis=0)

                def T_T_vec(x):
                    xv, xo = x[6:9], x[9:12]
                    frows = [inv_m[None, :] * (s_f * xv)
                             + _mtv(Rs[i4], xo) for i4 in range(4)]
                    return jnp.concatenate(frows + [x[12:24]], axis=0)

                def T_right(W):
                    WV, WO = W[:, 6:9, :], W[:, 9:12, :]
                    fcols = [inv_m[None, None, :] * (s_f * WV)
                             + _mm(WO, Rs[i4]) for i4 in range(4)]
                    return jnp.concatenate(fcols + [W[:, 12:24, :]],
                                           axis=1)

                # ---- flat-terrain Gauss-Newton quadratization ----------
                # assembled through python LISTS of lane vectors, stacked
                # once at the end: .at[...].add on VALUES lowers as
                # scatter-add, which Mosaic TC does not implement
                zu = jnp.concatenate([zk, uk])
                gbase = trackh * (zu - refzu)
                g_rows = [gbase[j] for j in range(NZ + NU)]
                hxx_rows = [trackh[j] for j in range(NZ)]
                huu_rows = [trackh[NZ + j] for j in range(NU)]
                # sparse entries gathered per foot
                e_pzfz, e_fxfz, e_fyfz = [], [], []
                e_fzwx, e_fzwy = [], []
                for i4 in range(4):
                    pz = zk[14 + 3 * i4]
                    fhx, fhy, fhz = (uk[3 * i4], uk[3 * i4 + 1],
                                     uk[3 * i4 + 2])
                    w0, w1 = uk[12 + 3 * i4], uk[13 + 3 * i4]
                    a = sfF0 * fhz
                    b = pz / G0
                    s = jnp.sqrt(a * a + b * b + rho * rho)
                    r1 = a + b - s
                    ca = 1.0 - a / s
                    cb = 1.0 - b / s
                    spa = rho * _softplus(a / rho)
                    sig = jax.nn.sigmoid(a / rho)
                    sq = jnp.sqrt(spa + 1e-12)
                    dsq = sig / (2.0 * sq)
                    r2, r3 = sq * w0, sq * w1
                    fx, fy, fz = s_f * fhx, s_f * fhy, s_f * fhz
                    t4 = (jnp.abs(fx) - mu * fz) / F0
                    t5 = (jnp.abs(fy) - mu * fz) / F0
                    r4 = rho * _softplus(t4 / rho)
                    r5 = rho * _softplus(t5 / rho)
                    sig4 = jax.nn.sigmoid(t4 / rho)
                    sig5 = jax.nn.sigmoid(t5 / rho)
                    sgn0 = jnp.sign(fx)
                    sgn1 = jnp.sign(fy)
                    fmi = fm8[i4]
                    r6c = 1.0 - fmi

                    # exact gradient adds
                    g_rows[14 + 3 * i4] = (g_rows[14 + 3 * i4]
                                           + 2.0 * c_fb * r1 * cb / G0)
                    g_rows[NZ + 3 * i4] = (
                        g_rows[NZ + 3 * i4]
                        + 2.0 * c_cone * r4 * sig4 * sgn0 * sfF0)
                    g_rows[NZ + 3 * i4 + 1] = (
                        g_rows[NZ + 3 * i4 + 1]
                        + 2.0 * c_cone * r5 * sig5 * sgn1 * sfF0)
                    g_rows[NZ + 3 * i4 + 2] = (
                        g_rows[NZ + 3 * i4 + 2]
                        + 2.0 * (c_fb * r1 * ca
                                 + c_slip * (r2 * w0 + r3 * w1) * dsq
                                 - c_cone * mu * (r4 * sig4 + r5 * sig5)
                                 + c_mask * (r6c * a) * r6c) * sfF0)
                    g_rows[NZ + 12 + 3 * i4] = (
                        g_rows[NZ + 12 + 3 * i4] + 2.0 * c_slip * r2 * sq)
                    g_rows[NZ + 12 + 3 * i4 + 1] = (
                        g_rows[NZ + 12 + 3 * i4 + 1]
                        + 2.0 * c_slip * r3 * sq)

                    # GGN + FB violation-side curvature
                    mcv = 2.0 * c_fb * jnp.minimum(r1, 0.0) / (s ** 3)
                    c_aa = mcv * (a * a - s * s)
                    c_bb = mcv * (b * b - s * s)
                    c_ab = mcv * (a * b)
                    hxx_rows[14 + 3 * i4] = (
                        hxx_rows[14 + 3 * i4]
                        + 2.0 * c_fb * cb * cb / (G0 * G0)
                        + c_bb / (G0 * G0))
                    e_pzfz.append(2.0 * c_fb * ca * cb * sfF0 / G0
                                  + c_ab * sfF0 / G0)
                    # sgn^2 factors matter: sign(0) = 0 kills the cone
                    # row's |f|-derivative at exactly-zero tangential
                    # force (every swing foot of the template), matching
                    # d|x|/dx = sign(x) in the XLA quadratization
                    huu_rows[3 * i4] = (
                        huu_rows[3 * i4]
                        + 2.0 * c_cone * sig4 * sig4 * sgn0 * sgn0
                        * sfF0 * sfF0)
                    huu_rows[3 * i4 + 1] = (
                        huu_rows[3 * i4 + 1]
                        + 2.0 * c_cone * sig5 * sig5 * sgn1 * sgn1
                        * sfF0 * sfF0)
                    huu_rows[3 * i4 + 2] = (
                        huu_rows[3 * i4 + 2]
                        + (2.0 * (c_fb * ca * ca
                                  + c_slip * dsq * dsq
                                  * (w0 * w0 + w1 * w1)
                                  + c_cone * mu * mu * (sig4 * sig4
                                                        + sig5 * sig5)
                                  + c_mask * r6c * r6c)
                           + c_aa) * sfF0 * sfF0)
                    huu_rows[12 + 3 * i4] = (huu_rows[12 + 3 * i4]
                                             + 2.0 * c_slip
                                             * (spa + 1e-12))
                    huu_rows[12 + 3 * i4 + 1] = (huu_rows[12 + 3 * i4 + 1]
                                                 + 2.0 * c_slip
                                                 * (spa + 1e-12))
                    e_fxfz.append(-2.0 * c_cone * sig4 * sig4 * sgn0 * mu
                                  * sfF0 * sfF0)
                    e_fyfz.append(-2.0 * c_cone * sig5 * sig5 * sgn1 * mu
                                  * sfF0 * sfF0)
                    e_fzwx.append(c_slip * sig * w0 * sfF0)
                    e_fzwy.append(c_slip * sig * w1 * sfF0)

                g48 = jnp.stack(g_rows)
                hxx = jnp.stack(hxx_rows)
                huu_d = jnp.stack(huu_rows)
                # Huu/Hux sparse entries as stacked (value, not scatter)
                # matrices — entry dicts keyed (row, col)
                zero_l = jnp.zeros_like(rho)
                quu_ent = {}
                qux_ent = {}
                for i4 in range(4):
                    quu_ent[(3 * i4 + 2, 12 + 3 * i4)] = e_fzwx[i4]
                    quu_ent[(12 + 3 * i4, 3 * i4 + 2)] = e_fzwx[i4]
                    quu_ent[(3 * i4 + 2, 13 + 3 * i4)] = e_fzwy[i4]
                    quu_ent[(13 + 3 * i4, 3 * i4 + 2)] = e_fzwy[i4]
                    quu_ent[(3 * i4, 3 * i4 + 2)] = e_fxfz[i4]
                    quu_ent[(3 * i4 + 2, 3 * i4)] = e_fxfz[i4]
                    quu_ent[(3 * i4 + 1, 3 * i4 + 2)] = e_fyfz[i4]
                    quu_ent[(3 * i4 + 2, 3 * i4 + 1)] = e_fyfz[i4]
                    qux_ent[(3 * i4 + 2, 14 + 3 * i4)] = e_pzfz[i4]
                Huu_sp = jnp.stack([
                    jnp.stack([quu_ent.get((r, c), zero_l)
                               for c in range(NU)]) for r in range(NU)])
                Hux_sp = jnp.stack([
                    jnp.stack([qux_ent.get((r, c), zero_l)
                               for c in range(NZ)]) for r in range(NU)])

                # ---- Q terms via block-sparse operators ----------------
                Y = S_right(Vxx)                        # Vxx @ S
                Qxx = (Vxx + dt * (jnp.swapaxes(Y, 0, 1) + Y)
                       + (dt * dt) * S_T_left(Y)
                       + dmask * hxx[:, None, :])
                WT = T_right(Vxx)
                Quu = ((dt * dt) * T_T_left(WT)
                       + dmask * huu_d[:, None, :] + Huu_sp)
                Qux = T_T_left(dt * Vxx + (dt * dt) * Y) + Hux_sp

                Qx = g48[:NZ] + Vx + dt * S_T_vec(Vx)
                Qu = g48[NZ:] + dt * T_T_vec(Vx)

                # Fu'Fu (for the Levenberg state-space reg) and Fu'Fz
                ffrows = []
                for i4 in range(4):
                    cols = [inv_m[None, None, :] * inv_m[None, None, :]
                            * (s_f * s_f) * dmask[0:3, 0:3]
                            + _mtm(Rs[i4], Rs[j4]) for j4 in range(4)]
                    ffrows.append(jnp.concatenate(cols, axis=1))
                ff = jnp.concatenate(ffrows, axis=0)     # (12,12,L)
                zero12 = jnp.zeros((12, 12, L_lanes), dtype)
                FuFu = (dt * dt) * jnp.concatenate([
                    jnp.concatenate([ff, zero12], axis=1),
                    jnp.concatenate([zero12,
                                     dmask[0:12, 0:12]
                                     * jnp.ones((1, 1, L_lanes), dtype)],
                                    axis=1)], axis=0)
                # Fu'Fz = dt T' + dt^2 T'S
                zero33 = jnp.zeros((3, 3, L_lanes), dtype)
                tfrows = []
                for i4 in range(4):
                    RtP = _mtm(Rs[i4], Pm)
                    RtG = [_mtm(Rs[i4], Gs[j4]) for j4 in range(4)]
                    row = jnp.concatenate(
                        [dt * dt * RtP, zero33,
                         dt * s_f * inv_m[None, None, :] * dmask[0:3, 0:3],
                         dt * jnp.swapaxes(Rs[i4], 0, 1)]
                        + [dt * dt * RtG[j4] for j4 in range(4)], axis=1)
                    tfrows.append(row)
                wrows = jnp.concatenate(
                    [jnp.zeros((12, 12, L_lanes), dtype),
                     dt * dmask[0:12, 0:12]
                     * jnp.ones((1, 1, L_lanes), dtype)], axis=1)
                FuFz = jnp.concatenate(tfrows + [wrows], axis=0)

                Quu_r = Quu + eyeNU + state_reg * FuFu
                Qux_r = Qux + state_reg * FuFz

                rhs = jnp.concatenate([Qu[:, None, :], Qux_r], axis=1)
                Lc = _chol(Quu_r)
                sol = _cho_solve(Lc, rhs)
                kff = -sol[:, 0, :]
                K = -sol[:, 1:, :]
                okk = jnp.where(
                    jnp.all(jnp.isfinite(sol), axis=(0, 1)), 1.0, 0.0)
                kff = kff * okk[None, :]
                K = K * okk[None, None, :]

                KtQ = _mtm(K, Quu)                      # (NX, NU, L)
                Vx2 = (Qx + _mv(KtQ, kff) + _mtv(K, Qu) + _mtv(Qux, kff))
                Pt = _mtm(K, Qux)
                Vxx2 = (Qxx + _mm(KtQ, K) + Pt + jnp.swapaxes(Pt, 0, 1))
                Vxx2 = 0.5 * (Vxx2 + jnp.swapaxes(Vxx2, 0, 1))
                okv = jnp.where(
                    jnp.all(jnp.isfinite(Vx2), axis=0)
                    & jnp.all(jnp.isfinite(Vxx2), axis=(0, 1)), 1.0, 0.0)
                Vx2 = Vx2 * okv[None, :] + Vx * (1.0 - okv[None, :])
                Vxx2 = (Vxx2 * okv[None, None, :]
                        + Vxx * (1.0 - okv[None, None, :]))
                kff_s[pl.ds(k, 1)] = kff[None]
                K_s[pl.ds(k, 1)] = K[None]
                return (Vx2, Vxx2)

            jax.lax.fori_loop(0, H, bstep, (Vx, Vxx))

        def forward_cost(alpha, rho, write):
            """Forward pass with feedback; returns total cost (L,).
            write=True also commits (U_s, Z_s) in place — zn is read
            before the stage slot is overwritten, and stage k+1's nominal
            is untouched until its own iteration."""

            def fstep(k, carry):
                z, cost = carry
                zn = read_stage(Z_s, k)
                un = read_stage(U_s, k)
                kf = read_stage(kff_s, k)
                Kk = read_stage(K_s, k)
                u = un + alpha * kf + _mv(Kk, z - zn)
                cost = cost + stage_cost(z, u, read_stage(refzu_ref, k),
                                         read_stage(fm_ref, k), rho)
                if write:
                    Z_s[pl.ds(k, 1)] = z[None]
                    U_s[pl.ds(k, 1)] = u[None]
                z = dyn(z, u)
                return (z, cost)

            z, cost = jax.lax.fori_loop(
                0, H, fstep, (z0, jnp.zeros((L_lanes,), dtype)))
            d = z - refT
            cost = cost + 0.5 * jnp.sum(hT * d * d, axis=0)
            if write:
                Z_s[pl.ds(H, 1)] = z[None]
            return cost

        # ---- initial rollout -------------------------------------------
        U_s[...] = u0_ref[...]

        def r0(k, z):
            Z_s[pl.ds(k, 1)] = z[None]
            return dyn(z, read_stage(U_s, k))

        zH0 = jax.lax.fori_loop(0, H, r0, z0)
        Z_s[pl.ds(H, 1)] = zH0[None]

        # ---- sweeps ----------------------------------------------------
        lr0 = jnp.log(rho0)
        lrm = jnp.log(jnp.asarray(rho_min, dtype))

        def sweep(it, cprev):
            frac = (it.astype(dtype) / (iters - 1.0)) if iters > 1 else 1.0
            rho = jnp.maximum(jnp.exp(lr0 + frac * (lrm - lr0)), rho_min)
            backward(rho)
            c_best = jnp.full((L_lanes,), jnp.inf, dtype)
            a_best = jnp.zeros((L_lanes,), dtype)
            for a in alphas:
                c = forward_cost(a, rho, write=False)
                c = jnp.where(jnp.isfinite(c), c, jnp.inf)
                better = c < c_best
                c_best = jnp.where(better, c, c_best)
                a_best = jnp.where(better, a, a_best)
            forward_cost(a_best[None, :], rho, write=True)
            return c_best

        c_fin = jax.lax.fori_loop(0, iters, sweep,
                                  jnp.full((L_lanes,), jnp.inf, dtype))
        u_out[...] = U_s[...]
        z_out[...] = Z_s[...]
        c_out[...] = c_fin[None]

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "iters", "dt", "s_f", "rho_min", "reg", "state_reg", "interpret"))
def ci_sweeps_fused(z0, Uh0, ref_zu, refT, f_mask, rho0, wts_vec, mu,
                    mass, Iw_inv, *, iters, dt, s_f, rho_min, reg,
                    state_reg, interpret=False):
    """One-launch CI GN-iLQR sweep loop (flat-zero terrain, wall=None).

    Args (batch-first; converted to lanes internally):
      z0 (B,24), Uh0 (B,H,24) SCALED inputs, ref_zu (B,H,48) scaled
      stage references, refT (B,24) terminal reference, f_mask (B,H,4),
      rho0 (B,), wts_vec (4,) = [c_fb, c_slip, c_cone, c_mask] +
      trackh via closure? — no: wts_vec is (4 + 48,) = penalty weights
      then the 48-dim tracking diagonal 2*q.
      mu, mass scalars; Iw_inv (B,3,3).

    Returns (Uh (B,H,24) scaled, Z (B,H+1,24), cost (B,))."""
    B, H = Uh0.shape[0], Uh0.shape[1]
    dtype = jnp.float32
    pad = (-B) % LANES
    Bp = B + pad

    def lanes(x, pad_value=0.0):
        perm = tuple(range(1, x.ndim)) + (0,)
        xt = jnp.transpose(x.astype(dtype), perm)
        if pad:
            xt = jnp.pad(xt, [(0, 0)] * (xt.ndim - 1) + [(0, pad)],
                         constant_values=pad_value)
        return xt

    z0_t = lanes(z0)
    u0_t = lanes(Uh0)
    refzu_t = lanes(ref_zu)
    refT_t = lanes(refT)
    fm8 = jnp.concatenate([f_mask, jnp.ones((B, H, 4), dtype)], axis=-1)
    fm_t = lanes(fm8, pad_value=1.0)
    rho0_t = lanes(jnp.broadcast_to(rho0, (B,))[:, None], pad_value=0.5)
    misc = jnp.stack([
        jnp.broadcast_to(wts_vec[0], (B,)),
        jnp.broadcast_to(wts_vec[1], (B,)),
        jnp.broadcast_to(wts_vec[2], (B,)),
        jnp.broadcast_to(wts_vec[3], (B,)),
        jnp.broadcast_to(jnp.asarray(mu, dtype), (B,)),
        jnp.broadcast_to(jnp.asarray(mass, dtype), (B,)),
        jnp.zeros((B,), dtype), jnp.zeros((B,), dtype)], axis=1)
    misc_t = lanes(misc, pad_value=1.0)
    iwinv_t = lanes(Iw_inv)
    trackh_t = lanes(jnp.broadcast_to(wts_vec[4:], (B, 48)))

    kernel = _make_kernel(H, int(iters), float(dt), float(s_f),
                          float(rho_min), float(reg), float(state_reg))
    grid = (Bp // LANES,)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape[:-1] + (LANES,),
                            lambda b, _nd=nd: (0,) * (_nd - 1) + (b,),
                            memory_space=pltpu.VMEM)

    u, Z, cost = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((H, NU, Bp), dtype),
                   jax.ShapeDtypeStruct((H + 1, NZ, Bp), dtype),
                   jax.ShapeDtypeStruct((1, Bp), dtype)],
        grid=grid,
        in_specs=[
            spec((NZ, Bp)),
            spec((H, NU, Bp)),
            spec((H, 48, Bp)),
            spec((NZ, Bp)),
            spec((H, 8, Bp)),
            spec((1, Bp)),
            spec((8, Bp)),
            spec((3, 3, Bp)),
            spec((48, Bp)),
        ],
        out_specs=[spec((H, NU, Bp)), spec((H + 1, NZ, Bp)),
                   spec((1, Bp))],
        scratch_shapes=[
            pltpu.VMEM((H + 1, NZ, LANES), dtype),      # Z_s
            pltpu.VMEM((H, NU, LANES), dtype),          # U_s
            pltpu.VMEM((H, NU, LANES), dtype),          # kff cache
            pltpu.VMEM((H, NU, NZ, LANES), dtype),      # K cache
        ],
        interpret=interpret,
    )(z0_t, u0_t, refzu_t, refT_t, fm_t, rho0_t, misc_t, iwinv_t,
      trackh_t)

    u = u[..., :B].transpose(2, 0, 1)
    Z = Z[..., :B].transpose(2, 0, 1)
    return u, Z, cost[0, :B]
