"""Riccati-structured batched interior-point MPC solver (long horizons).

The condensed dense formulation (qp_builder.py + pdip.py) factorizes a
(12H x 12H) Newton matrix per iteration — O((12H)^3) flops and an
(n, n, 128) VMEM-resident tile that stops fitting on-chip past H ~ 16
(ops/chol_pallas.py). This module solves the SAME QP without ever
condensing: the stagewise (sparse) form

    min  sum_k 1/2 (x_{k+1} - xref_k)^T Q (x_{k+1} - xref_k)
              + 1/2 u_k^T R u_k
    s.t. x_{k+1} = A_k x_k + B_k u_k + d          (gravity affine,
                                                   reference:
                                                   ConvexQPSolver.cpp:174-177)
         G(mu) u_k <= h_k                          (friction pyramid + fz box,
                                                   reference: :130-177)

is attacked with the same Mehrotra predictor-corrector as pdip.py, but each
Newton system — (P + G^T D G + reg) du = rhs in condensed coordinates — is
solved by a time-varying LQR Riccati sweep: O(H * 12^3) work, H small
(12x12) factorizations, block-banded structure exploited exactly
(Rao-Wright-Rawlings efficient-IPM structure; SURVEY §7 "hard parts").
The dual residual is evaluated stagewise via a forward rollout + backward
adjoint, so the dense P / S matrices are never materialized at any horizon.

All stage algebra is batch-leading (B, 12, 12) einsums; the tiny
factorizations use the fully-unrolled Cholesky (ops/small_chol.py) — no XLA
library custom-calls anywhere on the hot path. Produces iterates identical
(up to roundoff) to pdip.solve_qp_pdip_batched on the condensed QP.
"""

from functools import partial as _partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from legged_mpc_control_tpu.constants import GRAVITY
from legged_mpc_control_tpu.mpc.pdip import (
    N_CON_PER_LEG,
    PdipResult,
    _bmu,
    _g_apply,
    _gt_apply,
    _gtdg_blocks,
    _h_vec,
)
from legged_mpc_control_tpu.ops import small_chol as sc

_einsum = _partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def _bc12(w):
    """(B,12) diag -> broadcastable against (B,12,12) rows."""
    return w[..., None]


def solve_qp_riccati_batched(x0, x_ref, A_seq, Bmat, contact, q_weights,
                             r_weights, mu, fz_max, dt, *, iters=18,
                             tol=None):
    """Batched stagewise interior-point solve. No condensation.

    Args:
      x0: (B, 12) current states.
      x_ref: (B, H, 12) reference states (x_{k+1} tracks x_ref[:, k]).
      A_seq: (B, H, 12, 12) discrete A per step.
      Bmat: (B, 12, 12) discrete B (shared across steps, like the
        reference ConvexQPSolver.cpp:280-283).
      contact: (B, H, 4) contact schedule in {0., 1.} — swing legs' B
        columns are masked (same optimum as the reference's fz in [0,0]
        boxes, see qp_builder.py docstring).
      q_weights / r_weights: (12,) or (B, 12) diagonal costs.
      mu, fz_max: scalar or (B,).
      dt: MPC step (gravity affine term).

    Returns PdipResult with u flattened to (B, 12H) like the condensed path.
    """
    B, H, nx = x_ref.shape
    dtype = x_ref.dtype
    m = H * 4 * N_CON_PER_LEG
    if tol is None:
        tol = 1e-11 if dtype == jnp.float64 else 1e-6
    d_max = 1e14 if dtype == jnp.float64 else 1e6
    reg = 1e-11 if dtype == jnp.float64 else 1e-6
    eps = jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-20, dtype)

    qw = jnp.broadcast_to(jnp.asarray(q_weights, dtype), (B, 12))
    rw = jnp.broadcast_to(jnp.asarray(r_weights, dtype), (B, 12))

    legmask = jnp.repeat(contact, 3, axis=-1)              # (B,H,12)
    B_seq = Bmat[:, None] * legmask[:, :, None, :]         # (B,H,12,12)
    d_aff = jnp.zeros((12,), dtype).at[11].set(-GRAVITY * dt)

    h = jnp.broadcast_to(_h_vec(H, fz_max, dtype), (B, H, 4, 6))

    # stage-major views for scans
    A_t = jnp.swapaxes(A_seq, 0, 1)                        # (H,B,12,12)
    B_t = jnp.swapaxes(B_seq, 0, 1)

    def Gdot(u):                                           # u (B,H,12)
        return _g_apply(u.reshape(B, H, 4, 3), mu)

    def GTdot(w):                                          # (B,H,4,6)
        return _gt_apply(w, mu).reshape(B, H, 12)

    def rollout(u):
        """x_1..x_H from x0 under the stage dynamics. (B,H,12)."""
        u_t = jnp.swapaxes(u, 0, 1)                        # (H,B,12)

        def step(x, inp):
            Ak, Bk, uk = inp
            xn = (_einsum("bij,bj->bi", Ak, x)
                  + _einsum("bij,bj->bi", Bk, uk) + d_aff)
            return xn, xn

        _, X = jax.lax.scan(step, x0, (A_t, B_t, u_t))
        return jnp.swapaxes(X, 0, 1)

    def adjoint(qx):
        """psi_k = qx_k + A_{k+1}^T psi_{k+1}; returns (B,H,12).
        qx: (B,H,12) gradients at x_{k+1}."""
        qx_t = jnp.swapaxes(qx, 0, 1)

        def step(p, inp):
            Ak1, qk = inp                # A_{k+1} paired with stage k
            pk = qk + _einsum("bji,bj->bi", Ak1, p)
            return pk, pk

        # stage k uses A_{k+1}; pad the last with zeros
        A_next = jnp.concatenate(
            [A_t[1:], jnp.zeros_like(A_t[:1])], axis=0)
        _, psi = jax.lax.scan(step, jnp.zeros((B, 12), dtype),
                              (A_next[::-1], qx_t[::-1]))
        return jnp.swapaxes(psi[::-1], 0, 1)

    def factor(Hu_t):
        """Riccati factor sweep. Hu_t: (H,B,12,12) input Hessians.
        Returns per-stage caches (L, K, Hux) stage-major."""

        def step(Pn, inp):
            Ak, Bk, Huk = inp
            # W = Q + P'_{k+1}: fold the state cost at x_{k+1}
            W = Pn.at[..., jnp.arange(12), jnp.arange(12)].add(qw)
            BW = _einsum("bji,bjk->bik", Bk, W)            # B^T W
            Huu = Huk + _einsum("bik,bkj->bij", BW, Bk)
            Hux = _einsum("bik,bkj->bij", BW, Ak)
            L = sc.chol_small(Huu)
            K = -sc.cho_solve_small(L, Hux)                # (B,12,12)
            AW = _einsum("bji,bjk->bik", Ak, W)
            Pk = (_einsum("bik,bkj->bij", AW, Ak)
                  + _einsum("bki,bkj->bij", Hux, K))
            Pk = 0.5 * (Pk + jnp.swapaxes(Pk, -1, -2))
            return Pk, (L, K, Hux)

        P0 = jnp.zeros((B, 12, 12), dtype)
        _, caches = jax.lax.scan(step, P0,
                                 (A_t[::-1], B_t[::-1], Hu_t[::-1]))
        return jax.tree.map(lambda c: c[::-1], caches)

    def lqr_solve(caches, g):
        """du = -K^{-1} g via one backward + one forward linear sweep.
        g: (B,H,12). Returns (B,H,12)."""
        L_t, K_t, Hux_t = caches
        g_t = jnp.swapaxes(g, 0, 1)

        def back(p, inp):
            Ak, Bk, Lk, Huxk, gk = inp
            gtot = gk + _einsum("bji,bj->bi", Bk, p)
            kff = -sc.cho_solve_small(Lk, gtot[..., None])[..., 0]
            pk = (_einsum("bji,bj->bi", Ak, p)
                  + _einsum("bki,bk->bi", Huxk, kff))
            return pk, kff

        _, kff_t = jax.lax.scan(
            back, jnp.zeros((B, 12), dtype),
            (A_t[::-1], B_t[::-1], L_t[::-1], Hux_t[::-1], g_t[::-1]))
        kff_t = kff_t[::-1]

        def fwd(dx, inp):
            Ak, Bk, Kk, kffk = inp
            du = kffk + _einsum("bij,bj->bi", Kk, dx)
            dxn = (_einsum("bij,bj->bi", Ak, dx)
                   + _einsum("bij,bj->bi", Bk, du))
            return dxn, du

        _, du_t = jax.lax.scan(fwd, jnp.zeros((B, 12), dtype),
                               (A_t, B_t, K_t, kff_t))
        return jnp.swapaxes(du_t, 0, 1)

    # --- initialization (mirrors pdip.py) ---
    u = jnp.zeros((B, H, 12), dtype=dtype)
    s = jnp.maximum(h - Gdot(u), 1.0)
    lam = jnp.ones_like(s)
    eye12 = jnp.eye(12, dtype=dtype)

    def body(carry, _):
        u, s, lam, done = carry
        X = rollout(u)                                     # (B,H,12)
        qx = qw[:, None, :] * (X - x_ref)                  # (B,H,12)
        psi = adjoint(qx)
        r_dual = (u * rw[:, None, :] + GTdot(lam)
                  + _einsum("bhji,bhj->bhi", B_seq, psi))  # B^T psi
        r_prim = Gdot(u) + s - h
        mu_gap = jnp.sum(s * lam, axis=(1, 2, 3)) / m

        dscale = jnp.clip(lam / jnp.maximum(s, eps), 0.0, d_max)
        blocks = _gtdg_blocks(dscale, mu)                  # (B,H,4,3,3)
        # Hu_k = diag(r) + blockdiag(G^T D G) + reg I, (B,H,12,12)
        Hu = jnp.zeros((B, H, 12, 12), dtype)
        Hu = Hu.at[..., jnp.arange(12), jnp.arange(12)].set(
            rw[:, None, :] + reg)
        for leg in range(4):
            sl = slice(3 * leg, 3 * leg + 3)
            Hu = Hu.at[..., sl, sl].add(blocks[:, :, leg])
        caches = factor(jnp.swapaxes(Hu, 0, 1))

        def solve_dir(rc):
            w = (lam * r_prim - rc) / jnp.maximum(s, eps)
            du = lqr_solve(caches, r_dual + GTdot(w))
            ds = -(r_prim + Gdot(du))
            dlam = -(rc + lam * ds) / jnp.maximum(s, eps)
            return du, ds, dlam

        du_a, ds_a, dl_a = solve_dir(lam * s)

        def max_step(v, dv):
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0),
                              jnp.inf)
            return jnp.minimum(1.0, jnp.min(ratio.reshape(B, -1), axis=-1))

        def bc(x):
            return x[:, None, None, None]

        a_p = max_step(s, ds_a)
        a_d = max_step(lam, dl_a)
        mu_aff = jnp.sum((s + bc(a_p) * ds_a) * (lam + bc(a_d) * dl_a),
                         axis=(1, 2, 3)) / m
        sigma = jnp.clip((mu_aff / jnp.maximum(mu_gap, eps)) ** 3,
                         1e-4, 0.9)
        corr = jnp.clip(ds_a * dl_a, -10.0 * bc(mu_gap), 10.0 * bc(mu_gap))
        rc = lam * s + corr - bc(sigma) * bc(mu_gap)
        du, ds, dlam = solve_dir(rc)

        a_p = 0.99 * max_step(s, ds)
        a_d = 0.99 * max_step(lam, dlam)

        conv = (mu_gap < tol) & (
            jnp.max(jnp.abs(r_prim.reshape(B, -1)), axis=-1) < 1e3 * tol)
        bad = ~(jnp.all(jnp.isfinite(du.reshape(B, -1)), axis=-1)
                & jnp.all(jnp.isfinite(ds.reshape(B, -1)), axis=-1)
                & jnp.all(jnp.isfinite(dlam.reshape(B, -1)), axis=-1))
        done = done | conv | bad
        dn = done[:, None, None]
        dn4 = bc(done)
        u2 = jnp.where(dn, u, u + a_p[:, None, None] * du)
        s2 = jnp.where(dn4, s, s + bc(a_p) * ds)
        lam2 = jnp.where(dn4, lam, lam + bc(a_d) * dlam)
        return (u2, s2, lam2, done), None

    done0 = jnp.zeros((B,), dtype=bool)
    (u, s, lam, done), _ = jax.lax.scan(
        body, (u, s, lam, done0), None, length=iters)

    # exact swing-leg zeroing (see pdip.py)
    u = u * legmask
    gap = jnp.sum(s * lam, axis=(1, 2, 3)) / m
    X = rollout(u)
    psi = adjoint(qw[:, None, :] * (X - x_ref))
    r_dual = jnp.max(jnp.abs(
        u * rw[:, None, :] + GTdot(lam)
        + _einsum("bhji,bhj->bhi", B_seq, psi)).reshape(B, -1), axis=-1)
    return PdipResult(u=u.reshape(B, H * 12), gap=gap, r_dual=r_dual,
                      iters=jnp.asarray(iters))
