"""Contact-implicit MPC: trajectory optimization THROUGH contact.

The reference's second MPC backend (reference:
src/legged_ctrl/src/mpc_ctrl/ci_mpc/LciMpc.cpp:8-24 bridging to
ContactImplicitMPC.jl; capability claim README.md:14 — Go1 trot,
box-step, wall-lean) optimizes body AND foot trajectories without a
pre-committed contact schedule: contact forces and make/break timing come
out of complementarity conditions against the terrain, so stepping ONTO a
box emerges from the geometry instead of from a hand-fed gait table.

This module is the framework's own tpu-native engine for that slot
(the Julia engine is an empty submodule in the reference snapshot):

  * model — single rigid body + 4 point feet:
      state  z in R^24 = [pos(3), eul(3), v(3), omega(3), feet_world(12)]
      input  u in R^24 = [grf(12) world, foot_vel(12) world]
    body integrates SRB dynamics under the GRFs applied at the feet; feet
    are velocity-controlled (the standard simplified contact-implicit
    model: the WBC/leg-PD tracks whatever foot motion the optimizer asks
    for, exactly how the LciMpc seam consumes the result).
  * contact via RELAXED/SMOOTHED COMPLEMENTARITY penalties, annealed like
    a central path (rho shrinks with iteration — the same relaxation
    ContactImplicitMPC.jl's interior-point applies to its NCP):
      - smoothed Fischer-Burmeister residual on (fz, gap):
          FB(a, b; rho) = a + b - sqrt(a^2 + b^2 + rho^2),  penalize FB^2
        (zero iff fz >= 0, gap >= 0, fz*gap ~ rho^2/2 — one residual
        covers force-at-distance, penetration, and negative normal force,
        and unlike softplus products it vanishes EXACTLY at legitimate
        contact, so stance forces are not biased)
      - slip:               fz * |w_xy|^2         -> 0  (stick while loaded)
      - friction pyramid:   sp_rho(|f_t| - mu fz)^2 -> 0
    with forces in units of f0=50 N and gaps in units of g0=2 cm so the
    residual is O(1), where gap(foot) = foot_z - terrain_height(foot_xy)
    over the SAME height field the simulator stands on — the optimizer
    literally sees the box.
  * solver — Gauss-Newton iLQR: AD stage derivatives (jacfwd dynamics,
    hessian cost), Riccati-style backward scan, parallel-alpha forward
    line search. Fixed iteration count, no data-dependent control flow:
    one XLA compilation, batchable with vmap (stage Hessians are 48x48 —
    MXU-friendly dense blocks).

API: `ci_solve` (the optimizer), `make_ci_reference` (trot-template
reference the tracker pulls toward — the reference system likewise tracks
a template trajectory; complementarity, not the template, decides the
actual contact), `make_ci_walk_policy` (the `(x40, t) -> (78,)` policy
that plugs into the LciMpc seam, mpc/lci_mpc.py).
"""

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from legged_mpc_control_tpu.sim import terrain as terrain_mod

NZ = 24
NU = 24
GRAV = 9.81


class CiWeights(NamedTuple):
    """Cost weights. Complementarity weights are the penalty strengths the
    rho-anneal tightens against."""
    q_pos: Any
    q_eul: Any
    q_vel: Any
    q_omega: Any
    q_foot: Any          # foot-position template tracking (weak)
    r_f: Any             # GRF regularization
    r_w: Any             # foot-velocity regularization
    c_fb: Any            # Fischer-Burmeister complementarity residual
    c_slip: Any          # tangential foot velocity while loaded
    c_cone: Any          # friction pyramid
    c_mask: Any          # force on mask-forbidden feet (stage-0 reality)


# complementarity scaling: forces in f0 N, gaps in g0 m (O(1) residuals)
F0 = 50.0
G0 = 0.02


def default_weights(dtype=jnp.float32) -> CiWeights:
    a = lambda v: jnp.asarray(v, dtype)
    return CiWeights(
        q_pos=a([30.0, 30.0, 120.0]),
        q_eul=a([60.0, 60.0, 30.0]),
        q_vel=a([20.0, 20.0, 30.0]),
        q_omega=a([1.0, 1.0, 1.0]),
        q_foot=a([18.0, 18.0, 60.0]),
        r_f=a(1e-3),
        r_w=a(5e-2),
        c_fb=a(40.0),
        c_slip=a(8.0),
        c_cone=a(10.0),
        c_mask=a(60.0),
    )


def _sp(x, rho):
    """Smoothed relu: rho * softplus(x / rho) -> max(x, 0) as rho -> 0."""
    return rho * jax.nn.softplus(x / rho)


def _fb(a, b, rho):
    """Smoothed Fischer-Burmeister: zero iff a >= 0, b >= 0 and
    a*b ~ rho^2/2; negative when either is negative. Smooth everywhere."""
    return a + b - jnp.sqrt(a * a + b * b + rho * rho)


def env_gap_normal(terrain, wall, p, beta=0.03):
    """Smooth gap function and contact normal of the whole environment —
    the ground height field plus an optional vertical wall
    (sim.terrain.Wall) — at points p (..., 3).

    The two half-space gaps are blended by a sigmoid softmin of width
    `beta` so gap and normal are smooth in p everywhere, including at the
    ground/wall corner: near the wall the contact normal rotates from +z
    to the wall normal, which is what lets one foot-force vector carry
    BOTH the ground complementarity and the wall complementarity without
    double-counting (the closer surface owns the contact)."""
    gap_g = p[..., 2] - terrain_mod.height_at(terrain, p[..., 0:2])
    up = jnp.array([0.0, 0.0, 1.0], p.dtype)
    if wall is None:
        return gap_g, jnp.broadcast_to(up, p.shape)
    gap_w = terrain_mod.wall_gap(wall, p)
    w_wall = jax.nn.sigmoid((gap_g - gap_w) / beta)    # ~1 where wall closer
    gap = w_wall * gap_w + (1.0 - w_wall) * gap_g
    n = (w_wall[..., None] * wall.normal.astype(p.dtype)
         + (1.0 - w_wall[..., None]) * up)
    n = n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    return gap, n


def ci_dynamics(z, u, mass, inertia_w_inv, dt):
    """One smooth SRB+feet step. inertia_w_inv: (3,3) world-frame inverse
    trunk inertia (fixed at the current yaw — the same time-invariant
    linearization the convex path uses, mpc/reference.py)."""
    dtype = z.dtype
    pos, eul, v, om = z[0:3], z[3:6], z[6:9], z[9:12]
    feet = z[12:24].reshape(4, 3)
    f = u[0:12].reshape(4, 3)
    w = u[12:24].reshape(4, 3)

    f_tot = jnp.sum(f, axis=0)
    acc = f_tot / mass + jnp.array([0.0, 0.0, -GRAV], dtype)
    tau = jnp.sum(jnp.cross(feet - pos[None, :], f), axis=0)

    pos2 = pos + dt * v
    eul2 = eul + dt * om            # small-angle euler rates (convex path)
    v2 = v + dt * acc
    om2 = om + dt * (inertia_w_inv @ tau)
    feet2 = feet + dt * w
    return jnp.concatenate([pos2, eul2, v2, om2, feet2.reshape(-1)])


def ci_stage_cost(z, u, ref_z, ref_u, terrain, wts: CiWeights, mu, rho,
                  f_mask=None, wall=None):
    """Tracking + relaxed complementarity. All terms smooth in (z, u).

    f_mask: optional (4,) in [0,1]; feet with mask 0 are penalized for
    carrying normal force at this stage — how the policy tells the solver
    which feet have physically registered contact RIGHT NOW (stage 0), so
    the plan redistributes support instead of counting on a foot the
    executor will gate out (the condensed distilled policy encodes the
    same fact as sched[0] = measured support, mpc/lci_mpc.py)."""
    pos, eul, v, om = z[0:3], z[3:6], z[6:9], z[9:12]
    feet = z[12:24].reshape(4, 3)
    f = u[0:12].reshape(4, 3)
    w = u[12:24].reshape(4, 3)
    fz = f[:, 2]

    track = (jnp.sum(wts.q_pos * (pos - ref_z[0:3]) ** 2)
             + jnp.sum(wts.q_eul * (eul - ref_z[3:6]) ** 2)
             + jnp.sum(wts.q_vel * (v - ref_z[6:9]) ** 2)
             + jnp.sum(wts.q_omega * (om - ref_z[9:12]) ** 2)
             + jnp.sum(wts.q_foot[None, :]
                       * (feet - ref_z[12:24].reshape(4, 3)) ** 2)
             + wts.r_f * jnp.sum((u[0:12] - ref_u[0:12]) ** 2)
             + wts.r_w * jnp.sum((u[12:24] - ref_u[12:24]) ** 2))

    if wall is None:
        # flat-normal fast path (byte-identical to the pre-wall model)
        gap = feet[:, 2] - terrain_mod.height_at(terrain, feet[:, 0:2])
        a = fz / F0                              # scaled normal force
        b = gap / G0                             # scaled gap
        comp = (wts.c_fb * jnp.sum(_fb(a, b, rho) ** 2)
                + wts.c_slip * jnp.sum(_sp(a, rho)[:, None]
                                       * w[:, 0:2] ** 2)
                + wts.c_cone * jnp.sum(
                    _sp((jnp.abs(f[:, 0]) - mu * fz) / F0, rho) ** 2
                    + _sp((jnp.abs(f[:, 1]) - mu * fz) / F0, rho) ** 2))
    else:
        # generalized contact: normal/tangent decomposition against the
        # blended environment normal (ground OR wall, whichever is closer).
        # NOTE the friction geometry deliberately switches form here: the
        # flat branch uses the per-axis PYRAMID (matching the convex MPC,
        # reference: ConvexQPSolver.cpp:130-158) but per-axis bounds are
        # meaningless against a rotated normal, so the wall branch uses
        # the circular CONE on |f_t|. The cone is the pyramid's inscribed
        # (conservative) set — a wall=None and wall=far-away solve can
        # therefore differ slightly in the corner-loaded regime.
        gap, n = env_gap_normal(terrain, wall, feet)       # (4,), (4,3)
        fn = jnp.sum(f * n, axis=-1)
        ft = f - fn[:, None] * n
        wt = w - jnp.sum(w * n, axis=-1, keepdims=True) * n
        a = fn / F0
        b = gap / G0
        ft_mag = jnp.sqrt(jnp.sum(ft * ft, axis=-1) + 1e-8)
        comp = (wts.c_fb * jnp.sum(_fb(a, b, rho) ** 2)
                + wts.c_slip * jnp.sum(_sp(a, rho)[:, None] * wt ** 2)
                + wts.c_cone * jnp.sum(
                    _sp((ft_mag - mu * fn) / F0, rho) ** 2))
    if f_mask is not None:
        comp = comp + wts.c_mask * jnp.sum(((1.0 - f_mask) * a) ** 2)
    return track + comp


def _rollout(z0, U, mass, inertia_w_inv, dt):
    def step(z, u):
        z2 = ci_dynamics(z, u, mass, inertia_w_inv, dt)
        return z2, z2
    _, Z1 = jax.lax.scan(step, z0, U)
    return jnp.concatenate([z0[None], Z1], axis=0)        # (H+1, NZ)


def _total_cost(z0, U, refs_z, refs_u, terrain, wts, mu, rho, mass,
                inertia_w_inv, dt, f_mask=None, wall=None):
    Z = _rollout(z0, U, mass, inertia_w_inv, dt)
    if f_mask is None:
        f_mask = jnp.ones((U.shape[0], 4), U.dtype)
    stage = jax.vmap(
        lambda z, u, rz, ru, fm: ci_stage_cost(z, u, rz, ru, terrain, wts,
                                               mu, rho, fm, wall)
    )(Z[:-1], U, refs_z[:-1], refs_u, f_mask)
    # terminal: body+foot tracking only
    zT, rT = Z[-1], refs_z[-1]
    term = (jnp.sum(wts.q_pos * (zT[0:3] - rT[0:3]) ** 2)
            + jnp.sum(wts.q_eul * (zT[3:6] - rT[3:6]) ** 2)
            + jnp.sum(wts.q_vel * (zT[6:9] - rT[6:9]) ** 2))
    return jnp.sum(stage) + term


@partial(jax.jit, static_argnames=("iters", "dt"))
def ci_solve(z0, U0, refs_z, refs_u, terrain, mass, inertia_w,
             mu, wts: CiWeights = None, f_mask=None, *, iters=16, dt=0.02,
             rho0=0.5, rho_min=0.05, reg=1e-2, state_reg=1e-1,
             f_scale=F0, wall=None):
    """Gauss-Newton iLQR with an annealed complementarity relaxation.

    Args:
      z0: (NZ,) current state. U0: (H, NU) input warm start.
      refs_z: (H+1, NZ) template references, refs_u: (H, NU).
      terrain: sim.terrain.Terrain (the gap function's height field).
      mass, inertia_w: SRB params (inertia world-frame at current yaw).
      iters: fixed sweep count (anneal rho0 -> rho_min geometrically).

    Conditioning (f32 / TPU): force channels are optimized in units of
    `f_scale` N so every control is O(1), and the gain solve uses
    state-space (Levenberg) regularization Quu + mu_x Fu'Fu — without
    both, the Riccati backward pass explodes through the strong
    feet->torque->attitude coupling and the tiny r_f curvature.

    Returns (U (H,NU), Z (H+1,NZ), cost) at the tightest relaxation.
    Batch with vmap over (z0, U0, refs_*, terrain leaves).
    """
    if wts is None:
        wts = default_weights(z0.dtype)
    dtype = z0.dtype
    H = U0.shape[0]
    if f_mask is None:
        f_mask = jnp.ones((H, 4), dtype)
    inertia_w_inv = jnp.linalg.inv(inertia_w)
    alphas = jnp.array([1.0, 0.5, 0.25, 0.05], dtype)
    s_u = jnp.concatenate([jnp.full((12,), f_scale, dtype),
                           jnp.ones((12,), dtype)])        # u = s_u * uh

    dyn = lambda z, uh: ci_dynamics(z, s_u * uh, mass, inertia_w_inv, dt)
    Fz_fn = jax.vmap(jax.jacfwd(dyn, argnums=0))
    Fu_fn = jax.vmap(jax.jacfwd(dyn, argnums=1))

    def stage_c(z, uh, rz, ru, fm, rho):
        return ci_stage_cost(z, s_u * uh, rz, ru, terrain, wts, mu, rho,
                             fm, wall)

    def total_c(z0_, Uh, rho):
        return _total_cost(z0_, s_u[None, :] * Uh, refs_z, refs_u,
                           terrain, wts, mu, rho, mass, inertia_w_inv, dt,
                           f_mask, wall)

    # The stage Hessian is EXACTLY block-diagonal in (body | feet+inputs):
    # the body dims (pos, eul, v, omega — zu[:12]) appear only in their
    # diagonal tracking quadratics, while every complementarity/friction
    # term reads feet positions, forces, and foot velocities (zu[12:]).
    # So the 48x48 jax.hessian collapses to a 36-dim one plus an analytic
    # diagonal — same matrix, ~(48/36)^2 less AD work (the dominant cost
    # of a sweep).
    n_body = 12
    body_hdiag = 2.0 * jnp.concatenate(
        [wts.q_pos, wts.q_eul, wts.q_vel, wts.q_omega])

    def quadratize(Z, Uh, rho):
        zu = jnp.concatenate([Z[:-1], Uh], axis=1)         # (H, NZ+NU)

        def one(zu_k, rz, ru, fm):
            c = lambda p: stage_c(p[:NZ], p[NZ:], rz, ru, fm, rho)
            g = jax.grad(c)(zu_k)
            c_rest = lambda r: c(jnp.concatenate([zu_k[:n_body], r]))
            Hr = jax.hessian(c_rest)(zu_k[n_body:])
            Hr = 0.5 * (Hr + Hr.T)
            Hm = jnp.zeros((NZ + NU, NZ + NU), dtype)
            Hm = Hm.at[:n_body, :n_body].set(jnp.diag(body_hdiag))
            Hm = Hm.at[n_body:, n_body:].set(Hr)
            return g, Hm
        g, Hm = jax.vmap(one)(zu, refs_z[:-1], refs_u, f_mask)
        return g, Hm

    def term_grad_hess(zT):
        def c(z):
            return (jnp.sum(wts.q_pos * (z[0:3] - refs_z[-1, 0:3]) ** 2)
                    + jnp.sum(wts.q_eul * (z[3:6] - refs_z[-1, 3:6]) ** 2)
                    + jnp.sum(wts.q_vel * (z[6:9] - refs_z[-1, 6:9]) ** 2))
        return jax.grad(c)(zT), jax.hessian(c)(zT)

    eyeU = jnp.eye(NU, dtype=dtype)

    def backward(Z, Uh, rho):
        Fz = Fz_fn(Z[:-1], Uh)                             # (H,NZ,NZ)
        Fu = Fu_fn(Z[:-1], Uh)                             # (H,NZ,NU)
        g, Hm = quadratize(Z, Uh, rho)
        Vx, Vxx = term_grad_hess(Z[-1])

        def bstep(carry, inp):
            Vx, Vxx = carry
            fz, fu, gk, hk = inp
            Qx = gk[:NZ] + fz.T @ Vx
            Qu = gk[NZ:] + fu.T @ Vx
            Qxx = hk[:NZ, :NZ] + fz.T @ Vxx @ fz
            Quu = hk[NZ:, NZ:] + fu.T @ Vxx @ fu
            Qux = hk[NZ:, :NZ] + fu.T @ Vxx @ fz
            # Levenberg state-space regularization (Tassa'12): gains from
            # the mu_x-damped system; value update keeps the canonical
            # (unregularized) form. Tames the feet->attitude coupling.
            Quu_r = Quu + reg * eyeU + state_reg * (fu.T @ fu)
            Qux_r = Qux + state_reg * (fu.T @ fz)
            kff = -jnp.linalg.solve(Quu_r, Qu)
            K = -jnp.linalg.solve(Quu_r, Qux_r)
            # non-finite stage guard: zero that stage's correction rather
            # than poisoning the whole sweep (line search still vets cost)
            okk = jnp.all(jnp.isfinite(kff)) & jnp.all(jnp.isfinite(K))
            kff = jnp.where(okk, kff, 0.0)
            K = jnp.where(okk, K, 0.0)
            Vx2 = Qx + K.T @ Quu @ kff + K.T @ Qu + Qux.T @ kff
            Vxx2 = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx2 = 0.5 * (Vxx2 + Vxx2.T)
            okv = jnp.all(jnp.isfinite(Vx2)) & jnp.all(jnp.isfinite(Vxx2))
            Vx2 = jnp.where(okv, Vx2, Vx)
            Vxx2 = jnp.where(okv, Vxx2, Vxx)
            return (Vx2, Vxx2), (kff, K)
        _, (kff, K) = jax.lax.scan(bstep, (Vx, Vxx), (Fz, Fu, g, Hm),
                                   reverse=True)
        return kff, K

    def forward(Z, Uh, kff, K, alpha):
        def fstep(z, inp):
            zn, un, kf, Kk = inp
            u = un + alpha * kf + Kk @ (z - zn)
            z2 = dyn(z, u)
            return z2, (u, z2)
        _, (U2, Z1) = jax.lax.scan(fstep, Z[0], (Z[:-1], Uh, kff, K))
        return U2, jnp.concatenate([Z[0][None], Z1], axis=0)

    def sweep(carry, it):
        Uh, Z = carry
        rho = jnp.maximum(rho0 * (rho_min / rho0) ** (it / (iters - 1.0)),
                          rho_min).astype(dtype)
        kff, K = backward(Z, Uh, rho)

        def try_alpha(alpha):
            U2, Z2 = forward(Z, Uh, kff, K, alpha)
            c = total_c(Z[0], U2, rho)
            return U2, Z2, jnp.where(jnp.isfinite(c), c, jnp.inf)
        U2s, Z2s, cs = jax.vmap(try_alpha)(alphas)
        c0 = total_c(Z[0], Uh, rho)
        best = jnp.argmin(cs)
        improved = cs[best] < c0
        U_new = jnp.where(improved, U2s[best], Uh)
        Z_new = jnp.where(improved, Z2s[best], Z)
        return (U_new, Z_new), jnp.minimum(cs[best], c0)

    Uh0 = U0 / s_u[None, :]
    Z0 = _rollout(z0, U0, mass, inertia_w_inv, dt)
    (Uh, Z), costs = jax.lax.scan(sweep, (Uh0, Z0),
                                  jnp.arange(iters, dtype=dtype))
    return s_u[None, :] * Uh, Z, costs[-1]


def make_ci_reference(z0, t, terrain, params, velx=0.2, body_height=0.3,
                      gait_freq=None, swing_clearance=0.06, horizon=10,
                      dt_plan=0.02, offsets=(0.0, 0.5, 0.5, 0.0),
                      stance_frac=0.5):
    """Trot-template references (refs_z (H+1,NZ), refs_u (H,NU), and the
    input warm start U0). The template carries the PREFERRED gait rhythm
    and terrain-aware foothold arcs; complementarity against the real
    height field decides the actual contact (e.g. touchdown height on a
    box comes from the terrain, not from the template's flat-ground
    guess — both template foot z and warm-start forces are terrain-lifted
    here so the box is in the initial guess too)."""
    from legged_mpc_control_tpu.control import raibert
    from legged_mpc_control_tpu.ops import so3

    dtype = z0.dtype
    if gait_freq is None:
        gait_freq = float(params.gait_counter_speed)
    pos, eul, v = z0[0:3], z0[3:6], z0[6:9]
    feet0 = z0[12:24].reshape(4, 3)
    yaw = eul[2]
    Rz = so3.rot_z(yaw)
    v_d = Rz @ jnp.array([velx, 0.0, 0.0], dtype)

    # footholds: Raibert target, z snapped to the terrain
    target_abs, _ = raibert.raibert_footholds(
        pos, v, Rz, jnp.array([velx, 0.0, 0.0], dtype), params,
        terrain=terrain)
    target_world = target_abs + pos[None, :]
    tgt_h = terrain_mod.height_at(terrain, target_world[:, 0:2])
    target_world = target_world.at[:, 2].set(tgt_h)

    # template clock: offsets/stance_frac select the gait — (0,.5,.5,0)
    # at 0.5 is the diagonal trot; (0,.5,.75,.25) at 0.75 is the one-leg-
    # at-a-time crawl (the reference's standing_trot regime, gait.info)
    # that keeps >= 3 feet down for quasi-static riser climbs
    offs = jnp.asarray(offsets, dtype)
    ks = jnp.arange(horizon + 1, dtype=dtype)
    phase_k = jnp.mod((t + ks * dt_plan)[:, None] * gait_freq
                      + offs[None, :], 1.0)                 # (H+1, 4)
    stance_k = phase_k < stance_frac
    # complete the swing by 75% of the swing window: the template (and so
    # the plan) reaches the foothold with margin before the clock flips
    # the leg to stance — otherwise the plan foresees a support gap at
    # every touchdown (real feet land late by the PD tracking lag) and
    # compensates by pre-loading the outgoing diagonal, porpoising the
    # body (same margin as the distilled policy, mpc/lci_mpc.py)
    swing_s = jnp.clip((phase_k - stance_frac)
                       / (1.0 - stance_frac) / 0.75, 0.0, 1.0)

    # body reference: terrain-following height, approached at a BOUNDED
    # rate with the matching vertical velocity reference — an absolute
    # height target with v_ref_z = 0 makes the velocity-tracking term
    # veto its own position recovery (the plan then just sustains mg and
    # the height error persists); the convex path's reference builder
    # saturates the same way (mpc/reference.py)
    z_rate = jnp.asarray(0.3, dtype)                        # m/s
    pos_k = pos[None, :] + ks[:, None] * dt_plan * v_d[None, :]
    ground_k = terrain_mod.height_at(terrain, pos_k[:, 0:2])
    z_tgt = ground_k + body_height
    dz = z_tgt - pos[2]
    z_k = pos[2] + jnp.clip(dz, -z_rate * ks * dt_plan,
                            z_rate * ks * dt_plan)
    pos_k = pos_k.at[:, 2].set(z_k)
    vz_k = jnp.diff(z_k, append=z_k[-1:]) / dt_plan         # (H+1,)
    eul_k = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype) * yaw, (horizon + 1, 3))

    # foot reference: stance holds the (terrain-snapped) foothold, swing
    # arcs toward it. The arc's HEIGHT profile is anchored to the terrain
    # under liftoff/landing (ground0 -> target height + clearance bump),
    # NOT to the live foot z: a re-planned arc based on the current foot
    # would re-add clearance on top of wherever the foot already is, and
    # in closed loop that feedback ratchets the swing ever higher.
    hold = jnp.where(stance_k[0][:, None], feet0, target_world)
    ground0 = terrain_mod.height_at(terrain, feet0[:, 0:2])
    lerp = (feet0[None] * (1.0 - swing_s)[..., None]
            + target_world[None] * swing_s[..., None])     # (H+1,4,3)
    arc_z = ((1.0 - swing_s) * ground0[None]
             + swing_s * tgt_h[None]
             + swing_clearance * jnp.sin(jnp.pi * swing_s))
    swing_traj = lerp.at[..., 2].set(arc_z)
    feet_k = jnp.where(stance_k[..., None], hold[None], swing_traj)

    v_k = jnp.broadcast_to(v_d, (horizon + 1, 3))
    v_k = jnp.concatenate([v_k[:, 0:2], vz_k[:, None]], axis=1)
    refs_z = jnp.concatenate([
        pos_k, eul_k, v_k,
        jnp.zeros((horizon + 1, 3), dtype),
        feet_k.reshape(horizon + 1, -1)], axis=1)

    # input template/warm start: weight shared over template-stance feet,
    # foot velocities from the template foot-path differences
    n_st = jnp.maximum(jnp.sum(stance_k[:-1], axis=1), 1.0)
    fz0 = (params.mass * GRAV / n_st)[:, None] * stance_k[:-1]
    f_ref = jnp.zeros((horizon, 4, 3), dtype).at[:, :, 2].set(fz0)
    w_ref = (feet_k[1:] - feet_k[:-1]) / dt_plan
    refs_u = jnp.concatenate([f_ref.reshape(horizon, -1),
                              w_ref.reshape(horizon, -1)], axis=1)
    return refs_z, refs_u, refs_u


def make_ci_walk_policy(params, terrain=None, velx=0.1, body_height=0.3,
                        gait_freq=2.5, horizon=10, dt_plan=0.02,
                        iters=32, fz_min=2.0, wts: CiWeights = None,
                        offsets=(0.0, 0.5, 0.5, 0.0), stance_frac=0.5):
    """The contact-implicit engine as a STATEFUL LciMpc-seam policy
    `(x40, t, warm) -> ((78,), warm')` (reference: LciMpc.cpp:95-139
    exec_policy contract; the warm slot rides LciState.policy_warm).
    Each tick re-solves the CI trajectory optimization from the measured
    state, warm-started from the previous tick's solution — without the
    warm carry adjacent replans chatter between nearby local optima of
    the complementarity landscape and the executed forces flip, which is
    what destabilizes the gait. First-stage GRFs and the optimized foot
    path become the torque mapping / swing targets.

    Init the seam with `lci_init(dtype, policy_warm=policy.warm_init())`.
    """
    from legged_mpc_control_tpu.ops import so3

    if terrain is None:
        terrain = terrain_mod.flat()
    if gait_freq is None:
        gait_freq = float(params.gait_counter_speed)

    def policy(x, t, warm):
        dtype = x.dtype
        pos, eul = x[0:3], x[3:6]
        foot_abs = x[6:18].reshape(4, 3)       # CoM-origin world axes
        v, omega = x[18:21], x[21:24]
        feet_w = foot_abs + pos[None, :]
        z0 = jnp.concatenate([pos, eul, v, omega, feet_w.reshape(-1)])

        refs_z, refs_u, U0 = make_ci_reference(
            z0, t, terrain, params, velx=velx, body_height=body_height,
            gait_freq=gait_freq, horizon=horizon, dt_plan=dt_plan,
            offsets=offsets, stance_frac=stance_frac)
        Rz = so3.rot_z(eul[2])
        inertia_w = Rz @ params.trunk_inertia.astype(dtype) @ Rz.T
        # stage 0 carries the MEASURED support: only feet that are down
        # (position gap or registered force — the force estimate lags a
        # touchdown by a tick) may push now; later stages plan freely
        gap0 = feet_w[:, 2] - terrain_mod.height_at(terrain,
                                                    feet_w[:, 0:2])
        grounded_now = ((x[36:40] > 2.0) | (gap0 < 0.003)).astype(dtype)
        f_mask = jnp.ones((horizon, 4), dtype).at[0].set(grounded_now)
        # cross-tick warm start: previous tick's trajectory (the state
        # advanced only one 10 ms tick, under one plan stage — no shift)
        U0 = jnp.where(warm["valid"] > 0.5, warm["u"], U0)
        U, Z, _cost = ci_solve(
            z0, U0, refs_z, refs_u, terrain, params.mass.astype(dtype),
            inertia_w, params.mu.astype(dtype), wts, f_mask, iters=iters,
            dt=dt_plan)

        f0 = U[0, 0:12].reshape(4, 3)
        loaded = (f0[:, 2] > fz_min).astype(dtype)
        # execute force only through feet that BOTH the optimizer loads
        # AND the hardware/sim actually reports grounded — commanding
        # GRF through a foot millimetres in the air silently drops that
        # support and random-walks the attitude. Feet the plan loads but
        # that have not registered force yet get a bootstrap push so the
        # contact can establish (same two rules as the distilled policy,
        # mpc/lci_mpc.py make_walk_policy).
        # grounded = physically at the surface (position gap) OR already
        # carrying force: the foot-force estimate is quasi-static from
        # the last commanded torques and lags a touchdown by a tick,
        # which is exactly when support gating must not drop the foot
        grounded0 = grounded_now
        support = loaded * grounded0
        boot = (loaded * (1.0 - grounded0))[:, None] \
            * jnp.array([0.0, 0.0, 2.0 * jnp.maximum(fz_min, 5.0)],
                        dtype)[None, :]
        u = (f0 * support[:, None] + boot).reshape(-1)

        # desired foot positions: the optimized path one planning step
        # ahead (world frame, the seam's optimized_state foot slots).
        # Execution fix-up around the contact boundary (the optimizer's
        # own z respects gap >= 0 exactly, so a raw target leaves the
        # foot hovering by the PD tracking error and contact flickers —
        # the distilled policy handles it identically,
        # mpc/lci_mpc.py make_walk_policy):
        #   loaded + already grounded -> hold the current foot position;
        #   loaded but still airborne -> aim 1 cm below the surface to
        #   drive the touchdown through;
        #   unloaded (swing)          -> the optimized arc as-is.
        foot_tgt = Z[1, 12:24].reshape(4, 3)
        g_tgt = terrain_mod.height_at(terrain, foot_tgt[:, 0:2])
        press = foot_tgt.at[:, 2].set(g_tgt - 0.01)
        stance_tgt = jnp.where(grounded0[:, None] > 0.5, feet_w, press)
        foot_tgt = jnp.where(loaded[:, None] > 0.5, stance_tgt, foot_tgt)
        pos_des = refs_z[1, 0:3]
        eul_des = refs_z[1, 3:6]
        v_d = refs_z[1, 6:9]

        state_des = jnp.concatenate([pos_des, eul_des,
                                     foot_tgt.reshape(-1)])
        vel_des = jnp.concatenate([v_d, jnp.zeros(3, dtype),
                                   U[0, 12:24]])
        state_ref = state_des
        vel_ref = jnp.zeros(12, dtype)
        out = jnp.concatenate([u, state_des, vel_des, state_ref,
                               vel_ref])
        return out, {"u": U, "valid": jnp.ones((), dtype)}

    policy.ci_stateful = True
    policy.warm_init = lambda dtype=jnp.float32: {
        "u": jnp.zeros((horizon, NU), dtype),
        "valid": jnp.zeros((), dtype)}
    return policy


def make_ci_lean_reference(z0, wall, feet_target, body_pos, body_eul,
                           params, terrain, horizon=10, dt_plan=0.02,
                           balance_pos=None, balance_feet=None):
    """Wall-lean hold template (reference capability: README.md:14 "lean
    against wall"): every stage holds the lean pose — body at
    (body_pos, body_eul), all four feet at feet_target (4,3), typically
    front feet ON the wall plane and rear feet on the ground.

    The input template splits gravity by which surface each target foot is
    closer to: ground feet share the weight vertically; wall feet get a
    wall-normal preload plus the friction share that vertical equilibrium
    needs — just a warm-start basin, the FB complementarity (with the
    blended wall/ground normal, `env_gap_normal`) owns the physics."""
    dtype = z0.dtype
    gap, n = env_gap_normal(terrain, wall, feet_target)
    on_wall = (terrain_mod.wall_gap(wall, feet_target)
               < feet_target[:, 2]
               - terrain_mod.height_at(terrain, feet_target[:, 0:2]))
    mg = params.mass.astype(dtype) * GRAV
    n_wall = jnp.maximum(jnp.sum(on_wall), 1).astype(dtype)
    n_ground = jnp.maximum(jnp.sum(~on_wall), 1).astype(dtype)
    f_wall_n = 20.0
    # EQUILIBRIUM-CONSISTENT template at the chosen wall-normal preload.
    # Wall-lean equilibria form a one-parameter family in the preload fn;
    # the template must be an actual member of it — the policy tracks the
    # template strongly (r_f), and tracking an inconsistent template (the
    # old zero-rear-friction one) leaves a net body wrench the closed
    # loop integrates into drift. Planar (x-z) static balance, per side:
    #   fx_ground = -fn n_x               (cancel the wall press)
    #   fw + fz   = mg/2                  (weight)
    #   r_wx fw + r_gx fz = fn (r_gz - r_wz) n_x_sign   (pitch torque)
    # solved for the wall-foot vertical share fw and ground load fz.
    # balance levers from the MEASURED pose when given (the policy passes
    # the contact-corrected feet + current CoM): the template is then an
    # equilibrium AT the current pose, so the only residual input is the
    # pose-tracking restoring gradient — a nominal-pose template leaves a
    # constant wrench error that the closed loop integrates into z/pitch
    # drift until the rear legs hit full extension
    body = jnp.asarray(body_pos if balance_pos is None else balance_pos,
                       dtype)
    bal_feet = feet_target if balance_feet is None else balance_feet
    r_w = jnp.sum(jnp.where(on_wall[:, None], bal_feet - body[None, :],
                            0.0), axis=0) / n_wall
    r_g = jnp.sum(jnp.where(on_wall[:, None], 0.0,
                            bal_feet - body[None, :]), axis=0) / n_ground
    nx = jnp.sum(jnp.where(on_wall[:, None], n, 0.0), axis=0)[0] / n_wall
    half_w = mg / n_wall
    # 2x2 solve: [1, 1; r_wx, r_gx] [fw, fz] = [mg/n_wall_pairs, c2]
    c1 = mg / 2.0
    c2 = f_wall_n * (r_g[2] - r_w[2]) * (-nx)
    det = r_g[0] - r_w[0]
    fw = (c2 - r_g[0] * c1) / jnp.where(jnp.abs(det) < 1e-6, 1e-6, -det)
    fw = jnp.clip(fw, -0.9 * params.mu.astype(dtype) * f_wall_n,
                  0.9 * params.mu.astype(dtype) * f_wall_n)
    fz_g = c1 - fw
    del half_w
    f_wall = f_wall_n * n + jnp.array([0.0, 0.0, 1.0], dtype)[None, :] * fw
    f_ground = jnp.zeros((4, 3), dtype) \
        .at[:, 0].set(-f_wall_n * nx).at[:, 2].set(fz_g)
    f0 = jnp.where(on_wall[:, None], f_wall, f_ground)

    # restoring reference velocity toward the nominal pose: with zero
    # velocity refs the velocity-damped plan HOVERS at whatever pose the
    # tick starts from, so any realized-force bias (compliant-contact
    # surplus in the articulated sim) integrates into unbounded z/x drift
    # — the closed loop rode that drift into rear-leg full extension and
    # fell. A clipped proportional velocity reference turns the pose
    # error into commanded motion the very first stage executes.
    pos_err = jnp.asarray(body_pos, dtype) - z0[0:3]
    eul_err = jnp.asarray(body_eul, dtype) - z0[3:6]
    v_ref = jnp.clip(1.5 * pos_err, -0.15, 0.15)
    om_ref = jnp.clip(2.0 * jnp.stack([eul_err[0], eul_err[1],
                                       eul_err[2]]), -0.3, 0.3)
    zr = jnp.concatenate([
        jnp.asarray(body_pos, dtype), jnp.asarray(body_eul, dtype),
        v_ref, om_ref, feet_target.reshape(-1)])
    refs_z = jnp.tile(zr[None], (horizon + 1, 1))
    refs_u = jnp.tile(
        jnp.concatenate([f0.reshape(-1), jnp.zeros(12, dtype)])[None],
        (horizon, 1))
    return refs_z, refs_u, refs_u


def make_ci_lean_policy(params, wall, feet_target, body_pos, body_eul,
                        terrain=None, horizon=10, dt_plan=0.02, iters=24,
                        fz_min=2.0, wts: CiWeights = None):
    """The contact-implicit engine holding a wall-lean as an LciMpc-seam
    policy `(x40, t, warm) -> ((78,), warm')` — same seam contract as
    `make_ci_walk_policy`. Each tick re-solves the CI optimization from
    the measured state against the ground+wall environment; the per-foot
    contact normal (and with it the friction geometry that lets wall feet
    carry weight through friction) comes out of `env_gap_normal`, not a
    schedule."""
    from legged_mpc_control_tpu.ops import so3

    if terrain is None:
        terrain = terrain_mod.flat()
    if wts is None:
        # lean-specific weights (validated in tests/test_ci_wall_lean.py):
        #  * r_f 10x: the lean needs REAL input tracking toward the
        #    preloaded template — wall-lean equilibria form a
        #    one-parameter family in the wall-normal preload, and the
        #    minimal-force member (which a weak ||u||^2 preference
        #    selects) SATURATES the friction cone (fw = mu*fn exactly),
        #    so the wall feet creep down the wall in closed loop;
        #  * roll weight 150: the two-surface stance couples roll into
        #    wall-foot load asymmetry — the foot that picks up extra
        #    vertical share hits its cone first and starts the slide.
        wts = default_weights()._replace(
            r_f=jnp.asarray(1e-2),
            q_eul=jnp.asarray([150.0, 60.0, 60.0]))

    def policy(x, t, warm):
        dtype = x.dtype
        pos, eul = x[0:3], x[3:6]
        foot_abs = x[6:18].reshape(4, 3)
        v, omega = x[18:21], x[21:24]
        feet_w = foot_abs + pos[None, :]

        gap0, n0 = env_gap_normal(terrain, wall, feet_w)
        grounded_now = ((x[36:40] > 2.0) | (gap0 < 0.003)).astype(dtype)
        # contact-aided foot correction: feet known to be in contact are
        # snapped onto the environment surface along the contact normal
        # before the solve. The measured FK carries a systematic few-mm
        # bias (the controller's leg geometry is deliberately mismatched
        # from the simulated robot's, sim/wb_sim.wb_rho_fix) which the
        # convex path shrugs off (millimeters barely move torque arms) but
        # complementarity reads as real penetration — the optimizer is
        # then REWARDED for loading "penetrating" feet and lifting the
        # body, which is exactly the runaway that killed the closed-loop
        # lean. Same principle as the estimator's contact-gated foot
        # height measurement (estimation/basic_kf.py; reference:
        # BasicKF.cpp:129-130).
        feet_corr = feet_w - (grounded_now * gap0)[:, None] * n0
        z0 = jnp.concatenate([pos, eul, v, omega, feet_corr.reshape(-1)])

        tgt = jnp.asarray(feet_target, dtype)
        refs_z, refs_u, U0 = make_ci_lean_reference(
            z0, wall, tgt, body_pos, body_eul, params, terrain,
            horizon=horizon, dt_plan=dt_plan,
            balance_pos=pos, balance_feet=feet_corr)
        Rz = so3.rot_z(eul[2])
        inertia_w = Rz @ params.trunk_inertia.astype(dtype) @ Rz.T
        f_mask = jnp.ones((horizon, 4), dtype).at[0].set(grounded_now)
        U0 = jnp.where(warm["valid"] > 0.5, warm["u"], U0)
        U, Z, _cost = ci_solve(
            z0, U0, refs_z, refs_u, terrain, params.mass.astype(dtype),
            inertia_w, params.mu.astype(dtype), wts, f_mask, iters=iters,
            dt=dt_plan, wall=wall)

        f0 = U[0, 0:12].reshape(4, 3)
        fn0 = jnp.sum(f0 * n0, axis=-1)
        loaded = (fn0 > fz_min).astype(dtype)
        support = loaded * grounded_now
        boot = (loaded * (1.0 - grounded_now))[:, None] \
            * (2.0 * jnp.maximum(fz_min, 5.0)) * n0
        u = (f0 * support[:, None] + boot).reshape(-1)

        # stance fix-up. Ground feet hold their measured position (the
        # walk policy's rule); wall feet instead PD-press a target pinned
        # 2 mm INSIDE the wall plane — holding the measured position of a
        # foot against the stiff wall turns contact chatter into command
        # chatter, while a plane-pinned press gives a steady spring preload
        # and a PD-velocity-limited approach (no damping impulse on
        # touchdown, which is what knocks the body off the lean
        # equilibrium).
        gap_w0 = terrain_mod.wall_gap(wall, feet_w)
        gap_g0 = feet_w[:, 2] - terrain_mod.height_at(terrain,
                                                      feet_w[:, 0:2])
        on_wall0 = gap_w0 < gap_g0
        n_w = wall.normal.astype(dtype)
        foot_tgt = Z[1, 12:24].reshape(4, 3)
        press_wall = feet_w - (gap_w0 + 0.002)[:, None] * n_w[None, :]
        press_gnd = foot_tgt - 0.01 * n0
        stance_tgt = jnp.where(grounded_now[:, None] > 0.5, feet_w,
                               press_gnd)
        stance_tgt = jnp.where(on_wall0[:, None], press_wall, stance_tgt)
        foot_tgt = jnp.where(loaded[:, None] > 0.5, stance_tgt, foot_tgt)

        state_des = jnp.concatenate([refs_z[1, 0:3], refs_z[1, 3:6],
                                     foot_tgt.reshape(-1)])
        vel_des = jnp.concatenate([refs_z[1, 6:9], jnp.zeros(3, dtype),
                                   U[0, 12:24]])
        out = jnp.concatenate([u, state_des, vel_des, state_des,
                               jnp.zeros(12, dtype)])
        return out, {"u": U, "valid": jnp.ones((), dtype)}

    policy.ci_stateful = True
    policy.warm_init = lambda dtype=jnp.float32: {
        "u": jnp.zeros((horizon, NU), dtype),
        "valid": jnp.zeros((), dtype)}
    return policy
