"""Closed-form leg kinematics for Unitree A1/Go1-class quadrupeds.

Hand-derived replacement for the reference's MATLAB-symbolic-generated
`A1Kinematics` (reference: src/legged_ctrl/src/utils/A1Kinematics.cpp:39-446).
Same kinematic model and joint conventions, fresh derivation:

Leg chain (per leg, in body frame):
  hip-roll joint q1 about +x at trunk offset (ox, oy, 0);
  motor offset d along +-y after the roll;
  thigh-pitch q2 about +y, thigh length lt pointing -z at q2=0;
  calf-pitch q3 about +y, calf length lc.

    x = ox - lt*sin(q2) - lc*sin(q2+q3)
    y = oy + d*cos(q1) + sin(q1)*L
    z =      d*sin(q1) - cos(q1)*L,   L = lt*cos(q2) + lc*cos(q2+q3)

`rho_fix = [ox, oy, d, lt, lc]` matches the reference's parameterization
(A1Kinematics.h:21-25, values from BaseInterface.cpp:76-98). All functions are
scalar-leg; batch over legs/scenarios with `vmap`.
"""

import jax
import jax.numpy as jnp


def fk(q, rho_fix):
    """Foot position in body frame. q=(3,), rho_fix=(5,) -> (3,)."""
    ox, oy, d, lt, lc = (rho_fix[..., i] for i in range(5))
    q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2]
    s1, c1 = jnp.sin(q1), jnp.cos(q1)
    s2, c2 = jnp.sin(q2), jnp.cos(q2)
    s23, c23 = jnp.sin(q2 + q3), jnp.cos(q2 + q3)
    L = lt * c2 + lc * c23
    x = ox - lt * s2 - lc * s23
    y = oy + d * c1 + s1 * L
    z = d * s1 - c1 * L
    return jnp.stack([x, y, z], axis=-1)


def jac(q, rho_fix):
    """Foot Jacobian d(fk)/dq in body frame: (3,3)."""
    _, _, d, lt, lc = (rho_fix[..., i] for i in range(5))
    q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2]
    s1, c1 = jnp.sin(q1), jnp.cos(q1)
    s2, c2 = jnp.sin(q2), jnp.cos(q2)
    s23, c23 = jnp.sin(q2 + q3), jnp.cos(q2 + q3)
    L = lt * c2 + lc * c23              # z-reach of thigh+calf
    M = lt * s2 + lc * s23              # x-reach (negated)
    zero = jnp.zeros_like(q1)
    # dx/dq
    dx = jnp.stack([zero, -lt * c2 - lc * c23, -lc * c23], axis=-1)
    # dy/dq: y = oy + d c1 + s1 L
    dy = jnp.stack([-d * s1 + c1 * L, s1 * (-lt * s2 - lc * s23),
                    s1 * (-lc * s23)], axis=-1)
    # dz/dq: z = d s1 - c1 L
    dz = jnp.stack([d * c1 + s1 * L, -c1 * (-lt * s2 - lc * s23),
                    -c1 * (-lc * s23)], axis=-1)
    del M
    return jnp.stack([dx, dy, dz], axis=-2)


def ik(p, q_ref, rho_fix):
    """Analytic inverse kinematics, branch nearest `q_ref`.

    Functional equivalent of the reference's analytic 3-DoF IK with
    nearest-branch selection (reference: A1Kinematics.cpp:330-446). Out-of-
    workspace targets are clamped to the reachable sphere (cos q3 clipped),
    which also makes the function NaN-free — the NaN fallback the reference
    applies at the call site (BaseInterface.cpp:472-484) becomes unnecessary,
    but consumers still guard with `jnp.where(isnan)` for parity.

    p=(3,) body-frame target, q_ref=(3,) current angles, rho_fix=(5,).
    """
    ox, oy, d, lt, lc = (rho_fix[..., i] for i in range(5))
    px = p[..., 0] - ox
    py = p[..., 1] - oy
    pz = p[..., 2]

    # hip roll from the (y, z) circle: py = d c1 + L s1, pz = d s1 - L c1.
    # |L| is determined, but its sign is not (leg "below" vs "above" the hip
    # roll axis) — both signs are candidate branches.
    L2 = py * py + pz * pz - d * d
    L = jnp.sqrt(jnp.maximum(L2, 1e-12))

    # knee: c3 depends only on L^2, shared by both L branches
    c3 = (px * px + L * L - lt * lt - lc * lc) / (2.0 * lt * lc)
    c3 = jnp.clip(c3, -1.0, 1.0)
    q3_mag = jnp.arccos(c3)

    def candidate(L_signed, q3):
        # py + i pz = (d - i L) e^{i q1}
        q1 = jnp.arctan2(pz, py) - jnp.arctan2(-L_signed, d)
        q1 = jnp.arctan2(jnp.sin(q1), jnp.cos(q1))   # wrap to (-pi, pi]
        # (L, -px) = (lt + lc e^{i q3}) e^{i q2}
        q2 = (jnp.arctan2(-px, L_signed)
              - jnp.arctan2(lc * jnp.sin(q3), lt + lc * jnp.cos(q3)))
        q2 = jnp.arctan2(jnp.sin(q2), jnp.cos(q2))
        return jnp.stack([q1, q2, q3], axis=-1)

    cands = [candidate(Ls, q3) for Ls in (L, -L) for q3 in (-q3_mag, q3_mag)]

    def dist(c):
        dq = jnp.arctan2(jnp.sin(c - q_ref), jnp.cos(c - q_ref))
        return jnp.sum(dq * dq, axis=-1)

    best = cands[0]
    best_d = dist(cands[0])
    for c in cands[1:]:
        dc = dist(c)
        take = dc < best_d
        best = jnp.where(take[..., None], c, best)
        best_d = jnp.where(take, dc, best_d)
    return best


# --- calibration surface (reference: A1Kinematics.h:21-35) ---
# rho_opt = (cx, cy, cz): foot-contact offset expressed in the CALF frame —
# the reference's generated d_fk_dc (A1Kinematics.cpp autoFunc_d_fk_dc) is
# exactly Rx(q1) @ Ry(q2+q3), the calf-frame rotation. Where the reference
# carries MATLAB-generated closed forms for the calibration derivatives
# (A1Kinematics.cpp:39-53 note), here they are jax.jacfwd of one FK.


def _calf_rot(q):
    """Body-from-calf rotation Rx(q1) @ Ry(q2+q3)."""
    q1, q23 = q[..., 0], q[..., 1] + q[..., 2]
    s1, c1 = jnp.sin(q1), jnp.cos(q1)
    s, c = jnp.sin(q23), jnp.cos(q23)
    zero = jnp.zeros_like(q1)
    return jnp.stack([
        jnp.stack([c, zero, s], axis=-1),
        jnp.stack([s1 * s, c1, -s1 * c], axis=-1),
        jnp.stack([-c1 * s, s1, c1 * c], axis=-1),
    ], axis=-2)


def fk_cal(q, rho_opt, rho_fix):
    """FK with the calf-frame contact offset (reference fk with rho_opt)."""
    return fk(q, rho_fix) + jnp.einsum("...ij,...j->...i",
                                       _calf_rot(q), rho_opt)


def jac_cal(q, rho_opt, rho_fix):
    """d fk_cal / d q (3,3) (reference jac with rho_opt)."""
    return jax.jacfwd(fk_cal)(q, rho_opt, rho_fix)


def dfk_drho(q, rho_opt, rho_fix):
    """d fk / d rho_opt (3,3) (reference dfk_drho = autoFunc_d_fk_dc)."""
    return jax.jacfwd(fk_cal, argnums=1)(q, rho_opt, rho_fix)


def dJ_dq(q, rho_opt, rho_fix):
    """d vec(J) / d q (9,3), vec row-major over J's (row, col)
    (reference dJ_dq; 9x3 layout documented here rather than Eigen's)."""
    full = jax.jacfwd(jac_cal)(q, rho_opt, rho_fix)     # (3,3,3)
    return full.reshape(9, 3)


def dJ_drho(q, rho_opt, rho_fix):
    """d vec(J) / d rho_opt (9,3) (reference dJ_drho)."""
    full = jax.jacfwd(jac_cal, argnums=1)(q, rho_opt, rho_fix)
    return full.reshape(9, 3)


# Convenience per-robot vectorized forms (legs axis first).
fk_legs = jax.vmap(fk, in_axes=(0, 0))          # (4,3),(4,5) -> (4,3)
jac_legs = jax.vmap(jac, in_axes=(0, 0))        # -> (4,3,3)
ik_legs = jax.vmap(ik, in_axes=(0, 0, 0))       # -> (4,3)
