"""Fused single-launch CI kernel (ops/ci_pallas.py) vs the XLA
ci_solve_batched: same algorithm (Gauss-Newton sweeps, FB curvature,
5-candidate line search), so solutions must agree closely on the
flat-terrain problems the kernel serves. Runs the kernel in interpret
mode on CPU; the real Mosaic path is exercised on TPU by bench.py."""

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.mpc import ci_mpc
from legged_mpc_control_tpu.sim import terrain as terrain_mod

DTYPE = jnp.float32
PARAMS = a1_params(DTYPE)
MG = float(PARAMS.mass) * 9.81


def _problem(B=3, H=10, seed=0, velx=0.15):
    terr = terrain_mod.flat(dtype=DTYPE)
    key = jax.random.PRNGKey(seed)
    pos = jnp.array([0.0, 0.0, 0.3], DTYPE)
    feet = PARAMS.default_foot_pos.astype(DTYPE) + pos[None, :]
    z0_base = jnp.concatenate([pos, jnp.zeros(3, DTYPE),
                               jnp.array([velx, 0.0, 0.0], DTYPE),
                               jnp.zeros(3, DTYPE), feet.reshape(-1)])
    z0 = z0_base[None] + 0.01 * jax.random.normal(key, (B, 24), DTYPE)
    mk = jax.vmap(lambda zz, tt: ci_mpc.make_ci_reference(
        zz, tt, terr, PARAMS, velx=velx, gait_freq=3.5, horizon=H))
    refs_z, refs_u, U0 = mk(z0, 0.03 * jnp.arange(B, dtype=DTYPE))
    Iw = jnp.broadcast_to(PARAMS.trunk_inertia.astype(DTYPE), (B, 3, 3))
    fm = jnp.ones((B, H, 4), DTYPE).at[:, 0, 1].set(0.0)
    return terr, z0, refs_z, refs_u, U0, Iw, fm


def test_fused_matches_xla():
    terr, z0, refs_z, refs_u, U0, Iw, fm = _problem()
    assert ci_mpc.ci_pallas_available(terr, None, 10, DTYPE)
    kw = dict(iters=10, rho0=jnp.full((3,), 0.3, DTYPE))
    Ux, Zx, cx = ci_mpc.ci_solve_batched(
        z0, U0, refs_z, refs_u, terr, PARAMS.mass, Iw, PARAMS.mu,
        f_mask=fm, backend="xla", **kw)
    Uf, Zf, cf = ci_mpc.ci_solve_batched(
        z0, U0, refs_z, refs_u, terr, PARAMS.mass, Iw, PARAMS.mu,
        f_mask=fm, backend="fused_interpret", **kw)
    # same algorithm, different op association: trajectories agree to
    # small absolute tolerances at force/position scale
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cx),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(Zf), np.asarray(Zx),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(Uf[..., 0:12]),
                               np.asarray(Ux[..., 0:12]), atol=0.5)
    np.testing.assert_allclose(np.asarray(Uf[..., 12:24]),
                               np.asarray(Ux[..., 12:24]), atol=2e-2)


def test_fused_gating():
    """The kernel serves exactly the flat-zero/no-wall/short-horizon/f32
    problems; anything else must stay on the XLA path."""
    flat = terrain_mod.flat(dtype=DTYPE)
    boxed = terrain_mod.add_box(flat, center_xy=(1.0, 0.0),
                                size_xy=(1.0, 1.0), height=0.03)
    wall = terrain_mod.wall_at_x(0.4, dtype=DTYPE)
    assert ci_mpc.ci_pallas_available(flat, None, 10, DTYPE)
    assert ci_mpc.ci_pallas_available(flat, None, 12, DTYPE)
    assert not ci_mpc.ci_pallas_available(boxed, None, 10, DTYPE)
    assert not ci_mpc.ci_pallas_available(flat, wall, 10, DTYPE)
    assert not ci_mpc.ci_pallas_available(flat, None, 13, DTYPE)
    assert not ci_mpc.ci_pallas_available(flat, None, 10, jnp.float64)


def test_fused_standing_equilibrium():
    """The kernel path solves the standing problem to the same physics
    gates as the solver tests: mg/4 per foot, body pinned."""
    terr = terrain_mod.flat(dtype=DTYPE)
    H, B = 10, 2
    pos = jnp.array([0.0, 0.0, 0.3], DTYPE)
    feet = PARAMS.default_foot_pos.astype(DTYPE) + pos[None, :]
    z0 = jnp.tile(jnp.concatenate(
        [pos, jnp.zeros(9, DTYPE), feet.reshape(-1)])[None], (B, 1))
    refs_z = jnp.tile(z0[:, None], (1, H + 1, 1))
    f_ref = jnp.zeros((B, H, 4, 3), DTYPE).at[:, :, :, 2].set(MG / 4)
    refs_u = jnp.concatenate([f_ref.reshape(B, H, -1),
                              jnp.zeros((B, H, 12), DTYPE)], axis=2)
    Iw = jnp.broadcast_to(PARAMS.trunk_inertia.astype(DTYPE), (B, 3, 3))
    U, Z, _ = ci_mpc.ci_solve_batched(
        z0, refs_u, refs_z, refs_u, terr, PARAMS.mass, Iw, PARAMS.mu,
        iters=16, backend="fused_interpret")
    f = np.asarray(U[:, :, 0:12]).reshape(B, H, 4, 3)
    np.testing.assert_allclose(f[..., 2], MG / 4, atol=1.0)
    np.testing.assert_allclose(np.asarray(Z[:, :, 2]), 0.3, atol=2e-3)
