"""Batch-native CI backend (mpc/ci_mpc.ci_solve_batched +
lci_mpc.lci_mpc_tick_batched + control/step.closed_loop_tick_lci_batched):
the contact-implicit engine as ONE solve per scenario batch — the CI
equivalent of the convex path's batched Riccati tick. The reference runs
its CI-MPC in the same MPC thread + 10 ms budget as the convex backend
(reference: main.cpp:130-163); the batch is this framework's sweep/scaling
surface on top of that capability."""

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.mpc import ci_mpc, lci_mpc
from legged_mpc_control_tpu.parallel import runner
from legged_mpc_control_tpu.sim import terrain as terrain_mod

DTYPE = jnp.float32
PARAMS = a1_params(DTYPE)


def test_ci_solve_batched_matches_solo():
    """ci_solve IS ci_solve_batched at B=1; a B>1 batch must reproduce
    each scenario's solo solve (same math, batched layout)."""
    terr = terrain_mod.flat(dtype=DTYPE)
    B, H = 3, 8
    key = jax.random.PRNGKey(0)
    pos = jnp.array([0.0, 0.0, 0.3], DTYPE)
    feet = PARAMS.default_foot_pos.astype(DTYPE) + pos[None, :]
    z0_base = jnp.concatenate([pos, jnp.zeros(9, DTYPE), feet.reshape(-1)])
    z0 = z0_base[None] + 0.01 * jax.random.normal(key, (B, 24), DTYPE)
    refs_z = jnp.tile(z0[:, None], (1, H + 1, 1))
    f_ref = jnp.zeros((B, H, 4, 3), DTYPE).at[:, :, :, 2].set(
        float(PARAMS.mass) * 9.81 / 4)
    refs_u = jnp.concatenate([f_ref.reshape(B, H, -1),
                              jnp.zeros((B, H, 12), DTYPE)], axis=2)
    Iw = jnp.broadcast_to(PARAMS.trunk_inertia.astype(DTYPE), (B, 3, 3))

    Ub, Zb, cb = ci_mpc.ci_solve_batched(
        z0, refs_u, refs_z, refs_u, terr, PARAMS.mass, Iw, PARAMS.mu,
        iters=8)
    for i in range(B):
        Ui, Zi, ci = ci_mpc.ci_solve(
            z0[i], refs_u[i], refs_z[i], refs_u[i], terr, PARAMS.mass,
            PARAMS.trunk_inertia.astype(DTYPE), PARAMS.mu, iters=8)
        np.testing.assert_allclose(np.asarray(Ub[i]), np.asarray(Ui),
                                   rtol=1e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(Zb[i]), np.asarray(Zi),
                                   rtol=1e-4, atol=2e-4)


def _init_batch(batch, key=0, mode=1):
    loop = runner.init_loop_batch(PARAMS, batch, jax.random.PRNGKey(key),
                                  dtype=DTYPE)
    cs = loop.controller
    cs = cs.replace(ctrl=cs.ctrl.replace(
        movement_mode=jnp.full((batch,), mode, jnp.int32)))
    return loop.replace(controller=cs)


def test_batched_lci_tick_matches_vmapped_solo():
    """One batched closed-loop LCI tick == a vmap of the solo tick with
    the solo CI policy at the same config (the batched engine is the same
    algorithm in a batched layout, not an approximation)."""
    terr = terrain_mod.flat(dtype=DTYPE)
    B = 3
    kwargs = dict(terrain=terr, velx=0.1, iters=6, rho_warm=0.15)
    walk_b = ci_mpc.make_ci_walk_policy_batched(PARAMS, **kwargs)
    walk_s = ci_mpc.make_ci_walk_policy(PARAMS, **kwargs)
    stand = lci_mpc.make_stand_policy(PARAMS, body_height=0.3)

    loop = _init_batch(B)
    lci_b = lci_mpc.lci_init_batched(
        B, dtype=DTYPE, policy_warm=walk_b.warm_init(B, DTYPE))
    lci_s = jax.vmap(lambda _: lci_mpc.lci_init(
        dtype=DTYPE, policy_warm=walk_s.warm_init(DTYPE)))(jnp.arange(B))

    t = jnp.asarray(0.05, DTYPE)
    out_b, lci_b2 = step_mod.closed_loop_tick_lci_batched(
        loop, lci_b, PARAMS, stand, walk_b, t, terrain=None)
    v_tick = jax.vmap(
        lambda lp, lc: step_mod.closed_loop_tick_lci(
            lp, lc, PARAMS, stand, walk_s, t, terrain=None),
        in_axes=(0, 0))
    out_s, lci_s2 = v_tick(loop, lci_s)

    np.testing.assert_allclose(np.asarray(out_b.sim.pos),
                               np.asarray(out_s.sim.pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_b.sim.q),
                               np.asarray(out_s.sim.q), atol=1e-3)
    np.testing.assert_allclose(np.asarray(lci_b2.policy_warm["u"]),
                               np.asarray(lci_s2.policy_warm["u"]),
                               rtol=1e-3, atol=5e-2)


def test_batched_ci_closed_loop_trots():
    """The bench path end-to-end at small batch: 60 batched warm ticks of
    closed-loop CI trotting — every scenario upright at trot height with
    forward progress (the bench's quality gate, smaller)."""
    B = 4
    walk = ci_mpc.make_ci_walk_policy_batched(
        PARAMS, terrain=terrain_mod.flat(dtype=DTYPE), velx=0.1, iters=24)
    stand = lci_mpc.make_stand_policy(PARAMS, body_height=0.3)
    loop = _init_batch(B)
    lci = lci_mpc.lci_init_batched(
        B, dtype=DTYPE, policy_warm=walk.warm_init(B, DTYPE))

    tick = jax.jit(lambda lp, lc, t: step_mod.closed_loop_tick_lci_batched(
        lp, lc, PARAMS, stand, walk, t, terrain=None))
    t = 0.0
    for _ in range(60):
        loop, lci = tick(loop, lci, jnp.asarray(t, DTYPE))
        t += 0.01
        assert bool(jnp.all(loop.sim.pos[:, 2] > 0.15)), "fell"
    z = np.asarray(loop.sim.pos[:, 2])
    x = np.asarray(loop.sim.pos[:, 0])
    assert np.all(z > 0.22) and np.all(z < 0.38), z
    assert np.all(x > 0.01), x
