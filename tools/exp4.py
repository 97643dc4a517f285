import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
"""In-graph ablation: full closed-loop tick with pieces no-op'd, one jit
per variant, 10-tick rollouts (amortizes the ~2 ms dispatch floor)."""
import time

import jax
import jax.numpy as jnp

from legged_mpc_control_tpu import constants as C
from legged_mpc_control_tpu.config import go1_params
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.mpc import convex_mpc, gait as gait_mod, riccati
from legged_mpc_control_tpu.parallel import runner
from legged_mpc_control_tpu.sim import srb_sim

B, H, ITERS, dtype = 4096, 10, 5, jnp.float32
params1 = go1_params(dtype)
pattern = gait_mod.trot_pattern(dtype)
params = None  # broadcast later
dt_mpc = C.MPC_DT
dt_ll = dt_mpc / C.SUBSTEPS_PER_MPC_TICK
N_TICKS = 5


def make_roll(mode):
    def tick(loop, params, warm):
        cs = loop.controller
        v_anf = jax.vmap(step_mod._anchored_normal_force)
        v_sensors = jax.vmap(step_mod._sim_sensors)
        v_fb = jax.vmap(lambda c, raw, pp: step_mod.feedback_update(
            c, raw, pp, dt_ll, kf_type=0))
        v_ll = jax.vmap(lambda c, pp: step_mod.lowlevel_update(c, pp, 0))
        v_sim = jax.vmap(lambda ss, tt, pp: srb_sim.sim_step(
            ss, tt, pp, dt_ll))

        grf_n = jnp.where(loop.sim.contact, v_anf(loop, params), 0.0)
        cs = v_fb(cs, v_sensors(loop.sim, params, grf_n), params)

        if mode == "no_mpc":
            cs, stage = jax.vmap(
                lambda s, p: convex_mpc.mpc_prepare(
                    s, p, pattern, dt_mpc, horizon=H))(cs, params)
            grf = jnp.zeros((B, 12), dtype)
            cs = jax.vmap(convex_mpc.mpc_finish)(cs, grf)
        elif mode == "no_prepare":
            # solve on a frozen stage built once outside: emulate by
            # solving with the warm as x-independent — skip prepare/finish,
            # run solve on dummy stage captured from first prepare
            cs, stage = jax.vmap(
                lambda s, p: convex_mpc.mpc_prepare(
                    s, p, pattern, dt_mpc, horizon=H))(cs, params)
            cs = jax.vmap(convex_mpc.mpc_finish)(cs, jnp.zeros((B, 12),
                                                               dtype))
        else:
            cs, warm = convex_mpc.mpc_tick_batched(
                cs, params, pattern, dt_mpc, horizon=H, iters=ITERS,
                solver="riccati", backend="pallas", warm=warm)

        if mode == "no_substeps":
            sim = loop.sim
        else:
            def substep(carry, _):
                cs, sim = carry
                cs, tau, _safe = v_ll(cs, params)
                if mode == "no_sim":
                    pass
                else:
                    sim = v_sim(sim, tau, params)
                grf_n = jnp.where(sim.contact, v_anf(
                    step_mod.LoopState(controller=cs, sim=sim), params), 0.0)
                if mode != "no_fb":
                    cs = v_fb(cs, v_sensors(sim, params, grf_n), params)
                return (cs, sim), None

            (cs, sim), _ = jax.lax.scan(substep, (cs, loop.sim), None,
                                        length=8, unroll=True)
        return step_mod.LoopState(controller=cs, sim=sim), warm

    def roll(loop, params):
        warm0 = jnp.zeros((B, H * 12), dtype)
        def body(carry, _):
            loop, warm = carry
            loop, warm = tick(loop, warm=warm, params=params)
            return (loop, warm), None
        (final, _), _ = jax.lax.scan(body, (loop, warm0), None,
                                     length=N_TICKS)
        return final
    return roll


params = step_mod.broadcast_params(params1, B)
base = None
import sys
for mode in sys.argv[1:] or ("full", "no_substeps", "no_mpc"):
    roll = jax.jit(make_roll(mode))
    variants = [(runner.init_loop_batch(params1, B, jax.random.PRNGKey(k),
                                        dtype=dtype), params)
                for k in range(2)]
    out = roll(*variants[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    n = 4
    for i in range(n):
        out = roll(*variants[i % 2])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n / N_TICKS
    if mode == "full":
        base = dt
    print(f"{mode:12s}: {dt*1e3:8.3f} ms/tick"
          + (f"  (delta {1e3*(base-dt):+.3f})" if mode != "full" else ""),
          flush=True)
