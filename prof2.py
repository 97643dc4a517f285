import time
import jax, jax.numpy as jnp
from legged_mpc_control_tpu.config import go1_params
from legged_mpc_control_tpu.mpc import gait, convex_mpc
from legged_mpc_control_tpu.parallel import runner
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.sim import srb_sim
from legged_mpc_control_tpu import constants as C

B, H, dtype = 4096, 10, jnp.float32
params1 = go1_params(dtype)
pattern = gait.trot_pattern(dtype)
loop = runner.init_loop_batch(params1, B, jax.random.PRNGKey(0), dtype=dtype)
params = step_mod.broadcast_params(params1, B)

def timeit(fn, args, n=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

# solve only, pre-computed cs
def fb_once(lp, p):
    grf_n = jnp.where(lp.sim.contact,
                      jax.vmap(step_mod._anchored_normal_force)(lp, p), 0.0)
    return jax.vmap(lambda c, raw, pp: step_mod.feedback_update(
        c, raw, pp, C.MPC_DT/C.SUBSTEPS_PER_MPC_TICK))(
        lp.controller, jax.vmap(step_mod._sim_sensors)(lp.sim, p, grf_n), p)
cs = jax.jit(fb_once)(loop, params)
jax.block_until_ready(cs)

solve = jax.jit(lambda c, p: convex_mpc.mpc_tick_batched(
    c, p, pattern, C.MPC_DT, horizon=H, iters=8, solver="riccati")[0])
t = timeit(solve, (cs, params))
print(f"mpc_tick_batched iters=8: {t*1e3:8.3f} ms")

solve15 = jax.jit(lambda c, p: convex_mpc.mpc_tick_batched(
    c, p, pattern, C.MPC_DT, horizon=H, iters=15, solver="riccati")[0])
t = timeit(solve15, (cs, params))
print(f"mpc_tick_batched iters=15:{t*1e3:8.3f} ms")

# substeps only (scan of 8), as inside the tick
dt_ll = C.MPC_DT / C.SUBSTEPS_PER_MPC_TICK
def subs_only(lp, p):
    v_anf = jax.vmap(step_mod._anchored_normal_force)
    v_sensors = jax.vmap(step_mod._sim_sensors)
    v_fb = jax.vmap(lambda c, raw, pp: step_mod.feedback_update(c, raw, pp, dt_ll))
    v_ll = jax.vmap(lambda c, pp: step_mod.lowlevel_update(c, pp, 0))
    v_sim = jax.vmap(lambda s, tt, pp: srb_sim.sim_step(s, tt, pp, dt_ll))
    def substep(carry, _):
        cs, sim = carry
        cs, tau, _ = v_ll(cs, p)
        sim = v_sim(sim, tau, p)
        grf_n = jnp.where(sim.contact,
                          v_anf(step_mod.LoopState(controller=cs, sim=sim), p), 0.0)
        cs = v_fb(cs, v_sensors(sim, p, grf_n), p)
        return (cs, sim), None
    (cs2, sim), _ = jax.lax.scan(substep, (lp.controller, lp.sim), None, length=8)
    return cs2.fbk.root_pos
t = timeit(jax.jit(subs_only), (loop, params))
print(f"8-substep scan:           {t*1e3:8.3f} ms")
t = timeit(jax.jit(fb_once), (loop, params))
print(f"single feedback+sensors:  {t*1e3:8.3f} ms")
