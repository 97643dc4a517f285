"""Ablation: time each piece of the batched MPC tick at B=4096."""
import time

import jax
import jax.numpy as jnp

from legged_mpc_control_tpu import constants as C
from legged_mpc_control_tpu.config import go1_params
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.mpc import convex_mpc, gait, riccati
from legged_mpc_control_tpu.parallel import runner

B, H, dtype = 4096, 10, jnp.float32
params1 = go1_params(dtype)
pattern = gait.trot_pattern(dtype)
loop = runner.init_loop_batch(params1, B, jax.random.PRNGKey(0), dtype=dtype)
params = step_mod.broadcast_params(params1, B)
dt_ll = C.MPC_DT / C.SUBSTEPS_PER_MPC_TICK


def timeit(fn, args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# 1. feedback once
fb = jax.jit(lambda lp, p: jax.vmap(
    lambda c, raw, pp: step_mod.feedback_update(c, raw, pp, dt_ll))(
        lp.controller,
        jax.vmap(step_mod._sim_sensors)(
            lp.sim, p,
            jnp.where(lp.sim.contact,
                      jax.vmap(step_mod._anchored_normal_force)(lp, p), 0.0)),
        p))
t = timeit(fb, (loop, params))
print(f"feedback once:      {t*1e3:8.3f} ms")
cs = fb(loop, params)

# 2. mpc_prepare vmapped
prep = jax.jit(lambda c, p: jax.vmap(
    lambda s, pp: convex_mpc.mpc_prepare(s, pp, pattern, C.MPC_DT,
                                         horizon=H))(c, p))
t = timeit(prep, (cs, params))
print(f"mpc_prepare:        {t*1e3:8.3f} ms")
cs2, stage = prep(cs, params)

# 3. riccati solve, iters 1 and 5 (slope/intercept)
for it in (1, 5):
    sol = jax.jit(lambda st, n_it=it: riccati.solve_qp_riccati(
        st.x0, st.x_ref, st.A_seq, st.B, st.contact, st.q_weights,
        st.r_weights, st.mu, st.fz_max, C.MPC_DT, iters=n_it,
        backend="pallas").u)
    t = timeit(sol, (stage,))
    print(f"riccati iters={it}:   {t*1e3:8.3f} ms")

# 4. mpc_finish
grf = jnp.zeros((B, 12), dtype)
fin = jax.jit(lambda c, g: jax.vmap(convex_mpc.mpc_finish)(c, g))
t = timeit(fin, (cs2, grf))
print(f"mpc_finish:         {t*1e3:8.3f} ms")

# 5. warm_shift
warm = jnp.zeros((B, 12 * H), dtype)
ws = jax.jit(lambda w, c: riccati.warm_shift(w, c))
t = timeit(ws, (warm, stage.contact))
print(f"warm_shift:         {t*1e3:8.3f} ms")

# 6. all 8 substeps unrolled (jitted alone)
def subs(cs, sim, p):
    v_anf = jax.vmap(step_mod._anchored_normal_force)
    v_sensors = jax.vmap(step_mod._sim_sensors)
    v_fb = jax.vmap(lambda c, raw, pp: step_mod.feedback_update(
        c, raw, pp, dt_ll, kf_type=0))
    v_ll = jax.vmap(lambda c, pp: step_mod.lowlevel_update(c, pp, 0))
    from legged_mpc_control_tpu.sim import srb_sim
    v_sim = jax.vmap(lambda ss, tt, pp: srb_sim.sim_step(ss, tt, pp, dt_ll))

    def substep(carry, _):
        cs, sim = carry
        cs, tau, _safe = v_ll(cs, p)
        sim = v_sim(sim, tau, p)
        grf_n = jnp.where(sim.contact,
                          v_anf(step_mod.LoopState(controller=cs, sim=sim),
                                p), 0.0)
        cs = v_fb(cs, v_sensors(sim, p, grf_n), p)
        return (cs, sim), None

    (cs, sim), _ = jax.lax.scan(substep, (cs, sim), None, length=8,
                                unroll=True)
    return cs, sim

sub = jax.jit(subs)
t = timeit(sub, (cs2, loop.sim, params))
print(f"8 substeps:         {t*1e3:8.3f} ms")
