"""TPU check of the fused substep kernel: compiled-kernel equivalence at
the full 8-substep chain, then closed-loop throughput with it enabled."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
import time

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu import constants as C
from legged_mpc_control_tpu.config import go1_params
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.mpc import gait
from legged_mpc_control_tpu.ops import substep_pallas
from legged_mpc_control_tpu.parallel import runner
from legged_mpc_control_tpu.sim import srb_sim

DT = jnp.float32
DT_LL = C.MPC_DT / C.SUBSTEPS_PER_MPC_TICK

# --- equivalence on chip: 8 substeps, B=256, mid-walk state ---
B = 256
params1 = go1_params(DT)
pattern = gait.trot_pattern(DT)
loop = runner.init_loop_batch(params1, B, jax.random.PRNGKey(3), dtype=DT)
params = step_mod.broadcast_params(params1, B)
warm = jnp.zeros((B, 120), DT)
for i in range(6):
    cs = loop.controller
    mode = (jnp.ones if i >= 3 else jnp.zeros)((B,), jnp.int32)
    cs = cs.replace(ctrl=cs.ctrl.replace(movement_mode=mode),
                    joy=cs.joy.replace(velx=jnp.full((B,), 0.25, DT)))
    loop = loop.replace(controller=cs)
    loop, warm = step_mod.closed_loop_tick_batched(
        loop, params, pattern, horizon=10, iters=10, solver="riccati",
        backend="pallas", warm=warm, fused_substeps=False)

cs = loop.controller
v_anf = jax.vmap(step_mod._anchored_normal_force)
v_sensors = jax.vmap(step_mod._sim_sensors)
v_fb = jax.vmap(lambda c, raw, pp: step_mod.feedback_update(
    c, raw, pp, DT_LL, kf_type=0))
v_ll = jax.vmap(lambda c, pp: step_mod.lowlevel_update(c, pp, 0))
v_sim = jax.vmap(lambda ss, tt, pp: srb_sim.sim_step(ss, tt, pp, DT_LL))


@jax.jit
def xla_sub(cs, sim, params):
    for _ in range(8):
        cs, tau, _ = v_ll(cs, params)
        sim = v_sim(sim, tau, params)
        grf_n = jnp.where(sim.contact, v_anf(
            step_mod.LoopState(controller=cs, sim=sim), params), 0.0)
        cs = v_fb(cs, v_sensors(sim, params, grf_n), params)
    return sim, cs


sim_ref, cs_ref = xla_sub(cs, loop.sim, params)
out = substep_pallas.substep_chain_fused(
    loop.sim.pos, loop.sim.quat, loop.sim.vel, loop.sim.omega,
    loop.sim.q, loop.sim.dq, loop.sim.contact, loop.sim.anchor,
    cs.ctrl.optimized_state, cs.ctrl.optimized_input,
    cs.ctrl.movement_mode, params.mass, params.mu, params.kp_foot,
    params.kd_foot, params.trunk_inertia, params.rho_fix,
    params.default_foot_pos, params.gait_counter_speed,
    params.foot_sensor_min + params.foot_sensor_ratio
    * (params.foot_sensor_max - params.foot_sensor_min),
    cs.ctrl.root_lin_vel_d_rel, substeps=8, dt=DT_LL)
for k, ref, tol in (("pos", sim_ref.pos, 5e-4), ("quat", sim_ref.quat, 5e-4),
                    ("vel", sim_ref.vel, 5e-3)):
    dev = float(jnp.max(jnp.abs(out[k] - ref)))
    print(f"equiv {k}: max dev {dev:.2e} (tol {tol})")
    assert dev < tol, k
# legs whose contact make/break flipped at the 1 N release threshold under
# f32 reordering take a DIFFERENT (stance vs swing) joint path — compare
# joints only on contact-agreeing legs, and bound the number of flips
agree = np.asarray(out["contact"] == sim_ref.contact)     # (B,4)
nmis = int((~agree).sum())
print(f"contact mismatches: {nmis}/{B*4}")
assert nmis <= B // 16
mask = np.repeat(agree, 3, axis=1)                        # (B,12)
# joint-level tolerance is loose by design: swing-leg joint chains are
# marginally damped and contact/IK-branch ties amplify f32 reordering
# noise — the SEMANTIC equivalence claim is the tight body-state match
# above plus bench.py's fused-vs-XLA distribution gate
for k, ref, tol in (("q", sim_ref.q, 5e-2), ("dq", sim_ref.dq, 1e1),
                    ("anchor", sim_ref.anchor.reshape(B, 12), 5e-3)):
    o = np.asarray(out[k]).reshape(B, 12)
    r = np.asarray(ref).reshape(B, 12)
    dev = float(np.abs((o - r) * mask).max())
    print(f"equiv {k} (contact-agreeing legs): max dev {dev:.2e} "
          f"(tol {tol})")
    assert dev < tol, k

# --- throughput with the fused path on ---
B = 4096
for iters in (5, 4):
    roll = jax.jit(runner.make_batched_rollout(
        pattern, horizon=10, n_ticks=10, pdip_iters=iters,
        solver="riccati", backend="pallas", walk_velx=0.25))
    variants = [(runner.init_loop_batch(params1, B, jax.random.PRNGKey(k),
                                        dtype=DT), params1)
                for k in range(2)]
    outv = roll(*variants[0])
    jax.block_until_ready(outv)
    t0 = time.perf_counter()
    n = 4
    for i in range(n):
        outv = roll(*variants[i % 2])
    jax.block_until_ready(outv)
    dtm = (time.perf_counter() - t0) / n
    tps = B * 10 / dtm
    print(f"fused iters={iters}: {tps:10,.0f} ticks/s  "
          f"vs_baseline={tps/409600:.3f}", flush=True)
