"""Experiment: closed-loop tick throughput vs solver config on the chip.

For each (solver, iters): measure B=4096 ticks/s AND the fidelity deviation
vs a 20-iteration riccati run over 100 ticks (the bench gate)."""
import time

import jax
import jax.numpy as jnp

from legged_mpc_control_tpu.config import go1_params
from legged_mpc_control_tpu.mpc import gait
from legged_mpc_control_tpu.parallel import runner

B, H, dtype = 4096, 10, jnp.float32
params = go1_params(dtype)
pattern = gait.trot_pattern(dtype)

# fidelity reference: 20-iter riccati, 100 ticks, B=64
loop64 = runner.init_loop_batch(params, 64, jax.random.PRNGKey(9), dtype=dtype)
ref_out = jax.jit(runner.make_batched_rollout(
    pattern, horizon=H, n_ticks=100, pdip_iters=20,
    solver="riccati", backend="pallas", walk_velx=0.25))(loop64, params)[0]
jax.block_until_ready(ref_out)

configs = [("riccati", 6), ("riccati", 5), ("riccati", 4), ("riccati", 3),
           ("admm", 30), ("admm", 20)]
for solver, iters in configs:
    t_start = time.perf_counter()
    probe = jax.jit(runner.make_batched_rollout(
        pattern, horizon=H, n_ticks=100, pdip_iters=iters,
        solver=solver, backend="pallas", walk_velx=0.25))(loop64, params)[0]
    dev = float(jnp.max(jnp.abs(probe.sim.pos - ref_out.sim.pos)))

    roll = jax.jit(runner.make_batched_rollout(
        pattern, horizon=H, n_ticks=10, pdip_iters=iters,
        solver=solver, backend="pallas", walk_velx=0.25))
    variants = [(runner.init_loop_batch(params, B, jax.random.PRNGKey(k),
                                        dtype=dtype), params)
                for k in range(2)]
    out = roll(*variants[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    n = 4
    for i in range(n):
        out = roll(*variants[i % 2])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    tps = B * 10 / dt
    print(f"{solver:8s} iters={iters:2d}: {tps:10,.0f} ticks/s  "
          f"vs_baseline={tps/409600:.3f}  fidelity_dev={dev*1e3:.2f} mm  "
          f"(wall {time.perf_counter()-t_start:.0f}s)", flush=True)
