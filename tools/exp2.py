"""Quick: closed-loop ticks/s after substep-scan unroll, riccati 5/6."""
import time

import jax
import jax.numpy as jnp

from legged_mpc_control_tpu.config import go1_params
from legged_mpc_control_tpu.mpc import gait
from legged_mpc_control_tpu.parallel import runner

B, H, dtype = 4096, 10, jnp.float32
params = go1_params(dtype)
pattern = gait.trot_pattern(dtype)

for iters in (6, 5):
    roll = jax.jit(runner.make_batched_rollout(
        pattern, horizon=H, n_ticks=10, pdip_iters=iters,
        solver="riccati", backend="pallas", walk_velx=0.25))
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
    print(f"riccati iters={iters}: {tps:10,.0f} ticks/s  "
          f"vs_baseline={tps/409600:.3f}", flush=True)
