import time
import jax, jax.numpy as jnp
from legged_mpc_control_tpu.config import go1_params
from legged_mpc_control_tpu.mpc import gait
from legged_mpc_control_tpu.parallel import runner

dtype = jnp.float32
params = go1_params(dtype)
pattern = gait.trot_pattern(dtype)
loop64 = runner.init_loop_batch(params, 64, jax.random.PRNGKey(9), dtype=dtype)
ref = jax.jit(runner.make_batched_rollout(
    pattern, horizon=10, n_ticks=100, pdip_iters=20,
    solver="riccati", backend="pallas", walk_velx=0.25))(loop64, params)[0]
for it in (8, 6, 5, 4):
    probe = jax.jit(runner.make_batched_rollout(
        pattern, horizon=10, n_ticks=100, pdip_iters=it,
        solver="riccati", backend="pallas", walk_velx=0.25))(loop64, params)[0]
    dev = float(jnp.max(jnp.abs(probe.sim.pos - ref.sim.pos)))
    print(f"iters={it}: max pos dev over 100 ticks = {dev:.2e} m")
