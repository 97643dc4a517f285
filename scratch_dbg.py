import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np
from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.mpc import ci_mpc
from legged_mpc_control_tpu.sim import terrain as terrain_mod

DT = jnp.float32
P = a1_params(DT).replace(mu=jnp.asarray(0.5, DT))
terr = terrain_mod.flat(dtype=DT)
wall = terrain_mod.wall_at_x(0.35, dtype=DT)
pos = jnp.array([0.0, 0.0, 0.32], DT)
pitch = -0.4
feet_tgt = jnp.array([[0.35, 0.13, 0.42], [0.35, -0.13, 0.42],
                      [-0.17, 0.13, 0.0], [-0.17, -0.13, 0.0]], DT)
feet_w = feet_tgt.at[0:2, 0].add(-0.0015)
lean = ci_mpc.make_ci_lean_policy(
    P, wall, feet_tgt, pos, jnp.array([0.0, pitch, 0.0], DT), terrain=terr,
    iters=24)
x = jnp.concatenate([pos, jnp.array([0.0, pitch, 0.0], DT),
                     (feet_w - pos[None, :]).reshape(-1),
                     jnp.zeros(6, DT), jnp.zeros(12, DT),
                     jnp.zeros(4, DT)])
out, warm = lean(x, jnp.asarray(0.0, DT), lean.warm_init(DT))
u = np.asarray(out[0:12]).reshape(4, 3)
sd = np.asarray(out[12:30])
vd = np.asarray(out[30:48])
print("u (GRF cmd):\n", u.round(1))
print("foot targets:\n", sd[6:18].reshape(4,3).round(4))
print("foot vel tgt:\n", vd[6:18].reshape(4,3).round(3))
print("body pos/eul des:", sd[0:3].round(3), sd[3:6].round(3))
