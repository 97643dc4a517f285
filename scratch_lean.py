import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np
from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.mpc import ci_mpc
from legged_mpc_control_tpu.sim import terrain as terrain_mod

DT = jnp.float32
P = a1_params(DT)
MG = float(P.mass) * 9.81
terr = terrain_mod.flat(dtype=DT)
wall = terrain_mod.wall_at_x(0.35, dtype=DT)
H = 10
MU = 0.5

pos = jnp.array([0.0, 0.0, 0.32], DT)
eul = jnp.array([0.0, -0.4, 0.0], DT)
feet = jnp.array([[0.35, 0.13, 0.42],
                  [0.35, -0.13, 0.42],
                  [-0.17, 0.13, 0.0],
                  [-0.17, -0.13, 0.0]], DT)
z0 = jnp.concatenate([pos, eul, jnp.zeros(6, DT), feet.reshape(-1)])

refs_z, refs_u, U0 = ci_mpc.make_ci_lean_reference(
    z0, wall, feet, pos, eul, P, terr, horizon=H)
U, Z, cost = ci_mpc.ci_solve(
    z0, U0, refs_z, refs_u, terr, P.mass, P.trunk_inertia.astype(DT),
    jnp.asarray(MU, DT), iters=24, wall=wall)
f = np.asarray(U[:, 0:12]).reshape(H, 4, 3)
feet_t = np.asarray(Z[:, 12:24]).reshape(H + 1, 4, 3)
print("cost", float(cost))
print("front fn (=-fx), stage 0..9:\n", -f[:, 0:2, 0].round(1).T)
print("front fz:\n", f[:, 0:2, 2].round(1).T)
print("rear fz:\n", f[:, 2:4, 2].round(1).T)
print("rear fx:\n", f[:, 2:4, 0].round(1).T)
print("sum fz vs mg:", f[:, :, 2].sum(1).round(1), MG)
print("body pos dev:", np.abs(np.asarray(Z[:, 0:3]) - np.asarray(pos)).max(0))
print("front wall gap:", (0.35 - feet_t[:, 0:2, 0]).round(4).T)

print("=== discovery: front feet 4 cm off the wall ===")
feet2 = feet.at[0:2, 0].set(0.31)
z0b = jnp.concatenate([pos, eul, jnp.zeros(6, DT), feet2.reshape(-1)])
refs_z, refs_u, U0 = ci_mpc.make_ci_lean_reference(
    z0b, wall, feet, pos, eul, P, terr, horizon=H)
U, Z, cost = ci_mpc.ci_solve(
    z0b, U0, refs_z, refs_u, terr, P.mass, P.trunk_inertia.astype(DT),
    jnp.asarray(MU, DT), iters=24, wall=wall)
f = np.asarray(U[:, 0:12]).reshape(H, 4, 3)
feet_t = np.asarray(Z[:, 12:24]).reshape(H + 1, 4, 3)
gap_w = 0.35 - feet_t[:, 0:2, 0]
fn = -f[:, 0:2, 0]
print("front fn:\n", fn.round(1).T)
print("front wall gap:\n", gap_w.round(4).T)
print("complementarity resid:", np.abs(fn * np.maximum(gap_w[:-1], 0)).max())
