import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np
from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.models import kinematics as kin
from legged_mpc_control_tpu.models import whole_body as wb
from legged_mpc_control_tpu.sim import wb_sim
from legged_mpc_control_tpu.ops import so3

DT = jnp.float32
P = a1_params(DT)
model = wb.a1_wb_model()
pos = jnp.array([0.0, 0.0, 0.32], DT)
pitch = -0.4
feet_tgt = jnp.array([[0.35, 0.13, 0.42], [0.35, -0.13, 0.42],
                      [-0.17, 0.13, 0.0], [-0.17, -0.13, 0.0]], DT)
feet_w = feet_tgt.at[0:2, 0].add(-0.0015)
cp, sp = np.cos(pitch), np.sin(pitch)
R = jnp.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]], DT)
foot_rel = (feet_w - pos[None, :]) @ R
q_guess = jnp.tile(jnp.array([0.0, 0.8, -1.6], DT), (4, 1))
qj = kin.ik_legs(foot_rel, q_guess, wb_sim.wb_rho_fix(model, DT))
print("sim IK joints:", np.asarray(qj).round(3))

# controller-side IK: from measured q back to the same targets
q_ik = kin.ik_legs(foot_rel, qj, P.rho_fix)
print("ctrl IK (warm from measured):", np.asarray(q_ik).round(3))
print("branch dev:", np.abs(np.asarray(q_ik - qj)).max())

# euler/rot consistency between wb model and sensor path
q0 = jnp.concatenate([pos, jnp.array([0.0, pitch, 0.0], DT), qj.reshape(-1)])
Rwb = wb.base_rot(q0)
quat = so3.euler_to_quat(jnp.array([0.0, pitch, 0.0], DT))
Rso3 = so3.quat_to_rotmat(quat)
print("rot dev wb vs so3:", float(jnp.max(jnp.abs(Rwb - Rso3))))
feet_chk = wb.foot_positions(q0, model)
print("wb feet vs intended:", np.abs(np.asarray(feet_chk - feet_w)).max())
# rho mismatch between controller and sim model?
print("rho ctrl:\n", np.asarray(P.rho_fix).round(4))
print("rho sim:\n", np.asarray(wb_sim.wb_rho_fix(model, DT)).round(4))
