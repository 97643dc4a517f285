import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np
from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.models import kinematics as kin
from legged_mpc_control_tpu.models import whole_body as wb
from legged_mpc_control_tpu.mpc import ci_mpc, lci_mpc
from legged_mpc_control_tpu.ops import so3
from legged_mpc_control_tpu.sim import terrain as terrain_mod, wb_sim

DT = jnp.float32
P = a1_params(DT).replace(mu=jnp.asarray(0.5, DT))
model = wb.a1_wb_model()
terr = terrain_mod.flat(dtype=DT)
wall = terrain_mod.wall_at_x(0.35, dtype=DT)

pos = jnp.array([0.0, 0.0, 0.32], DT)
pitch = -0.4
feet_tgt = jnp.array([[0.35, 0.13, 0.42],
                      [0.35, -0.13, 0.42],
                      [-0.17, 0.13, 0.0],
                      [-0.17, -0.13, 0.0]], DT)
# start the front feet 1.5 mm short of the wall: contact engages under the
# policy's own push instead of a placement impulse
feet_w = feet_tgt.at[0:2, 0].add(-0.0015)

# articulated initial state in the lean pose: joints from IK of the
# body-frame foot targets
cp, sp = jnp.cos(jnp.asarray(pitch, DT)), jnp.sin(jnp.asarray(pitch, DT))
R = jnp.array([[cp, 0.0, sp], [0.0, 1.0, 0.0], [-sp, 0.0, cp]], DT)
foot_rel = (feet_w - pos[None, :]) @ R          # R^T @ v, row form
q_guess = jnp.tile(jnp.array([0.0, 0.8, -1.6], DT), (4, 1))
qj = kin.ik_legs(foot_rel, q_guess, wb_sim.wb_rho_fix(model, DT))
print("IK joints:", np.asarray(qj).round(2))
fk_check = kin.fk_legs(qj, wb_sim.wb_rho_fix(model, DT))
print("IK fk err:", float(jnp.max(jnp.abs(fk_check - foot_rel))))
q0 = jnp.concatenate([pos, jnp.array([0.0, pitch, 0.0], DT), qj.reshape(-1)])
sim = wb_sim.WbSimState(q=q0, v=jnp.zeros(18, DT),
                        anchor=wb.foot_positions(q0, model)[:, :2],
                        wall_anchor=wb.foot_positions(q0, model),
                        f_contact=jnp.zeros((4, 3), DT),
                        last_acc=jnp.zeros(3, DT))

lean = ci_mpc.make_ci_lean_policy(
    P, wall, feet_tgt, pos, jnp.array([0.0, pitch, 0.0], DT), terrain=terr,
    iters=24)
stand = lci_mpc.make_stand_policy(P, body_height=0.3)
cs = step_mod.controller_init(P, dtype=DT)
cs = cs.replace(ctrl=cs.ctrl.replace(movement_mode=jnp.ones((), jnp.int32)))
loop = step_mod.LoopState(controller=cs, sim=sim)
lci = lci_mpc.lci_init(dtype=DT, policy_warm=lean.warm_init(DT))
# warm the 2-tap foot filter with the true pose (the walk tests do this by
# running 20 stand ticks first; the lean starts in mode 1 directly)
lci = lci.replace(prev_foot_pos=feet_w - pos[None, :],
                  prev_foot_vel=jnp.zeros((4, 3), DT))
tick = jax.jit(lambda lp, lc, t: step_mod.closed_loop_tick_lci_wb(
    lp, lc, P, model, stand, lean, t, terrain=terr, wall=wall))

t = 0.0
for k in range(300):
    loop, lci = tick(loop, lci, jnp.asarray(t, DT))
    t += 0.01
    if k % 50 == 0 or k == 299:
        q = np.asarray(loop.sim.q)
        fc = np.asarray(loop.sim.f_contact)
        feet_now = np.asarray(wb.foot_positions(loop.sim.q, model))
        print(f"t={t:.2f} pos={q[0:3].round(3)} pitch={q[4]:.3f} "
              f"roll={q[5]:.3f} frontfx={fc[0:2,0].round(1)} "
              f"rearfz={fc[2:4,2].round(1)} "
              f"wallgap={(0.35-feet_now[0:2,0]).round(4)}")
    if np.asarray(loop.sim.q)[2] < 0.12:
        print("FELL"); break
