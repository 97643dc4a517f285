"""Wall-lean closed-loop debugging: per-tick policy internals."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.models import kinematics as kin
from legged_mpc_control_tpu.models import whole_body as wb
from legged_mpc_control_tpu.mpc import ci_mpc, lci_mpc
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
feet_w = feet_tgt.at[0:2, 0].add(-0.0015)

cp, sp = jnp.cos(jnp.asarray(pitch, DT)), jnp.sin(jnp.asarray(pitch, DT))
R = jnp.array([[cp, 0.0, sp], [0.0, 1.0, 0.0], [-sp, 0.0, cp]], DT)
foot_rel = (feet_w - pos[None, :]) @ R
q_guess = jnp.tile(jnp.array([0.0, 0.8, -1.6], DT), (4, 1))
qj = kin.ik_legs(foot_rel, q_guess, wb_sim.wb_rho_fix(model, DT))
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
lci = lci.replace(prev_foot_pos=feet_w - pos[None, :],
                  prev_foot_vel=jnp.zeros((4, 3), DT))
tick = jax.jit(lambda lp, lc, t: step_mod.closed_loop_tick_lci_wb(
    lp, lc, P, model, stand, lean, t, terrain=terr, wall=wall))

probe = jax.jit(lambda x, t, w: lean(x, t, w))

t = 0.0
for k in range(80):
    loop, lci = tick(loop, lci, jnp.asarray(t, DT))
    t += 0.01
    if k % 5 == 0:
        q = np.asarray(loop.sim.q)
        fc = np.asarray(loop.sim.f_contact)
        fbk = loop.controller.fbk
        x40, _, _ = lci_mpc.pack_policy_state(fbk, lci)
        out, _w = probe(x40, jnp.asarray(t, DT), lci.policy_warm)
        u = np.asarray(out[0:12]).reshape(4, 3)
        ftgt = np.asarray(out[12 + 6:30]).reshape(4, 3)
        feet_now = np.asarray(wb.foot_positions(loop.sim.q, model))
        gap_w = 0.35 - feet_now[:, 0]
        opti = np.asarray(loop.controller.ctrl.optimized_input[0:12]
                          ).reshape(4, 3)
        print(f"t={t:.2f} z={q[2]:.3f} x={q[0]:+.3f} pitch={q[4]:+.3f} "
              f"roll={q[5]:+.3f}")
        print(f"   sim fc fx={fc[:,0].round(1)} fz={fc[:,2].round(1)}")
        print(f"   cmd u  fx={u[:,0].round(1)} fz={u[:,2].round(1)} "
              f"(applied fx={opti[:,0].round(1)} fz={opti[:,2].round(1)})")
        print(f"   wallgap={gap_w.round(4)[:2]} "
              f"foot_z={feet_now[:,2].round(3)} "
              f"ftgt_x={ftgt[:,0].round(3)[:2]} "
              f"sensor={np.asarray(fbk.foot_force_sensor).round(1)}")
    if np.asarray(loop.sim.q)[2] < 0.12:
        print("FELL")
        break
