"""THE wall-lean capability test (reference: README.md:14 — "our CI-MPC
controller can enable Go1 to trot, step on boxes, and lean against wall").

The contact-implicit engine (mpc/ci_mpc.make_ci_lean_policy) holds a
two-surface lean on the ARTICULATED whole-body simulator: front feet
pressed against a vertical wall (sim/terrain.Wall), rear feet on the
ground, body pitched nose-up, torques acting through full rigid-body
dynamics with compliant wall/ground contact
(control/step.closed_loop_tick_lci_wb(wall=...)).

What makes this hard (and what the policy design encodes — see the
docstrings in make_ci_lean_policy / make_ci_lean_reference):
  * wall feet carry weight only through FRICTION, so the equilibrium
    family is parameterized by the wall-normal preload and its
    minimal-force member rides the friction cone;
  * the controller's deliberately-mismatched leg geometry reads as
    millimeter-scale "penetration" that complementarity would otherwise
    monetize (contact-aided foot correction);
  * zero-velocity references let compliant-contact force surplus
    integrate into pose drift (restoring velocity references).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_mpc_control_tpu.config import a1_params, go1_params
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.models import kinematics as kin
from legged_mpc_control_tpu.models import whole_body as wb
from legged_mpc_control_tpu.mpc import ci_mpc, lci_mpc
from legged_mpc_control_tpu.sim import terrain as terrain_mod
from legged_mpc_control_tpu.sim import wb_sim

DT = jnp.float32
PITCH = -0.4
WALL_X = 0.35


def _lean_setup(robot="a1"):
    """Robot at mu=0.6 (rubber-on-wall; the reference's 0.3 is a
    conservative flat-ground value), front feet 1.5 mm short of the wall
    plane so contact engages under the policy's own press, not a
    placement impulse. Parameterized over A1 AND Go1 — the reference's
    claim is Go1-specific (README.md:14 \"enable Go1 to ... lean against
    wall\"); the lean geometry (wall at x=0.35, rear feet at -0.17) is
    reachable for both robots' leg envelopes."""
    model = wb.wb_model_for(robot)
    base = a1_params(DT) if robot == "a1" else go1_params(DT)
    params = base.replace(mu=jnp.asarray(0.6, DT))
    terr = terrain_mod.flat(dtype=DT)
    wall = terrain_mod.wall_at_x(WALL_X, dtype=DT)
    pos = jnp.array([0.0, 0.0, 0.32], DT)
    feet_tgt = jnp.array([[WALL_X, 0.13, 0.42],
                          [WALL_X, -0.13, 0.42],
                          [-0.17, 0.13, 0.0],
                          [-0.17, -0.13, 0.0]], DT)
    feet_w = feet_tgt.at[0:2, 0].add(-0.0015)
    cp, sp = jnp.cos(jnp.asarray(PITCH, DT)), jnp.sin(jnp.asarray(PITCH, DT))
    R = jnp.array([[cp, 0.0, sp], [0.0, 1.0, 0.0], [-sp, 0.0, cp]], DT)
    foot_rel = (feet_w - pos[None, :]) @ R
    qj = kin.ik_legs(foot_rel,
                     jnp.tile(jnp.array([0.0, 0.8, -1.6], DT), (4, 1)),
                     wb_sim.wb_rho_fix(model, DT))
    q0 = jnp.concatenate([pos, jnp.array([0.0, PITCH, 0.0], DT),
                          qj.reshape(-1)])
    sim = wb_sim.WbSimState(q=q0, v=jnp.zeros(18, DT),
                            anchor=wb.foot_positions(q0, model)[:, :2],
                            wall_anchor=wb.foot_positions(q0, model),
                            f_contact=jnp.zeros((4, 3), DT),
                            last_acc=jnp.zeros(3, DT))
    return params, model, terr, wall, pos, feet_tgt, feet_w, sim


@pytest.mark.parametrize("robot", ["a1", "go1"])
def test_ci_wall_lean_closed_loop(robot):
    """Hold the lean for 2.5 s of closed loop: both front feet sustain
    wall-normal force the whole time, the nose-up pitch is held, roll
    stays small, and the body never collapses — the reference's wall-lean
    capability, on the robot the reference claims it for (Go1,
    README.md:14) and on A1, torque-level on articulated dynamics."""
    params, model, terr, wall, pos, feet_tgt, feet_w, sim = _lean_setup(
        robot)
    lean = ci_mpc.make_ci_lean_policy(
        params, wall, feet_tgt, pos, jnp.array([0.0, PITCH, 0.0], DT),
        terrain=terr, iters=24)
    stand = lci_mpc.make_stand_policy(params, body_height=0.3)
    cs = step_mod.controller_init(params, dtype=DT)
    cs = cs.replace(ctrl=cs.ctrl.replace(
        movement_mode=jnp.ones((), jnp.int32)))
    loop = step_mod.LoopState(controller=cs, sim=sim)
    lci = lci_mpc.lci_init(dtype=DT, policy_warm=lean.warm_init(DT))
    # warm the 2-tap foot filter with the true pose (the walk tests get
    # this from 20 stand ticks; the lean starts in mode 1 directly)
    lci = lci.replace(prev_foot_pos=feet_w - pos[None, :],
                      prev_foot_vel=jnp.zeros((4, 3), DT))
    tick = jax.jit(lambda lp, lc, t: step_mod.closed_loop_tick_lci_wb(
        lp, lc, params, model, stand, lean, t, terrain=terr, wall=wall))

    t = 0.0
    hist = []
    for _ in range(250):                       # 2.5 s at the 100 Hz seam
        loop, lci = tick(loop, lci, jnp.asarray(t, DT))
        t += 0.01
        q = np.asarray(loop.sim.q)
        fc = np.asarray(loop.sim.f_contact)
        # wall normal is -x: the wall pushes the robot back, so the
        # robot's press shows up as negative f_contact x on front feet
        hist.append([q[2], q[4], q[5], -fc[0, 0], -fc[1, 0]])
        assert q[2] > 0.2, f"collapsed at t={t:.2f}"
    h = np.array(hist)

    # pitch held nose-up the WHOLE run (>= 1 s is the capability bar;
    # this holds 2.5 s)
    assert np.all(h[:, 1] < -0.25), h[:, 1].max()
    assert np.all(h[:, 1] > -0.55), h[:, 1].min()
    assert np.abs(h[:, 2]).max() < 0.1, "roll"
    # sustained wall-normal force on BOTH leaning feet: after the 0.2 s
    # contact-engagement transient, never below 8 N, averaging ~20 N
    settled = h[20:]
    assert settled[:, 3].min() > 8.0, settled[:, 3].min()
    assert settled[:, 4].min() > 8.0, settled[:, 4].min()
    assert settled[:, 3].mean() > 15.0
    assert settled[:, 4].mean() > 15.0
    # body stays in the lean envelope
    assert 0.30 < h[:, 0].min() and h[:, 0].max() < 0.45


def test_ci_lean_plan_is_equilibrium():
    """Open-loop sanity: from the exact lean pose the CI solve returns a
    torque-balanced plan — wall press ~ preload, rear feet carrying the
    weight, and the planned body pose flat across the horizon."""
    params, model, terr, wall, pos, feet_tgt, feet_w, sim = _lean_setup()
    eul = jnp.array([0.0, PITCH, 0.0], DT)
    z0 = jnp.concatenate([pos, eul, jnp.zeros(6, DT), feet_tgt.reshape(-1)])
    refs_z, refs_u, U0 = ci_mpc.make_ci_lean_reference(
        z0, wall, feet_tgt, pos, eul, params, terr, horizon=10)
    U, Z, _ = ci_mpc.ci_solve(
        z0, U0, refs_z, refs_u, terr, params.mass,
        params.trunk_inertia.astype(DT), params.mu, iters=24, wall=wall)
    f = np.asarray(U[:, 0:12]).reshape(10, 4, 3)
    # front feet press the wall (world -x force from the robot => the
    # planned foot force +x is INTO the wall... the plan stores the force
    # ON the robot, so wall-normal components are negative x)
    assert np.all(-f[:, 0:2, 0] > 8.0), (-f[:, 0:2, 0]).min()
    # rear feet carry most of the weight
    mg = float(params.mass) * 9.81
    assert np.all(f[:, 2:4, 2].sum(axis=1) > 0.7 * mg)
    # the plan's own rollout holds the pose (no drift the closed loop
    # would inherit)
    assert np.abs(np.asarray(Z[:, 4]) - PITCH).max() < 0.02
    assert np.abs(np.asarray(Z[:, 2]) - 0.32).max() < 0.01
