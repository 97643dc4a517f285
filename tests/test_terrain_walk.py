"""Long-horizon box-stepping (BASELINE config 4): H=30 MPC, time-varying
contact sequence, height-map footholds, closed loop onto raised terrain.

The reference demonstrates box-stepping with its CI-MPC backend
(reference: README.md:14) and its FSM discovers terrain height at touchdown
(reference: LeggedContactFSM.cpp:86-90); here the planner sees an explicit
height field (sim/terrain.py): Raibert footholds snap to the map, the sim
anchors feet on it, and the operator/planner layer rides the height command
on the local ground. Covered here: stepping UP onto a 4 cm platform and
climbing two stairs at the reference's full H=30 horizon. (Stepping down a
ledge mid-trot is quasi-statically unstable in the anchored-contact SRB sim
and is left to a future whole-body treatment.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.mpc import gait
from legged_mpc_control_tpu.sim import srb_sim, terrain as terrain_mod

DTYPE = jnp.float64


def _run(terrain, n_ticks, horizon=30, velx=0.2):
    """Closed loop through the batched (B=1) Riccati path with a
    terrain-following height command. Uses the standing_trot gait — the
    4-stance-phase pattern the reference's gait.info provides for exactly
    this rough-terrain regime (a flight-free trot cannot stabilize ledge
    climbs quasi-statically)."""
    params = a1_params(DTYPE)
    pattern = gait.named_pattern("standing_trot", DTYPE)
    loop = step_mod.LoopState(
        controller=jax.tree.map(
            lambda x: x[None],
            step_mod.controller_init(params, dtype=DTYPE,
                                     body_height=0.3)),
        sim=jax.tree.map(
            lambda x: x[None],
            srb_sim.sim_init(params, height=0.3, dtype=DTYPE,
                             terrain=terrain)))
    pb = step_mod.broadcast_params(params, 1)
    warm = None
    for _ in range(5):
        loop, warm = step_mod.closed_loop_tick_batched(
            loop, pb, pattern, horizon=horizon, iters=12,
            solver="riccati", terrain=terrain)
    cs = loop.controller
    cs = cs.replace(ctrl=cs.ctrl.replace(
        movement_mode=jnp.ones((1,), jnp.int32)))
    loop = loop.replace(controller=cs)
    for _ in range(n_ticks):
        g_now = terrain_mod.height_at(terrain, loop.sim.pos[0, :2])
        cs = loop.controller
        cs = cs.replace(joy=cs.joy.replace(
            velx=jnp.full((1,), velx, DTYPE),
            body_height=(0.3 + g_now)[None]))
        loop = loop.replace(controller=cs)
        loop, warm = step_mod.closed_loop_tick_batched(
            loop, pb, pattern, horizon=horizon, iters=12,
            solver="riccati", terrain=terrain)
    return loop


def test_platform_step_up_h30():
    """Trot up onto a 3 cm platform and keep trotting on top (H=30).
    (3 cm at 0.15 m/s is the stable envelope of the quasi-static trot in
    the anchored-contact sim; higher ledges need a dynamic gait.)"""
    terrain = terrain_mod.flat(extent=3.0, cell=0.05, dtype=DTYPE)
    terrain = terrain_mod.add_box(terrain, center_xy=(1.3, 0.0),
                                  size_xy=(2.2, 2.0), height=0.03)
    loop = _run(terrain, n_ticks=300, velx=0.15)

    x = float(loop.sim.pos[0, 0])
    z = float(loop.sim.pos[0, 2])
    eul = np.asarray(loop.controller.fbk.root_euler[0])
    ground = float(terrain_mod.height_at(terrain, loop.sim.pos[0, :2]))
    assert x > 0.4, x                       # well onto the platform
    assert ground > 0.025, ground           # body is over the raised top
    assert z - ground > 0.17, (z, ground)   # riding at height above it
    assert abs(eul[0]) < 0.25 and abs(eul[1]) < 0.25, eul
    # feet anchored ON the platform, not at z=0
    anchors = np.asarray(loop.sim.anchor[0])
    on_top = anchors[:, 0] > 0.25
    assert np.all(anchors[on_top, 2] > 0.02), anchors


def test_stairs_climb_h30():
    """Climb two 3 cm stairs with H=30 + height-map footholds."""
    terrain = terrain_mod.stairs(n_steps=2, step_height=0.025,
                                 step_depth=0.8, start_x=0.25, dtype=DTYPE)
    loop = _run(terrain, n_ticks=300, velx=0.15)
    x = float(loop.sim.pos[0, 0])
    z = float(loop.sim.pos[0, 2])
    ground = float(terrain_mod.height_at(terrain, loop.sim.pos[0, :2]))
    assert x > 0.26, x
    assert ground > 0.02, ground            # climbed at least one step
    assert z - ground > 0.17, (z, ground)
