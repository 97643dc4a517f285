"""Closed-loop validation of the gait.info 4-beat walking gaits on the
SRB sim: dynamic_walk and static_walk carry the robot forward at the
commanded speed without falling. These gaits cycle through 2-foot lateral
support phases the trot never sees, so attitude excursions are larger
than trot's — the assertions bound survival and progress, not trot-grade
polish (the reference only ever *defines* these sequences for its unused
OCS2 path, gait.info; here they actually run)."""

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.mpc import gait
from legged_mpc_control_tpu.sim import srb_sim

DTYPE = jnp.float64


def _run(name, velx, n_ticks):
    params = a1_params(DTYPE)
    pattern = gait.named_pattern(name, DTYPE)
    loop = step_mod.LoopState(
        controller=step_mod.controller_init(params, dtype=DTYPE,
                                            body_height=0.3),
        sim=srb_sim.sim_init(params, height=0.3, dtype=DTYPE))
    for _ in range(20):
        loop = step_mod.closed_loop_tick(loop, params, pattern, horizon=10)
    cs = loop.controller
    cs = cs.replace(
        ctrl=cs.ctrl.replace(movement_mode=jnp.ones((), jnp.int32)),
        joy=cs.joy.replace(velx=jnp.asarray(velx, DTYPE)))
    loop = loop.replace(controller=cs)
    worst_rp = 0.0
    z_min = 1.0
    for _ in range(n_ticks):
        loop = step_mod.closed_loop_tick(loop, params, pattern, horizon=10)
        e = np.asarray(loop.controller.fbk.root_euler)
        worst_rp = max(worst_rp, abs(float(e[0])), abs(float(e[1])))
        z_min = min(z_min, float(loop.sim.pos[2]))
    return loop, worst_rp, z_min


def test_dynamic_walk_closed_loop():
    loop, worst_rp, z_min = _run("dynamic_walk", 0.1, 200)
    p = np.asarray(loop.sim.pos)
    assert p[0] > 0.25, p[0]
    assert 0.2 < p[2] < 0.35, p[2]
    assert z_min > 0.18, z_min
    assert worst_rp < 0.45, worst_rp


def test_static_walk_closed_loop():
    loop, worst_rp, z_min = _run("static_walk", 0.1, 200)
    p = np.asarray(loop.sim.pos)
    assert p[0] > 0.2, p[0]
    assert 0.2 < p[2] < 0.35, p[2]
    assert z_min > 0.18, z_min
    assert worst_rp < 0.5, worst_rp
