"""LCI-MPC backend: x40 packing, mode clock, stand + walk closed loop.

reference: src/legged_ctrl/src/mpc_ctrl/ci_mpc/LciMpc.cpp:45-153 — the
policy-seam contract (x in R^40, output in R^78, mode-switch clock reset,
2-tap filters) plus the framework's own stand/walk policies filling the
slot (the reference's Julia engine is an empty submodule).
"""

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.mpc import lci_mpc
from legged_mpc_control_tpu.sim import srb_sim

DTYPE = jnp.float64
PARAMS = a1_params(DTYPE)


def _controller_with_sensors():
    cs = step_mod.controller_init(PARAMS, dtype=DTYPE)
    sim = srb_sim.sim_init(PARAMS, height=0.3, dtype=DTYPE)
    raw = srb_sim.read_sensors(sim, PARAMS)
    raw["foot_force_sensor"] = jnp.full(4, 30.0, DTYPE)
    cs = step_mod.feedback_update(cs, raw, PARAMS, 0.00125, kf_type=0)
    return cs


def test_x40_packing_golden():
    """x = [pos(3), rpy(3), foot_pos(12) | v(3), w(3), foot_vel(12) |
    foot_force(4)] with 2-tap averaging (reference: LciMpc.cpp:62-92)."""
    cs = _controller_with_sensors()
    lci = lci_mpc.lci_init(dtype=DTYPE)
    prev_fp = jnp.arange(12, dtype=DTYPE).reshape(4, 3) * 0.01
    lci = lci.replace(prev_foot_pos=prev_fp)
    x, fp, fv = lci_mpc.pack_policy_state(cs.fbk, lci)
    assert x.shape == (40,)
    np.testing.assert_allclose(np.asarray(x[0:3]),
                               np.asarray(cs.fbk.root_pos))
    np.testing.assert_allclose(np.asarray(x[3:6]),
                               np.asarray(cs.fbk.root_euler))
    # 2-tap filter: mean of current and previous foot positions
    np.testing.assert_allclose(
        np.asarray(x[6:18]).reshape(4, 3),
        0.5 * (np.asarray(cs.fbk.foot_pos_abs) + np.asarray(prev_fp)))
    np.testing.assert_allclose(np.asarray(x[18:21]),
                               np.asarray(cs.fbk.root_lin_vel))
    np.testing.assert_allclose(np.asarray(x[21:24]),
                               np.asarray(cs.fbk.root_ang_vel))
    np.testing.assert_allclose(np.asarray(x[36:40]),
                               np.asarray(cs.fbk.foot_force_sensor))


def test_mode_switch_resets_policy_clock():
    """reference: LciMpc.cpp:46-59 — movement-mode change zeroes the
    policy time."""
    cs = _controller_with_sensors()
    lci = lci_mpc.lci_init(dtype=DTYPE).replace(
        policy_time=jnp.asarray(3.7, DTYPE))
    stand = lci_mpc.make_stand_policy(PARAMS)
    walk = lci_mpc.make_walk_policy(PARAMS)

    # same mode: clock advances
    _, lci2 = lci_mpc.lci_mpc_tick(cs, lci, stand, walk, 0.0, 0.01)
    assert float(lci2.policy_time) == 3.71

    # switch to walk: clock resets
    cs_walk = cs.replace(ctrl=cs.ctrl.replace(
        movement_mode=jnp.ones((), jnp.int32)))
    _, lci3 = lci_mpc.lci_mpc_tick(cs_walk, lci2, stand, walk, 0.0, 0.01)
    assert float(lci3.policy_time) == 0.0


def test_policy_output_contract():
    """Both built-in policies return the R^78 layout the seam unpacks
    (reference: LciMpc.cpp:118-139)."""
    cs = _controller_with_sensors()
    lci = lci_mpc.lci_init(dtype=DTYPE)
    x, _, _ = lci_mpc.pack_policy_state(cs.fbk, lci)
    for make in (lci_mpc.make_stand_policy, lci_mpc.make_walk_policy):
        out = make(PARAMS)(x, jnp.asarray(0.1, DTYPE))
        assert out.shape == (lci_mpc.OUT_DIM,)
        assert bool(jnp.all(jnp.isfinite(out)))
        # stand: vertical force carries the weight
        fz = float(jnp.sum(out[2:12:3]))
        assert 0.3 * 9.8 * float(PARAMS.mass) < fz < 2.0 * 9.8 * float(
            PARAMS.mass)


def test_lci_closed_loop_stand_and_walk():
    """Stand holds height; switching to walk makes forward progress —
    the reference's stand/walk policy switching (LciMpc.cpp:95-104) through
    the full closed loop."""
    stand = lci_mpc.make_stand_policy(PARAMS, body_height=0.3)
    walk = lci_mpc.make_walk_policy(PARAMS, velx=0.25, body_height=0.3)
    loop = step_mod.LoopState(
        controller=step_mod.controller_init(PARAMS, dtype=DTYPE),
        sim=srb_sim.sim_init(PARAMS, height=0.3, dtype=DTYPE))
    lci = lci_mpc.lci_init(dtype=DTYPE)

    t = 0.0
    for _ in range(20):
        loop, lci = step_mod.closed_loop_tick_lci(
            loop, lci, PARAMS, stand, walk, jnp.asarray(t, DTYPE))
        t += 0.01
    z_stand = float(loop.sim.pos[2])
    assert 0.27 < z_stand < 0.33, z_stand

    cs = loop.controller
    cs = cs.replace(ctrl=cs.ctrl.replace(
        movement_mode=jnp.ones((), jnp.int32)))
    loop = loop.replace(controller=cs)
    x0 = float(loop.sim.pos[0])
    for _ in range(60):
        loop, lci = step_mod.closed_loop_tick_lci(
            loop, lci, PARAMS, stand, walk, jnp.asarray(t, DTYPE))
        t += 0.01
    dx = float(loop.sim.pos[0]) - x0
    z = float(loop.sim.pos[2])
    eul = np.asarray(loop.controller.fbk.root_euler)
    assert dx > 0.05, dx
    assert z > 0.2, z
    assert abs(eul[0]) < 0.2 and abs(eul[1]) < 0.2, eul
