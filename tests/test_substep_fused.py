"""The fused Pallas substep chain (ops/substep_pallas.py) computes the
same thing as the XLA substep scan it replaces in
closed_loop_tick_batched — checked in Pallas interpret mode on CPU,
starting from a mid-walk state with mixed stance/swing contacts.

Interpret-mode evaluation is per-op, so the CPU tests compare a 2-substep
chain (every substep is the same program; 2 covers the carry-over); the
full 8-substep compiled kernel is compared on real TPU in
tools/exp_fused.py and exercised by bench.py's fidelity gate."""

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu import constants as C
from legged_mpc_control_tpu.config import go1_params
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.mpc import gait
from legged_mpc_control_tpu.ops import substep_pallas
from legged_mpc_control_tpu.parallel import runner
from legged_mpc_control_tpu.sim import srb_sim

DT = jnp.float32
B = 8
DT_LL = C.MPC_DT / C.SUBSTEPS_PER_MPC_TICK


def _mid_walk_state():
    """A batch mid-trot: run a few real ticks on the XLA path so contacts,
    anchors and MPC outputs are all non-trivial."""
    params1 = go1_params(DT)
    pattern = gait.trot_pattern(DT)
    loop = runner.init_loop_batch(params1, B, jax.random.PRNGKey(3),
                                  dtype=DT)
    params = step_mod.broadcast_params(params1, B)
    warm = jnp.zeros((B, 120), DT)
    for i in range(6):
        cs = loop.controller
        mode = jnp.ones((B,), jnp.int32) if i >= 3 else jnp.zeros(
            (B,), jnp.int32)
        cs = cs.replace(
            ctrl=cs.ctrl.replace(movement_mode=mode),
            joy=cs.joy.replace(velx=jnp.full((B,), 0.25, DT)))
        loop = loop.replace(controller=cs)
        loop, warm = step_mod.closed_loop_tick_batched(
            loop, params, pattern, horizon=10, iters=10, solver="riccati",
            backend="xla", warm=warm, fused_substeps=False)
    return loop, params


def _xla_substeps(loop, params, substeps, kf_type=0):
    """The reference XLA substep scan, replicated from
    closed_loop_tick_batched's fallback path."""
    cs = loop.controller
    v_anf = jax.vmap(step_mod._anchored_normal_force)
    v_sensors = jax.vmap(step_mod._sim_sensors)
    v_fb = jax.vmap(lambda c, raw, pp: step_mod.feedback_update(
        c, raw, pp, DT_LL, kf_type=kf_type))
    v_ll = jax.vmap(lambda c, pp: step_mod.lowlevel_update(c, pp, 0))
    v_sim = jax.vmap(lambda ss, tt, pp: srb_sim.sim_step(
        ss, tt, pp, DT_LL))
    sim = loop.sim
    for _ in range(substeps):
        cs, tau, _safe = v_ll(cs, params)
        sim = v_sim(sim, tau, params)
        grf_n = jnp.where(sim.contact, v_anf(
            step_mod.LoopState(controller=cs, sim=sim), params), 0.0)
        cs = v_fb(cs, v_sensors(sim, params, grf_n), params)
    return sim, cs


def test_fused_substeps_match_xla():
    loop, params = _mid_walk_state()
    sim_ref, cs_ref = _xla_substeps(loop, params, 2)

    cs = loop.controller
    out = substep_pallas.substep_chain_fused(
        loop.sim.pos, loop.sim.quat, loop.sim.vel, loop.sim.omega,
        loop.sim.q, loop.sim.dq, loop.sim.contact, loop.sim.anchor,
        cs.ctrl.optimized_state, cs.ctrl.optimized_input,
        cs.ctrl.movement_mode, params.mass, params.mu, params.kp_foot,
        params.kd_foot, params.trunk_inertia, params.rho_fix,
        params.default_foot_pos, params.gait_counter_speed,
        params.foot_sensor_min + params.foot_sensor_ratio
        * (params.foot_sensor_max - params.foot_sensor_min),
        cs.ctrl.root_lin_vel_d_rel,
        substeps=2, dt=DT_LL, interpret=True)

    np.testing.assert_allclose(out["pos"], sim_ref.pos, atol=2e-4)
    np.testing.assert_allclose(out["quat"], sim_ref.quat, atol=2e-4)
    np.testing.assert_allclose(out["vel"], sim_ref.vel, atol=2e-3)
    np.testing.assert_allclose(out["omega"], sim_ref.omega, atol=5e-3)
    np.testing.assert_allclose(out["q"], sim_ref.q, atol=2e-3)
    np.testing.assert_allclose(out["dq"], sim_ref.dq, atol=5e-2)
    np.testing.assert_allclose(out["anchor"], sim_ref.anchor, atol=2e-4)
    assert np.array_equal(np.asarray(out["contact"]),
                          np.asarray(sim_ref.contact))
    np.testing.assert_allclose(out["q_tgt"],
                               cs_ref.ctrl.joint_ang_tgt, atol=2e-3)
    np.testing.assert_allclose(out["dq_tgt"],
                               cs_ref.ctrl.joint_vel_tgt, atol=5e-2)
    np.testing.assert_allclose(out["tau_ff"],
                               cs_ref.ctrl.joint_tau_tgt, atol=1e-2)


def test_fused_substeps_kf1_match_xla():
    """Estimator-in-the-loop variant: the in-kernel 18-state KF and the
    estimate-consuming low-level must reproduce the XLA kf_type=1 substep
    scan — filter state included (VERDICT r4 directive: the estimator
    belongs inside the benched fast path; reference runs estimation every
    feedback tick, BaseInterface.cpp:404-449)."""
    loop, params = _mid_walk_state()
    pattern = gait.trot_pattern(DT)
    # initialize + settle the filter on the XLA path (first kf1 feedback
    # seeds kf_fresh; a few ticks converge the covariance)
    warm = jnp.zeros((B, 120), DT)
    for _ in range(3):
        loop, warm = step_mod.closed_loop_tick_batched(
            loop, params, pattern, horizon=10, iters=10, solver="riccati",
            backend="xla", warm=warm, kf_type=1, fused_substeps=False)
    sim_ref, cs_ref = _xla_substeps(loop, params, 2, kf_type=1)

    cs = loop.controller
    out = substep_pallas.substep_chain_fused(
        loop.sim.pos, loop.sim.quat, loop.sim.vel, loop.sim.omega,
        loop.sim.q, loop.sim.dq, loop.sim.contact, loop.sim.anchor,
        cs.ctrl.optimized_state, cs.ctrl.optimized_input,
        cs.ctrl.movement_mode, params.mass, params.mu, params.kp_foot,
        params.kd_foot, params.trunk_inertia, params.rho_fix,
        params.default_foot_pos, params.gait_counter_speed,
        params.foot_sensor_min + params.foot_sensor_ratio
        * (params.foot_sensor_max - params.foot_sensor_min),
        cs.ctrl.root_lin_vel_d_rel,
        substeps=2, dt=DT_LL, kf_type=1, kf_x=cs.kf.x, kf_P=cs.kf.P,
        interpret=True)

    np.testing.assert_allclose(out["pos"], sim_ref.pos, atol=2e-4)
    np.testing.assert_allclose(out["quat"], sim_ref.quat, atol=2e-4)
    np.testing.assert_allclose(out["vel"], sim_ref.vel, atol=2e-3)
    np.testing.assert_allclose(out["q"], sim_ref.q, atol=2e-3)
    assert np.array_equal(np.asarray(out["contact"]),
                          np.asarray(sim_ref.contact))
    # the filter state itself
    np.testing.assert_allclose(out["kf_x"], cs_ref.kf.x, atol=2e-3)
    np.testing.assert_allclose(out["kf_P"], cs_ref.kf.P,
                               rtol=2e-3, atol=2e-4)
    # controller-visible estimates
    np.testing.assert_allclose(out["kf_x"][:, 0:3], cs_ref.fbk.root_pos,
                               atol=2e-3)
    np.testing.assert_allclose(out["kf_x"][:, 3:6],
                               cs_ref.fbk.root_lin_vel, atol=5e-3)


def test_fused_substeps_odd_batch_padding():
    """Batch not a lanes multiple: padded lanes must not contaminate."""
    loop, params = _mid_walk_state()
    take = 3

    def head(x):
        return x[:take]

    sub_loop = jax.tree.map(head, loop)
    sub_params = jax.tree.map(head, params)
    sim_ref, _ = _xla_substeps(sub_loop, sub_params, 2)
    cs = sub_loop.controller
    out = substep_pallas.substep_chain_fused(
        sub_loop.sim.pos, sub_loop.sim.quat, sub_loop.sim.vel,
        sub_loop.sim.omega, sub_loop.sim.q, sub_loop.sim.dq,
        sub_loop.sim.contact, sub_loop.sim.anchor,
        cs.ctrl.optimized_state, cs.ctrl.optimized_input,
        cs.ctrl.movement_mode, sub_params.mass, sub_params.mu,
        sub_params.kp_foot, sub_params.kd_foot, sub_params.trunk_inertia,
        sub_params.rho_fix, sub_params.default_foot_pos,
        sub_params.gait_counter_speed,
        sub_params.foot_sensor_min + sub_params.foot_sensor_ratio
        * (sub_params.foot_sensor_max - sub_params.foot_sensor_min),
        cs.ctrl.root_lin_vel_d_rel, substeps=2, dt=DT_LL,
        interpret=True)
    np.testing.assert_allclose(out["pos"], sim_ref.pos, atol=2e-4)
    np.testing.assert_allclose(out["q"], sim_ref.q, atol=2e-3)


def test_fused_feedback_block_matches_feedback_update():
    """The kernel's FB_ROWS feedback block == feedback_update on the same
    final state (what the carry_feedback rollout substitutes for the
    XLA feedback pass)."""
    loop, params = _mid_walk_state()
    sim_ref, cs_ref = _xla_substeps(loop, params, 2)

    cs = loop.controller
    thresh = (params.foot_sensor_min + params.foot_sensor_ratio
              * (params.foot_sensor_max - params.foot_sensor_min))
    out = substep_pallas.substep_chain_fused(
        loop.sim.pos, loop.sim.quat, loop.sim.vel, loop.sim.omega,
        loop.sim.q, loop.sim.dq, loop.sim.contact, loop.sim.anchor,
        cs.ctrl.optimized_state, cs.ctrl.optimized_input,
        cs.ctrl.movement_mode, params.mass, params.mu, params.kp_foot,
        params.kd_foot, params.trunk_inertia, params.rho_fix,
        params.default_foot_pos, params.gait_counter_speed, thresh,
        cs.ctrl.root_lin_vel_d_rel, substeps=2, dt=DT_LL,
        interpret=True)
    sim_out = srb_sim.SimState(
        pos=out["pos"], quat=out["quat"], vel=out["vel"],
        omega=out["omega"], q=out["q"], dq=out["dq"],
        contact=out["contact"], anchor=out["anchor"],
        last_acc=out["last_acc"])
    got = step_mod.unpack_fused_feedback(cs, sim_out, out, params)

    ref_fbk, got_fbk = cs_ref.fbk, got.fbk
    for name, tol in (("root_euler", 1e-4), ("root_rot_mat", 1e-4),
                      ("root_ang_vel", 5e-3), ("foot_pos_rel", 2e-3),
                      ("foot_pos_abs", 2e-3), ("foot_pos_world", 2e-3),
                      ("foot_vel_rel", 6e-2), ("foot_vel_world", 6e-2),
                      ("jac_foot", 2e-3), ("foot_force_sensor", 0.5),
                      ("foot_contact_flag", 0.05),
                      ("foot_force_tau_est", 0.5),
                      ("imu_acc", 5e-2), ("imu_ang_vel", 5e-3)):
        np.testing.assert_allclose(
            np.asarray(getattr(got_fbk, name)),
            np.asarray(getattr(ref_fbk, name)), atol=tol,
            err_msg=name)
    np.testing.assert_allclose(
        np.asarray(got.ctrl.foot_pos_target_world),
        np.asarray(cs_ref.ctrl.foot_pos_target_world), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(got.ctrl.foot_pos_target_abs),
        np.asarray(cs_ref.ctrl.foot_pos_target_abs), atol=2e-3)
