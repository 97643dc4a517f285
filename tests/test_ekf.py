"""EKF tests (reference surface: CasadiEKF / A1KFCombineLOWithFootTerrain,
BaseInterface.cpp:404-449, HardwareInterface.cpp:203-228)."""

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.estimation import ekf
from legged_mpc_control_tpu.models import kinematics as kin
from legged_mpc_control_tpu.ops import so3

DTYPE = jnp.float64
PARAMS = a1_params(DTYPE)
DT = 0.00125
QUAT_ID = jnp.array([1.0, 0.0, 0.0, 0.0], DTYPE)


def standing_fk(height=0.3):
    foot_rel = PARAMS.default_foot_pos.at[:, 2].set(-height)
    q_guess = jnp.tile(jnp.array([0.0, 0.8, -1.6], DTYPE), (4, 1))
    q = kin.ik_legs(foot_rel, q_guess, PARAMS.rho_fix)
    return kin.fk_legs(q, PARAMS.rho_fix)


def _static_inputs():
    foot_rel = standing_fk(0.3)
    imu_acc = jnp.array([0.0, 0.0, 9.81], DTYPE)
    gyro = jnp.zeros(3, DTYPE)
    vel_rel = jnp.zeros((4, 3), DTYPE)
    contacts = jnp.ones(4, DTYPE)
    return foot_rel, imu_acc, gyro, vel_rel, contacts


def test_static_convergence():
    """Stationary robot with a wrong initial height: estimate converges to
    the kinematically-consistent pose."""
    foot_rel, imu_acc, gyro, vel_rel, contacts = _static_inputs()
    pos0 = jnp.array([0.0, 0.0, 0.3], DTYPE)
    st = ekf.ekf_init(QUAT_ID, pos0, foot_rel, dtype=DTYPE)
    st = st.replace(x=st.x.at[2].set(0.12))   # corrupt the height

    step = jax.jit(lambda s: ekf.ekf_update(
        s, DT, imu_acc, gyro, foot_rel, vel_rel, contacts))
    for _ in range(2000):
        st, pos, vel, eul = step(st)
    np.testing.assert_allclose(float(pos[2]), 0.3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(vel), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(eul), 0.0, atol=1e-3)


def test_roll_pitch_error_corrected():
    """A corrupted roll/pitch estimate must be pulled back by IMU + leg
    odometry (this is what BasicKF cannot do — attitude is in the EKF
    state)."""
    foot_rel, imu_acc, gyro, vel_rel, contacts = _static_inputs()
    pos0 = jnp.array([0.0, 0.0, 0.3], DTYPE)
    st = ekf.ekf_init(QUAT_ID, pos0, foot_rel, dtype=DTYPE)
    st = st.replace(x=st.x.at[6].set(0.08).at[7].set(-0.06))

    step = jax.jit(lambda s: ekf.ekf_update(
        s, DT, imu_acc, gyro, foot_rel, vel_rel, contacts))
    for _ in range(4000):
        st, pos, vel, eul = step(st)
    np.testing.assert_allclose(np.asarray(eul[:2]), 0.0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(vel), 0.0, atol=5e-3)


def test_velocity_tracking_from_leg_odometry():
    foot_rel, imu_acc, gyro, _, contacts = _static_inputs()
    pos0 = jnp.array([0.0, 0.0, 0.3], DTYPE)
    st = ekf.ekf_init(QUAT_ID, pos0, foot_rel, dtype=DTYPE)
    v_true = jnp.array([0.5, 0.0, 0.0], DTYPE)
    vel_rel = jnp.tile(-v_true, (4, 1))   # stance feet skate backwards

    step = jax.jit(lambda s: ekf.ekf_update(
        s, DT, imu_acc, gyro, foot_rel, vel_rel, contacts))
    for _ in range(1500):
        st, pos, vel, eul = step(st)
    # x velocity tracks tightly; the skating scenario (stance feet that
    # slide) leaves a small steady-state z coupling through the foot states
    np.testing.assert_allclose(float(vel[0]), 0.5, atol=5e-3)
    np.testing.assert_allclose(np.asarray(vel[1:]), 0.0, atol=2e-2)


def test_swing_leg_noise_rejected():
    foot_rel, imu_acc, gyro, vel_rel, _ = _static_inputs()
    contacts = jnp.array([1.0, 0.0, 0.0, 1.0], DTYPE)
    vel_rel = vel_rel.at[1].set(jnp.array([50.0, -50.0, 30.0], DTYPE))
    vel_rel = vel_rel.at[2].set(jnp.array([-40.0, 20.0, -30.0], DTYPE))
    pos0 = jnp.array([0.0, 0.0, 0.3], DTYPE)
    st = ekf.ekf_init(QUAT_ID, pos0, foot_rel, dtype=DTYPE)

    step = jax.jit(lambda s: ekf.ekf_update(
        s, DT, imu_acc, gyro, foot_rel, vel_rel, contacts))
    for _ in range(800):
        st, pos, vel, eul = step(st)
    np.testing.assert_allclose(np.asarray(vel), 0.0, atol=5e-3)


def test_mocap_fusion_corrects_yaw_and_position():
    """Yaw is unobservable from flat-ground leg odometry; the OptiTrack
    update must pull yaw and xy position to the mocap pose
    (reference: update_filter_with_opti, HardwareInterface.cpp:221-227)."""
    foot_rel, imu_acc, gyro, vel_rel, contacts = _static_inputs()
    pos0 = jnp.array([0.0, 0.0, 0.3], DTYPE)
    st = ekf.ekf_init(QUAT_ID, pos0, foot_rel, dtype=DTYPE)
    st = st.replace(x=st.x.at[8].set(0.4).at[0].set(1.0))  # yaw+x corrupt

    opti_pos = jnp.array([0.0, 0.0, 0.3], DTYPE)
    opti_eul = jnp.zeros(3, DTYPE)
    step = jax.jit(lambda s: ekf.ekf_update(
        s, DT, imu_acc, gyro, foot_rel, vel_rel, contacts))
    opti = jax.jit(lambda s: ekf.ekf_update_with_opti(s, opti_pos, opti_eul))
    for i in range(1000):
        st, pos, vel, eul = step(st)
        if i % 8 == 0:          # mocap at ~100 Hz vs 800 Hz proprioception
            st = opti(st)
    np.testing.assert_allclose(float(eul[2]), 0.0, atol=2e-3)
    np.testing.assert_allclose(float(pos[0]), 0.0, atol=2e-3)


def test_yaw_innovation_wraps():
    """Mocap yaw across the +-pi seam must not produce a 2*pi jerk."""
    foot_rel, *_ = _static_inputs()
    pos0 = jnp.array([0.0, 0.0, 0.3], DTYPE)
    st = ekf.ekf_init(QUAT_ID, pos0, foot_rel, dtype=DTYPE)
    st = st.replace(x=st.x.at[8].set(3.1))
    opti_eul = jnp.array([0.0, 0.0, -3.1], DTYPE)   # same heading, wrapped
    st2 = ekf.ekf_update_with_opti(st, pos0, opti_eul)
    # innovation is ~+0.083 rad, not -6.2: yaw must move toward pi, not 0
    assert float(st2.x[8]) > 3.1


def test_closed_loop_standing_with_ekf():
    """kf_type 2 in the fused control step: the robot balances on the SRB
    sim with the EKF (not ground truth) in the loop, and the estimate tracks
    the true base state (reference dispatch: BaseInterface.cpp:414-446)."""
    from legged_mpc_control_tpu.control import step as step_mod
    from legged_mpc_control_tpu.mpc import gait
    from legged_mpc_control_tpu.sim import srb_sim

    pattern = gait.trot_pattern(DTYPE)
    loop = step_mod.LoopState(
        controller=step_mod.controller_init(PARAMS, dtype=DTYPE,
                                            body_height=0.3),
        sim=srb_sim.sim_init(PARAMS, height=0.3, dtype=DTYPE))
    for _ in range(40):   # 0.4 s
        loop = step_mod.closed_loop_tick(loop, PARAMS, pattern,
                                         horizon=5, kf_type=2,
                                         pdip_iters=10)
    assert float(loop.sim.pos[2]) > 0.25
    est_pos = np.asarray(loop.controller.fbk.root_pos)
    true_pos = np.asarray(loop.sim.pos)
    np.testing.assert_allclose(est_pos, true_pos, atol=5e-3)
    est_eul = np.asarray(loop.controller.fbk.root_euler)
    np.testing.assert_allclose(est_eul[:2], 0.0, atol=3e-2)


def test_vmap_over_scenarios():
    foot_rel, imu_acc, gyro, vel_rel, contacts = _static_inputs()
    pos0 = jnp.array([0.0, 0.0, 0.3], DTYPE)
    sts = jax.vmap(lambda _: ekf.ekf_init(QUAT_ID, pos0, foot_rel,
                                          dtype=DTYPE))(jnp.arange(4))
    out = jax.vmap(lambda s: ekf.ekf_update(
        s, DT, imu_acc, gyro, foot_rel, vel_rel, contacts))(sts)
    assert out[1].shape == (4, 3)
    assert out[3].shape == (4, 3)


def test_terrain_state_tracks_a_step():
    """The foot+terrain refinement (A1KFCombineLOWithFootTerrain): a foot
    standing on a 5 cm block should pull its terrain state to ~0.05 while
    the others stay near 0 — without corrupting the body-height estimate."""
    height = 0.3
    # FL stands on a 5 cm block: its leg is 5 cm shorter in z
    foot_rel = standing_fk(height)
    foot_rel = foot_rel.at[0, 2].add(0.05)
    imu_acc = jnp.array([0.0, 0.0, 9.81], DTYPE)
    gyro = jnp.zeros(3, DTYPE)
    vel_rel = jnp.zeros((4, 3), DTYPE)
    contacts = jnp.ones(4, DTYPE)

    pos0 = jnp.array([0.0, 0.0, height + 0.025], DTYPE)
    st = ekf.ekf_init(QUAT_ID, pos0, foot_rel, dtype=DTYPE)
    # the level-ground prior must not win against persistent evidence:
    # loosen it by running with assume_flat_ground True (default weak prior)
    step = jax.jit(lambda s: ekf.ekf_update(
        s, DT, imu_acc, gyro, foot_rel, vel_rel, contacts))
    for _ in range(2000):
        st, pos, vel, eul = step(st)
    terrain = np.asarray(st.x[21:25])
    # FL's terrain clearly above the others
    assert terrain[0] > terrain[1:].max() + 0.02, terrain
    assert abs(terrain[1:].mean()) < 0.02, terrain
    # small residual velocity bias is expected: the level-ground prior and
    # the block are in steady conflict on the stepped foot
    np.testing.assert_allclose(np.asarray(vel), 0.0, atol=1e-2)


def test_kf2_mocap_fused_closed_loop_walk():
    """kf_type=2 (EKF) with simulated-mocap fusion in the full closed
    loop, WALKING (reference: GazeboInterface.cpp:147-177 degrades gt odom
    into mocap for the EKF; BaseInterface.cpp:414-446 runs it in the
    loop)."""
    from legged_mpc_control_tpu.control import step as step_mod
    from legged_mpc_control_tpu.mpc import gait
    from legged_mpc_control_tpu.sim import srb_sim
    from legged_mpc_control_tpu.ops import so3 as so3_mod

    params = PARAMS
    pattern = gait.trot_pattern(DTYPE)
    loop = step_mod.LoopState(
        controller=step_mod.controller_init(params, dtype=DTYPE),
        sim=srb_sim.sim_init(params, height=0.3, dtype=DTYPE))
    rng = np.random.default_rng(0)

    def tick(loop, walk):
        cs = loop.controller
        if walk:
            cs = cs.replace(
                ctrl=cs.ctrl.replace(
                    movement_mode=jnp.ones((), jnp.int32)),
                joy=cs.joy.replace(velx=jnp.asarray(0.2, DTYPE)))
            loop = loop.replace(controller=cs)
        # inject simulated mocap (gt pose + 1 mm / 1 mrad noise) into the
        # sensor dict the EKF consumes
        raw = srb_sim.read_sensors(loop.sim, params)
        raw["foot_force_sensor"] = jnp.where(
            loop.sim.contact, 40.0, 0.0).astype(DTYPE)
        raw["mocap_pos"] = loop.sim.pos + jnp.asarray(
            rng.normal(0, 1e-3, 3), DTYPE)
        raw["mocap_euler"] = (so3_mod.quat_to_euler(loop.sim.quat)
                              + jnp.asarray(rng.normal(0, 1e-3, 3), DTYPE))
        cs = step_mod.feedback_update(loop.controller, raw, params,
                                      0.00125, kf_type=2)
        loop = loop.replace(controller=cs)
        return step_mod.closed_loop_tick(
            loop, params, pattern, horizon=5, kf_type=2, pdip_iters=10)

    for i in range(10):
        loop = tick(loop, walk=False)
    x0 = float(loop.sim.pos[0])
    for i in range(40):
        loop = tick(loop, walk=True)

    est_pos = np.asarray(loop.controller.fbk.root_pos)
    gt_pos = np.asarray(loop.sim.pos)
    est_eul = np.asarray(loop.controller.fbk.root_euler)
    gt_eul = np.asarray(so3_mod.quat_to_euler(loop.sim.quat))
    # estimator tracks ground truth while walking; robot makes progress
    assert np.max(np.abs(est_pos - gt_pos)) < 0.01, (est_pos, gt_pos)
    assert np.max(np.abs(est_eul - gt_eul)) < 0.02, (est_eul, gt_eul)
    assert float(loop.sim.pos[0]) - x0 > 0.03
    assert gt_pos[2] > 0.17   # quasi-static trot sag (see verify notes)
