"""Gait engine tests: phase schedule, transitions, prediction, swing curve."""

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.mpc import gait

DTYPE = jnp.float64
SPEED = jnp.asarray(3.5, DTYPE)   # A1 gait_counter_speed
DT = 0.01

LEGS = jnp.arange(4, dtype=jnp.int32)


def init_states(pattern):
    return jax.vmap(gait.gait_leg_init, in_axes=(None, 0, None))(
        pattern, LEGS, DTYPE)


def run(pattern, states, n, foot_pos=None, target=None, force=None):
    foot_pos = foot_pos if foot_pos is not None else jnp.zeros((4, 3), DTYPE)
    target = target if target is not None else jnp.zeros((4, 3), DTYPE)
    force = force if force is not None else jnp.zeros((4,), dtype=bool)
    upd = jax.jit(jax.vmap(
        gait.gait_leg_update, in_axes=(0, None, 0, None, None, 0, 0, 0)))
    hist = []
    for _ in range(n):
        states = upd(states, pattern, LEGS, DT, SPEED, foot_pos, target,
                     force)
        hist.append(np.asarray(jax.vmap(gait.get_contact_state)(states)))
    return states, np.stack(hist)


def test_trot_schedule_alternates_diagonals():
    pattern = gait.trot_pattern(DTYPE)
    states = init_states(pattern)
    # one full gait cycle = 1/3.5 s ~ 28.6 ticks of 10 ms
    _, hist = run(pattern, states, 29)
    # first half-cycle: FL(0), RR(3) stance; FR(1), RL(2) swing
    assert hist[0].tolist() == [1.0, 0.0, 0.0, 1.0]
    # after switching at phase 0.5 (~tick 15): roles flip
    assert hist[15].tolist() == [0.0, 1.0, 1.0, 0.0]
    # one full cycle later: back to start
    assert hist[28].tolist() == [1.0, 0.0, 0.0, 1.0]


def test_stand_pattern_always_stance():
    pattern = gait.stand_pattern(DTYPE)
    states = init_states(pattern)
    _, hist = run(pattern, states, 50)
    assert np.all(hist == 1.0)


def test_phase_wraps_and_repeats():
    pattern = gait.trot_pattern(DTYPE)
    states = init_states(pattern)
    states, _ = run(pattern, states, 300)     # ~10.5 gait cycles
    # phase stays bounded by the wrap at cycle end
    assert float(jnp.max(states.phase)) < 1.5


def test_predict_contact_matches_future_schedule():
    """predict_contact_state(dt) must equal the schedule at phase+speed*dt
    (reference: LeggedContactFSM.cpp:280-294)."""
    pattern = gait.trot_pattern(DTYPE)
    states = init_states(pattern)
    states, _ = run(pattern, states, 7)       # mid first stance segment
    predict = jax.jit(jax.vmap(
        gait.predict_contact_state, in_axes=(0, None, 0, None, None)))
    # predict across a fine grid and compare to the pattern table directly
    for steps_ahead in range(0, 30):
        dt_ahead = steps_ahead * DT
        got = np.asarray(predict(states, pattern, LEGS, dt_ahead, SPEED))
        ph = np.asarray(states.phase) + float(SPEED) * dt_ahead
        ph = np.where(ph > 1.0, ph - np.ceil(ph - 1.0), ph)
        for leg in range(4):
            sw = np.asarray(pattern.switch_time[leg])
            st = np.asarray(pattern.seg_state[leg])
            n = int(pattern.n_seg[leg])
            idx = next((i for i in range(n) if ph[leg] <= sw[i]), n - 1)
            assert got[leg] == float(st[idx] == gait.STANCE), (
                steps_ahead, leg, ph[leg])


def test_swing_follows_bezier_and_lands():
    pattern = gait.trot_pattern(DTYPE)
    states = init_states(pattern)
    start = jnp.zeros((4, 3), DTYPE)
    target = jnp.tile(jnp.array([0.15, 0.0, 0.0], DTYPE), (4, 1))
    # run through a full cycle; swing feet should travel toward target with
    # positive clearance mid-swing
    upd = jax.jit(jax.vmap(
        gait.gait_leg_update, in_axes=(0, None, 0, None, None, 0, 0, 0)))
    max_z = 0.0
    end_of_swing_x = 0.0
    for i in range(29):
        states = upd(states, pattern, LEGS, DT, SPEED, start, target,
                     jnp.zeros((4,), dtype=bool))
        max_z = max(max_z, float(jnp.max(states.target_pos[:, 2])))
        # leg 1 (FR) swings during phase [0, 0.5): record its commanded
        # position while still in swing (touchdown resets the target to the
        # measured foot position, reference: LeggedContactFSM.cpp:236-240)
        if int(states.state[1]) == gait.SWING:
            end_of_swing_x = max(end_of_swing_x,
                                 float(states.target_pos[1, 0]))
    assert max_z > 0.05                       # cleared the ground
    assert abs(end_of_swing_x - 0.15) < 0.02  # reached the foothold


def test_early_contact_transition():
    """>90% through swing + force flag -> immediate stance
    (reference: LeggedContactFSM.cpp:61-66)."""
    pattern = gait.trot_pattern(DTYPE)
    states = init_states(pattern)
    # FR (leg 1) swings during phase [0, 0.5): run to ~95% of swing
    states, _ = run(pattern, states, 13)
    assert float(gait.get_contact_state(
        jax.tree.map(lambda x: x[1], states))) == 0.0
    # now signal contact force on all legs
    upd = jax.vmap(
        gait.gait_leg_update, in_axes=(0, None, 0, None, None, 0, 0, 0))
    states2 = upd(states, pattern, LEGS, DT, SPEED,
                  jnp.zeros((4, 3), DTYPE), jnp.zeros((4, 3), DTYPE),
                  jnp.ones((4,), dtype=bool))
    assert float(gait.get_contact_state(
        jax.tree.map(lambda x: x[1], states2))) == 1.0


def test_reset_behavior():
    pattern = gait.trot_pattern(DTYPE)
    states = init_states(pattern)
    states, _ = run(pattern, states, 10)
    reset = jax.vmap(gait.gait_leg_reset, in_axes=(0, None, 0))(
        states, pattern, LEGS)
    assert float(jnp.max(jnp.abs(reset.phase))) == 0.0
    np.testing.assert_array_equal(np.asarray(reset.pattern_idx), 0)
