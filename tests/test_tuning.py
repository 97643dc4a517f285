"""Live runtime channels: gain tuning + joystick input.

reference: BaseInterface.cpp:147-162 (low_level_gains topic, setGains.py)
and :122-145 (/joy subscription). Here both are UDP/JSON mailboxes the
control loop samples at tick boundaries — see utils/tuning.py and
interfaces/joystick.py.
"""

import time

import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.interfaces import joystick
from legged_mpc_control_tpu.utils import tuning


def _wait(pred, timeout=3.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.01)
    return False


def test_gain_update_applied():
    params = a1_params(jnp.float64)
    tuner = tuning.GainTuner(bind=("127.0.0.1", 0)).start()
    try:
        tuning.send_gains({"kp_foot": [250.0, 250.0, 300.0],
                           "kd_foot": [2.5, 2.5, 3.0]},
                          addr=tuner.addr)
        assert _wait(lambda: tuner._pending is not None)
        params2 = tuner.apply(params)
        np.testing.assert_allclose(np.asarray(params2.kp_foot),
                                   [250.0, 250.0, 300.0])
        np.testing.assert_allclose(np.asarray(params2.kd_foot),
                                   [2.5, 2.5, 3.0])
        # untouched leaves unchanged; dtype preserved (no recompile risk)
        assert params2.kp_foot.dtype == params.kp_foot.dtype
        np.testing.assert_allclose(np.asarray(params2.mass),
                                   np.asarray(params.mass))
        assert tuner.updates_applied == 1
    finally:
        tuner.close()


def test_bad_updates_rejected():
    """Unknown fields and shape mismatches must never change the pytree
    (they would retrigger compilation mid-run)."""
    params = a1_params(jnp.float64)
    tuner = tuning.GainTuner(bind=("127.0.0.1", 0)).start()
    try:
        tuning.send_gains({"not_a_field": 1.0, "kp_foot": [1.0, 2.0]},
                          addr=tuner.addr)
        assert _wait(lambda: tuner._pending is not None)
        params2 = tuner.apply(params)
        assert params2 is params or np.allclose(
            np.asarray(params2.kp_foot), np.asarray(params.kp_foot))
        assert tuner.updates_rejected >= 2
    finally:
        tuner.close()


def test_udp_joystick_frames():
    joy = joystick.UdpJoystick(bind=("127.0.0.1", 0)).start()
    try:
        joystick.send_joy(axes=[0.1, 0.0, 0.0, 0.2, 0.8],
                          buttons=[1, 0, 0, 0, 0], addr=joy.addr)
        assert _wait(lambda: joy.frames >= 1)
        axes, buttons = joy.get()
        np.testing.assert_allclose(axes[:5], [0.1, 0.0, 0.0, 0.2, 0.8])
        assert buttons[0] == 1.0
    finally:
        joy.close()


def test_joystick_drives_mode_fsm():
    """A live frame through joy_update flips stand -> walk and sets the
    velocity command (reference mode FSM, BaseInterface.cpp:165-209)."""
    from legged_mpc_control_tpu.control import joy as joy_mod
    from legged_mpc_control_tpu.control import step as step_mod

    params = a1_params(jnp.float64)
    cs = step_mod.controller_init(params, dtype=jnp.float64)
    cs = cs.replace(estimation_inited=jnp.ones((), bool))

    # press the mode button (edge), push the forward stick
    axes = np.zeros(6)
    axes[joy_mod.AXIS_VELX] = 1.0
    buttons = np.zeros(6)
    buttons[joy_mod.BUTTON_MODE] = 1.0
    cs = joy_mod.joy_update(cs, axes, buttons, 0.01, params)
    buttons[joy_mod.BUTTON_MODE] = 0.0       # release
    cs = joy_mod.joy_update(cs, axes, buttons, 0.01, params)
    assert int(cs.ctrl.movement_mode) == 1
    assert float(cs.joy.velx) > 0.4
