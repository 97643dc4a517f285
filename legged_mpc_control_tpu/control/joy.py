"""Joystick processing + operator mode FSM.

Functional equivalent of the reference's joystick handling
(reference: src/legged_ctrl/src/interfaces/BaseInterface.cpp:122-209 —
`joy_callback` maps gamepad axes/buttons into `LeggedJoyCmd`, and
`joy_update` runs the stand<->walk mode FSM, integrates commanded body
height, and honors the exit button).

Everything here is pure and jittable: the "callback" becomes an explicit
(axes, buttons) input to the control step, and edge detection keeps the
previous button state inside `JoyCmd` instead of a mutable member.
"""

from typing import Any, NamedTuple

import jax.numpy as jnp

from legged_mpc_control_tpu.config import RobotParams
from legged_mpc_control_tpu.types import ControllerState, JoyCmd

# Gamepad mapping (Xbox-style, reference: BaseInterface.cpp:124-145)
AXIS_YAW = 0          # left stick horizontal -> yaw rate
AXIS_HEIGHT = 1       # left stick vertical   -> body height rate (velz)
AXIS_VELY = 3         # right stick horizontal -> lateral velocity
AXIS_VELX = 4         # right stick vertical   -> forward velocity
BUTTON_MODE = 0       # A: toggle stand <-> walk (reference: :171-186)
BUTTON_EXIT = 4       # LB: request shutdown (reference: :141-144, 166-168)

# command scales (reference: LeggedParam joystick_* yaml keys,
# LeggedState.cpp and JOY_CMD_*_MAX usage in BaseInterface.cpp:126-139)
VELX_MAX = 0.5
VELY_MAX = 0.3
YAW_RATE_MAX = 0.8
HEIGHT_RATE = 0.1     # m/s of body-height change at full stick


def joy_process(joy: JoyCmd, axes, buttons, dt,
                params: RobotParams) -> JoyCmd:
    """Map raw gamepad state into the command struct and run the mode FSM.

    Args:
      axes: (>=5,) float array, sticks in [-1, 1].
      buttons: (>=5,) {0,1} int/float array.
    """
    dtype = joy.body_height.dtype
    axes = jnp.asarray(axes, dtype=dtype)
    buttons = jnp.asarray(buttons)

    velx = axes[AXIS_VELX] * VELX_MAX
    vely = axes[AXIS_VELY] * VELY_MAX
    yaw_rate = axes[AXIS_YAW] * YAW_RATE_MAX
    velz = axes[AXIS_HEIGHT] * HEIGHT_RATE
    # body-height integration with clamping
    # (reference: BaseInterface.cpp:190-199)
    height = jnp.clip(joy.body_height + velz * dt,
                      params.min_body_height, params.max_body_height)

    # stand <-> walk toggle on the mode button's rising edge
    # (reference: ctrl_state_change_request, BaseInterface.cpp:171-186)
    mode_btn = buttons[BUTTON_MODE] > 0
    rising = mode_btn & ~joy.prev_mode_button.astype(bool)
    ctrl_state = jnp.where(rising, 1 - joy.ctrl_state, joy.ctrl_state)

    exit_btn = buttons[BUTTON_EXIT] > 0
    exit_flag = joy.exit_flag.astype(bool) | exit_btn

    return joy.replace(
        velx=velx, vely=vely, velz=velz, yaw_rate=yaw_rate,
        body_height=height, ctrl_state=ctrl_state.astype(joy.ctrl_state.dtype),
        prev_mode_button=mode_btn.astype(joy.prev_mode_button.dtype),
        exit_flag=exit_flag.astype(joy.exit_flag.dtype),
    )


def joy_update(cs: ControllerState, axes, buttons, dt,
               params: RobotParams) -> ControllerState:
    """Full joy tick: process the gamepad and drive `movement_mode`
    (reference: joy_update inside ctrl_update, BaseInterface.cpp:165-209;
    walk requires estimation to be initialized, :176-180)."""
    joy = joy_process(cs.joy, axes, buttons, dt, params)
    want_walk = (joy.ctrl_state == 1) & cs.estimation_inited
    movement_mode = jnp.where(want_walk, 1, 0).astype(
        cs.ctrl.movement_mode.dtype)
    return cs.replace(joy=joy,
                      ctrl=cs.ctrl.replace(movement_mode=movement_mode))
