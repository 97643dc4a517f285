"""Safety envelope: the command gate before actuation.

reference: include/utils/LeggedSafetyChecker.hpp:17-32 — |roll| < 1 rad,
|pitch| < 3 rad, max joint velocity < 30 rad/s. The reference fail-stops the
process (main.cpp:149-155); in the batched functional design the check
returns a mask so individual scenarios can be frozen/flagged instead of
killing the fleet.
"""

import jax.numpy as jnp

ROLL_LIMIT = 1.0
PITCH_LIMIT = 3.0
JOINT_VEL_LIMIT = 30.0


def is_safe(root_euler, joint_vel):
    return ((jnp.abs(root_euler[..., 0]) <= ROLL_LIMIT)
            & (jnp.abs(root_euler[..., 1]) <= PITCH_LIMIT)
            & (jnp.max(joint_vel, axis=-1) <= JOINT_VEL_LIMIT))


def gate_torques(tau, safe):
    """Zero torques for unsafe scenarios (the reference blocks send_cmd,
    GazeboInterface.cpp:80-87)."""
    return jnp.where(safe, tau, jnp.zeros_like(tau))
