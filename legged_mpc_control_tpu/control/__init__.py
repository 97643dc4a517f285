from legged_mpc_control_tpu.control import (
    low_level,
    raibert,
    safety,
    sensors,
)
