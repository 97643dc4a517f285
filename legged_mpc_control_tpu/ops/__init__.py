from legged_mpc_control_tpu.ops import so3, bezier, filters
