from legged_mpc_control_tpu.parallel import mesh, runner
