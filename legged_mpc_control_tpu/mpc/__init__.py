from legged_mpc_control_tpu.mpc import admm, gait, qp_builder, pdip, reference
