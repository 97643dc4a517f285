from legged_mpc_control_tpu.mpc import gait, qp_builder, pdip, reference
