from legged_mpc_control_tpu.estimation import basic_kf, ekf
