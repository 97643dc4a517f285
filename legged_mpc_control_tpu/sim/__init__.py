from legged_mpc_control_tpu.sim import srb_sim
