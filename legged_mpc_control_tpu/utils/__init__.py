from legged_mpc_control_tpu.utils import bag, checkpoint
