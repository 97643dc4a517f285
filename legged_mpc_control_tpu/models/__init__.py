from legged_mpc_control_tpu.models import kinematics, srb
