import sys

from legged_mpc_control_tpu.main import main

sys.exit(main())
