"""Host-side robot I/O interfaces — the edge of the functional core.

The reference's interface layer (`BaseInterface` -> `GazeboInterface` /
`HardwareInterface`, reference: src/legged_ctrl/include/interfaces/
BaseInterface.h:31-43) is where ROS topics / Unitree UDP meet the
controller. In the TPU-native design the controller itself is a pure jitted
function; these classes are thin host adapters that (a) produce the
`sensors_raw` dict the control step consumes and (b) transmit its joint
commands. The simulation backend runs entirely on device (the fast path for
batched training/benchmarks); the hardware backend talks to the native C++
real-time runtime (native/realtime.cpp) over its seqlock'd packet channel.
"""

from legged_mpc_control_tpu.interfaces.base import BaseInterface
from legged_mpc_control_tpu.interfaces.sim_iface import SimInterface
from legged_mpc_control_tpu.interfaces.hardware import (
    HardwareInterface,
    internal_to_unitree_joints,
    unitree_to_internal_joints,
    position_protect,
    power_protect,
)
