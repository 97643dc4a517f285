"""On-device simulation interface — the Gazebo-equivalent backend.

The reference's `GazeboInterface` subscribes to sim topics and publishes
per-joint torques (reference: src/legged_ctrl/src/interfaces/
GazeboInterface.cpp:9-118). Here the simulator is itself a jitted function
(sim/srb_sim.py), so the "interface" keeps the whole loop device-resident:
`tick()` advances controller + world one MPC period with zero host<->device
round trips. `fbk_update`/`send_cmd` are provided for API parity with the
hardware backend (they pull/push through the same dict schema), but the fast
path is `tick`.
"""

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.config import RobotParams
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.interfaces.base import BaseInterface
from legged_mpc_control_tpu.mpc import gait as gait_mod
from legged_mpc_control_tpu.sim import srb_sim


class SimInterface(BaseInterface):
    def __init__(self, params: RobotParams, pattern=None, *,
                 dtype=jnp.float32, height=0.3, body_height=0.3,
                 horizon=10, kf_type=0, pdip_iters=15, mpc_type="convex",
                 low_level_type=0, walk_velx=0.25):
        self.params = params
        self.pattern = pattern or gait_mod.trot_pattern(dtype)
        self.horizon = horizon
        self.kf_type = kf_type
        self.pdip_iters = pdip_iters
        self.mpc_type = mpc_type
        self.low_level_type = low_level_type
        self.t = 0.0
        self.loop = step_mod.LoopState(
            controller=step_mod.controller_init(params, dtype=dtype,
                                                body_height=body_height),
            sim=srb_sim.sim_init(params, height=height, dtype=dtype))
        if mpc_type in ("lci", "ci"):
            # LCI backend seam (reference: main.cpp:113-121 mpc_type 0):
            # "lci" = the distilled convex walk policy; "ci" = the true
            # contact-implicit trajectory optimizer (mpc/ci_mpc.py),
            # warm-started across ticks through LciState.policy_warm
            from legged_mpc_control_tpu.mpc import lci_mpc

            self._stand_policy = lci_mpc.make_stand_policy(
                params, body_height=body_height)
            if mpc_type == "ci":
                from legged_mpc_control_tpu.mpc import ci_mpc

                self._walk_policy = ci_mpc.make_ci_walk_policy(
                    params, velx=walk_velx, body_height=body_height)
                self.lci = lci_mpc.lci_init(
                    dtype=dtype,
                    policy_warm=self._walk_policy.warm_init(dtype))
            else:
                self._walk_policy = lci_mpc.make_walk_policy(
                    params, velx=walk_velx, body_height=body_height)
                self.lci = lci_mpc.lci_init(dtype=dtype)

    def tick(self, n: int = 1):
        """Advance n MPC periods fully on device."""
        from legged_mpc_control_tpu import constants as C

        for _ in range(n):
            if self.mpc_type in ("lci", "ci"):
                self.loop, self.lci = step_mod.closed_loop_tick_lci(
                    self.loop, self.lci, self.params,
                    self._stand_policy, self._walk_policy,
                    jnp.asarray(self.t, self.loop.sim.pos.dtype),
                    kf_type=self.kf_type,
                    low_level_type=self.low_level_type)
            else:
                self.loop = step_mod.closed_loop_tick(
                    self.loop, self.params, self.pattern,
                    horizon=self.horizon, kf_type=self.kf_type,
                    low_level_type=self.low_level_type,
                    pdip_iters=self.pdip_iters)
            self.t += C.MPC_DT
        return self.loop

    # --- BaseInterface parity surface ---
    def fbk_update(self) -> Optional[Dict[str, np.ndarray]]:
        raw = srb_sim.read_sensors(self.loop.sim, self.params)
        return {k: np.asarray(v) for k, v in raw.items()}

    def send_cmd(self, q_tgt, dq_tgt, tau_ff, kp, kd) -> bool:
        """Apply one low-level PD step to the sim world (the reference's
        Gazebo path computes tau = kp(q_d-q)+kd(dq_d-dq)+tau_ff manually,
        GazeboInterface.cpp:99-118)."""
        s = self.loop.sim
        tau = (jnp.asarray(kp) * (jnp.asarray(q_tgt) - s.q)
               + jnp.asarray(kd) * (jnp.asarray(dq_tgt) - s.dq)
               + jnp.asarray(tau_ff))
        from legged_mpc_control_tpu import constants as C
        self.loop = self.loop.replace(
            sim=srb_sim.sim_step(s, tau, self.params, C.LOW_LEVEL_DT))
        return True
