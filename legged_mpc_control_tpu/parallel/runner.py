"""Batched scenario runner: domain-randomized closed-loop sweeps.

Covers BASELINE.json configs 3 and 5: thousands of randomized Go1/A1
scenarios (mass, friction, gait speed, initial state) vmapped on one chip
and sharded over a mesh across chips/hosts. The controller+sim loop state is
a pytree, so the whole rollout is `scan(vmap(tick))` under one jit with the
scenario axis sharded.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from legged_mpc_control_tpu import constants as C
from legged_mpc_control_tpu.config import RobotParams
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.mpc import gait as gait_mod
from legged_mpc_control_tpu.parallel.mesh import (
    BATCH_AXIS,
    batch_sharding,
    scenario_mesh,
    shard_scenarios,
)
from legged_mpc_control_tpu.sim import srb_sim


def randomize_params(params: RobotParams, key, batch: int,
                     mass_range=(0.8, 1.2), mu_range=(0.5, 1.2),
                     speed_range=(0.9, 1.1)) -> RobotParams:
    """Per-scenario domain randomization: mass/friction/gait-speed scales.

    Returns a RobotParams whose randomized leaves carry a leading batch
    axis; untouched leaves are broadcast by the runner's vmap in_axes.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    dtype = params.mass.dtype
    mass = params.mass * jax.random.uniform(
        k1, (batch,), dtype, *mass_range)
    mu = params.mu * jax.random.uniform(k2, (batch,), dtype, *mu_range)
    speed = params.gait_counter_speed * jax.random.uniform(
        k3, (batch,), dtype, *speed_range)
    return params.replace(mass=mass, mu=mu, gait_counter_speed=speed)


def make_batched_rollout(pattern: gait_mod.GaitPattern, *, horizon=10,
                         n_ticks=100, substeps=C.SUBSTEPS_PER_MPC_TICK,
                         pdip_iters=12, use_ground_truth=True,
                         walk_velx=0.0):
    """Returns rollout(loop_batch, params_batched) -> (final, diag).

    diag: per-tick (pos (T,B,3), vel (T,B,3)) trajectories.
    """

    def one_tick(loop, params):
        cs = loop.controller
        cs = cs.replace(joy=cs.joy.replace(
            velx=jnp.asarray(walk_velx, loop.sim.pos.dtype)))
        loop = loop.replace(controller=cs)
        return step_mod.closed_loop_tick(
            loop, params, pattern, horizon=horizon, substeps=substeps,
            use_ground_truth=use_ground_truth, pdip_iters=pdip_iters)

    axes_params = RobotParams(
        mass=0, trunk_inertia=None, q_weights=None, r_weights=None,
        mu=0, fz_max=None, gait_counter_speed=0, default_foot_pos=None,
        kp_foot=None, kd_foot=None, foot_sensor_min=None,
        foot_sensor_max=None, foot_sensor_ratio=None, rho_fix=None,
        max_body_height=None, min_body_height=None)

    tick_batched = jax.vmap(one_tick, in_axes=(0, axes_params))

    def rollout(loop, params):
        def body(carry, _):
            carry = tick_batched(carry, params)
            return carry, (carry.sim.pos, carry.sim.vel)

        final, diag = jax.lax.scan(body, loop, None, length=n_ticks)
        return final, diag

    return rollout


def init_loop_batch(params: RobotParams, batch: int, key,
                    height_range=(0.27, 0.32), dtype=jnp.float32):
    """Batch of randomized initial loop states."""
    heights = jax.random.uniform(key, (batch,), dtype, *height_range)

    def init_one(h):
        return step_mod.LoopState(
            controller=step_mod.controller_init(params, dtype=dtype,
                                                body_height=0.3),
            sim=srb_sim.sim_init(params, height=h, dtype=dtype))

    return jax.vmap(init_one)(heights)
