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
                         pdip_iters=12, use_ground_truth=True, kf_type=None,
                         walk_velx=0.0, solver="riccati", backend=None,
                         low_level_type=0):
    """Returns rollout(loop_batch, params_batched) -> (final, diag).

    The scenario batch flows through `closed_loop_tick_batched`, so every
    tick's Newton factorizations run in ONE explicitly-batched solver call
    (Pallas batch-in-lanes Cholesky on TPU — the regime XLA's library
    Cholesky runs ~30x slower, see ops/chol_pallas.py).

    Args:
      solver: "pdip" (cold interior point each tick) or "admm" — the
        OSQP-equivalent with its warm tuple carried tick-to-tick in the
        rollout state, mirroring the reference's `setWarmStart(true)`
        (reference: ConvexQPSolver.cpp:185).
      pdip_iters: iteration count for either solver.

    diag: per-tick (pos (T,B,3), vel (T,B,3)) trajectories.
    """
    if kf_type is None:
        kf_type = 0 if use_ground_truth else 1

    def rollout(loop, params):
        batch = loop.sim.pos.shape[0]
        dtype = loop.sim.pos.dtype
        params_b = step_mod.broadcast_params(params, batch)
        # riccati/pdip carry the previous tick's primal (B, 12H) as the
        # cross-tick warm start (reference: ConvexQPSolver.cpp:185); a
        # zeros tick-0 carry is the cold start expressed in warm form (the
        # scan carry must keep one pytree structure across ticks).
        warm0 = (step_mod.admm_warm_init(batch, horizon, dtype)
                 if solver == "admm"
                 else jnp.zeros((batch, horizon * 12), dtype))

        def body(carry, _):
            loop, warm = carry
            cs = loop.controller
            cs = cs.replace(joy=cs.joy.replace(
                velx=jnp.full((batch,), walk_velx, dtype)))
            loop = loop.replace(controller=cs)
            loop, warm = step_mod.closed_loop_tick_batched(
                loop, params_b, pattern, horizon=horizon, substeps=substeps,
                kf_type=kf_type, iters=pdip_iters, solver=solver,
                backend=backend, low_level_type=low_level_type, warm=warm)
            return (loop, warm), (loop.sim.pos, loop.sim.vel)

        (final, _), diag = jax.lax.scan(body, (loop, warm0), None,
                                        length=n_ticks)
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

    # jit: eager vmapped init dispatches hundreds of tiny ops per scenario
    # (~minutes of host overhead at batch 4096 on the CPU mesh)
    return jax.jit(jax.vmap(init_one))(heights)
