"""Batched domain-randomized rollouts + mesh sharding (CPU, 8 virtual dev)."""

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.mpc import gait
from legged_mpc_control_tpu.parallel import mesh as mesh_mod
from legged_mpc_control_tpu.parallel import runner

DTYPE = jnp.float64


def test_batched_rollout_stands():
    params = a1_params(DTYPE)
    pattern = gait.trot_pattern(DTYPE)
    key = jax.random.PRNGKey(0)
    batch = 4
    params_b = runner.randomize_params(params, key, batch)
    loop = runner.init_loop_batch(params, batch, key, dtype=DTYPE)
    roll = jax.jit(runner.make_batched_rollout(
        pattern, horizon=5, n_ticks=5, pdip_iters=10))
    final, (pos, vel) = roll(loop, params_b)
    assert pos.shape == (5, batch, 3)
    # all scenarios remain upright and near their start height
    assert np.all(np.asarray(final.sim.pos[:, 2]) > 0.2)
    assert np.all(np.abs(np.asarray(final.sim.vel)) < 1.0)


def test_mesh_sharded_rollout():
    """Scenario axis sharded over all 8 virtual devices."""
    params = a1_params(DTYPE)
    pattern = gait.trot_pattern(DTYPE)
    key = jax.random.PRNGKey(1)
    batch = 8
    m = mesh_mod.scenario_mesh()
    assert m.devices.size == 8

    params_b = runner.randomize_params(params, key, batch)
    loop = runner.init_loop_batch(params, batch, key, dtype=DTYPE)
    loop = mesh_mod.shard_scenarios(m, loop)
    params_b = mesh_mod.shard_mixed(m, params_b, batch)

    roll = jax.jit(runner.make_batched_rollout(
        pattern, horizon=5, n_ticks=3, pdip_iters=8))
    final, (pos, _) = roll(loop, params_b)
    assert pos.shape == (3, batch, 3)
    # result carries the scenario sharding
    assert np.all(np.asarray(final.sim.pos[:, 2]) > 0.2)


def test_randomize_params_shapes():
    params = a1_params(DTYPE)
    pb = runner.randomize_params(params, jax.random.PRNGKey(2), 16)
    assert pb.mass.shape == (16,)
    assert pb.mu.shape == (16,)
    assert pb.gait_counter_speed.shape == (16,)
    # randomization stays within the configured envelope
    assert float(jnp.min(pb.mass)) >= 0.8 * float(params.mass) - 1e-6
    assert float(jnp.max(pb.mass)) <= 1.2 * float(params.mass) + 1e-6
