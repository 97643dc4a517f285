"""Bag (diagnostics) and checkpoint round-trip tests."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.sim import srb_sim
from legged_mpc_control_tpu.utils import bag, checkpoint

DTYPE = jnp.float64


def make_loop():
    params = a1_params(DTYPE)
    return step_mod.LoopState(
        controller=step_mod.controller_init(params, dtype=DTYPE),
        sim=srb_sim.sim_init(params, height=0.3, dtype=DTYPE))


def test_bag_roundtrip_and_dataframe():
    loop = make_loop()
    rec = bag.diag_from_loop(loop)
    # stack 5 fake ticks
    series = jax.tree.map(lambda x: jnp.stack([x] * 5), rec)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "run.npz")
        bag.save_bag(path, series, meta={"dt": 0.01, "robot": "a1"})
        loaded, meta = bag.load_bag(path)
        assert meta["robot"] == "a1"
        np.testing.assert_allclose(loaded["root_pos"],
                                   np.asarray(series["root_pos"]))
        df = bag.bag_to_dataframe(loaded, dt=meta["dt"])
        assert "root_pos_2" in df.columns
        assert len(df) == 5


def test_checkpoint_roundtrip():
    loop = make_loop()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.pkl")
        checkpoint.save_checkpoint(path, loop, step=42)
        restored, step = checkpoint.load_checkpoint(path, target=loop)
        assert step == 42
        for a, b in zip(jax.tree.leaves(loop), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_structure_mismatch_rejected():
    loop = make_loop()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.pkl")
        checkpoint.save_checkpoint(path, {"a": jnp.zeros(3)})
        try:
            checkpoint.load_checkpoint(path, target=loop)
            assert False, "should have raised"
        except ValueError:
            pass


def test_savgol_smoother():
    """Causal Savitzky-Golay filter (the reference EKF's
    gram_savitzky_golay dependency): exactly reproduces polynomials up to
    its order and attenuates noise."""
    from legged_mpc_control_tpu.ops import filters

    W = 9
    # quadratic signal is reproduced exactly once the window fills
    st = filters.savgol_init(W, dtype=jnp.float64)
    ts = np.arange(30, dtype=np.float64)
    sig = 0.5 * ts ** 2 - 2.0 * ts + 3.0
    outs = []
    for s in sig:
        st, y = filters.savgol_update(st, jnp.asarray(s), order=2)
        outs.append(float(y))
    np.testing.assert_allclose(outs[W:], sig[W:], atol=1e-9)

    # derivative mode recovers the slope of a ramp
    st = filters.savgol_init(W, dtype=jnp.float64)
    for s in 3.0 * ts[:15]:
        st, dy = filters.savgol_update(st, jnp.asarray(s), order=2,
                                       deriv=1, dt=1.0)
    np.testing.assert_allclose(float(dy), 3.0, atol=1e-9)

    # noise attenuation on a constant signal
    rng = np.random.default_rng(0)
    st = filters.savgol_init(W, dtype=jnp.float64)
    noisy = 1.0 + 0.1 * rng.standard_normal(200)
    errs = []
    for s in noisy:
        st, y = filters.savgol_update(st, jnp.asarray(s), order=2)
        errs.append(float(y) - 1.0)
    # causal endpoint evaluation: variance gain sum(c^2) ~ 0.65
    assert np.std(errs[W:]) < 0.9 * np.std(noisy - 1.0)

    # vector samples work (the EKF feeds (4,3) foot velocities)
    st = filters.savgol_init(W, value_shape=(4, 3), dtype=jnp.float64)
    st, y = filters.savgol_update(st, jnp.ones((4, 3)), order=2)
    assert y.shape == (4, 3)


def test_la3_closed_form_matches_library():
    """Adjugate 3x3 solve/inv (ops/la3.py) vs jnp.linalg on random batches."""
    from legged_mpc_control_tpu.ops import la3

    rng = np.random.default_rng(3)
    A = rng.standard_normal((5, 4, 3, 3)) + 3 * np.eye(3)
    b = rng.standard_normal((5, 4, 3))
    Bm = rng.standard_normal((5, 4, 3, 2))
    Aj = jnp.asarray(A)
    np.testing.assert_allclose(np.asarray(la3.inv3(Aj)),
                               np.linalg.inv(A), atol=1e-10)
    np.testing.assert_allclose(np.asarray(la3.solve3(Aj, jnp.asarray(b))),
                               np.linalg.solve(A, b[..., None])[..., 0],
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(la3.solve3(Aj, jnp.asarray(Bm))),
                               np.linalg.solve(A, Bm), atol=1e-10)
    At = np.swapaxes(A, -1, -2)
    np.testing.assert_allclose(np.asarray(la3.solve3_t(Aj, jnp.asarray(b))),
                               np.linalg.solve(At, b[..., None])[..., 0],
                               atol=1e-10)
