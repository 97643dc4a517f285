import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.constants import FOOT_SWING_CLEARANCE2
from legged_mpc_control_tpu.ops import bezier


START = jnp.array([0.1, 0.05, 0.0])
FINAL = jnp.array([0.25, 0.05, 0.0])


def test_endpoints():
    p0 = bezier.swing_foot_pos(0.0, START, FINAL)
    p1 = bezier.swing_foot_pos(1.0, START, FINAL)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(START), atol=1e-12)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(FINAL), atol=1e-12)


def test_zero_lift_matches_reference_formula():
    # replicate the reference polynomial directly
    # (Utils.cpp:179-192: y = sum binom(4,i) t^i (1-t)^(4-i) P_i)
    t = 0.37
    for axis, (s, f) in enumerate(zip(START, FINAL)):
        P = [float(s), float(s), float(f), float(f), float(f)]
        if axis == 2:
            P[1] += 0.0
            P[2] += FOOT_SWING_CLEARANCE2
        coeff = [1, 4, 6, 4, 1]
        expected = sum(c * t**i * (1 - t) ** (4 - i) * p
                       for i, (c, p) in enumerate(zip(coeff, P)))
        got = bezier.swing_foot_pos(t, START, FINAL)[axis]
        np.testing.assert_allclose(float(got), expected, atol=1e-12)


def test_apex_clearance():
    # max z over the swing must be positive and below the control-point lift
    ts = jnp.linspace(0.0, 1.0, 101)
    zs = jnp.stack([bezier.swing_foot_pos(t, START, FINAL)[2] for t in ts])
    assert float(jnp.max(zs)) > 0.05
    assert float(jnp.max(zs)) <= FOOT_SWING_CLEARANCE2


def test_analytic_velocity_matches_finite_diff():
    dur = 0.15
    t, h = 0.4, 1e-6
    _, v = bezier.swing_foot_pos_vel(t, START, FINAL, dur)
    p_plus = bezier.swing_foot_pos(t + h, START, FINAL)
    p_minus = bezier.swing_foot_pos(t - h, START, FINAL)
    fd = (p_plus - p_minus) / (2 * h) / dur
    np.testing.assert_allclose(np.asarray(v), np.asarray(fd), atol=1e-6)
