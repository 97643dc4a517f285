"""Config tier tests: YAML variants + named gait registry (reference config
tiers: launch-composed {run}_{robot}_{mpc}.yaml + gait.info, SURVEY.md §5)."""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from legged_mpc_control_tpu.config import a1_params, load_yaml_params
from legged_mpc_control_tpu.mpc import gait

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DTYPE = jnp.float64


def test_all_variant_files_load():
    files = sorted(glob.glob(os.path.join(REPO, "configs", "*.yaml")))
    assert len(files) == 8
    for f in files:
        p = load_yaml_params(f, DTYPE)
        assert float(p.mass) > 5.0
        assert p.q_weights.shape == (12,)


def test_hardware_variant_overrides_gains():
    p = load_yaml_params(os.path.join(REPO, "configs",
                                      "hardware_a1_convex.yaml"), DTYPE)
    base = a1_params(DTYPE)
    assert float(p.kp_foot[0]) == 20.0 != float(base.kp_foot[0])
    assert float(p.gait_counter_speed) == 2.5


def test_named_pattern_registry():
    for name in ("trot", "standing_trot", "flying_trot", "pace", "crawl",
                 "bound", "pronk", "stance", "dynamic_walk"):
        pat = gait.named_pattern(name, DTYPE)
        assert pat.seg_state.shape == (4, gait.MAX_SEG)
    with pytest.raises(ValueError):
        gait.named_pattern("moonwalk", DTYPE)


def _contact_at(pattern, leg, phase):
    s = gait.gait_leg_init(pattern, jnp.asarray(leg), DTYPE)
    s = s.replace(phase=jnp.asarray(phase, DTYPE))
    return float(gait.predict_contact_state(
        s, pattern, jnp.asarray(leg), 0.0, jnp.asarray(1.0, DTYPE)))


def test_pace_lateral_pairs():
    pat = gait.pace_pattern(DTYPE)
    # at phase 0.25: left legs (FL=0, RL=2) in stance, right legs swing
    assert _contact_at(pat, 0, 0.25) == 1.0
    assert _contact_at(pat, 2, 0.25) == 1.0
    assert _contact_at(pat, 1, 0.25) == 0.0
    assert _contact_at(pat, 3, 0.25) == 0.0


def test_bound_front_rear_pairs():
    pat = gait.bound_pattern(DTYPE)
    assert _contact_at(pat, 0, 0.25) == 1.0
    assert _contact_at(pat, 1, 0.25) == 1.0
    assert _contact_at(pat, 2, 0.25) == 0.0
    assert _contact_at(pat, 3, 0.25) == 0.0


def test_flying_trot_has_flight_phase():
    pat = gait.flying_trot_pattern(DTYPE)
    # at phase 0.5 all four legs are airborne
    for leg in range(4):
        assert _contact_at(pat, leg, 0.5) == 0.0
