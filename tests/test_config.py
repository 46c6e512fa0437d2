"""Config system tests: JSON round-trip, merge-patch composition, and the
reference's "horison" spelling alias (src/test/case/base.cpp:4-27)."""

import numpy as np

from assistedmanipulation_tpu import config as cfg
from assistedmanipulation_tpu import mppi


def test_merge_patch_semantics():
    base = {"a": 1, "b": {"c": 2, "d": 3}, "e": [1, 2]}
    patch = {"b": {"c": 9}, "e": [5], "f": "new", "a": None}
    merged = cfg.merge_patch(base, patch)
    assert merged == {"b": {"c": 9, "d": 3}, "e": [5], "f": "new"}


def test_mppi_config_round_trip():
    configuration = mppi.Configuration(
        rollouts=10,
        covariance=np.array([0.1, 0.2]),
        control_min=np.array([-1.0, -1.0]),
        control_max=np.array([1.0, 1.0]),
        smoothing=mppi.Smoothing(window=5, order=2),
    )
    tree = cfg.to_json(configuration)
    assert tree["rollouts"] == 10
    assert tree["covariance"] == [0.1, 0.2]
    rebuilt = cfg.from_json(mppi.Configuration, tree)
    assert rebuilt.rollouts == 10
    assert rebuilt.smoothing.window == 5
    np.testing.assert_allclose(rebuilt.covariance, [0.1, 0.2])


def test_patched_composition():
    configuration = mppi.Configuration(
        rollouts=50,
        covariance=np.array([0.1]),
        control_min=np.array([-1.0]),
        control_max=np.array([1.0]),
    )
    out = cfg.patched(configuration, {"rollouts": 7, "cost_scale": 3.5})
    assert out.rollouts == 7
    assert out.cost_scale == 3.5
    assert out.time_step == configuration.time_step


def test_horison_alias():
    out = cfg.from_json(mppi.Configuration, {"horison": 0.5})
    assert out.horizon == 0.5


def test_unknown_keys_ignored():
    out = cfg.from_json(mppi.Configuration, {"not_a_field": 1, "rollouts": 3})
    assert out.rollouts == 3
