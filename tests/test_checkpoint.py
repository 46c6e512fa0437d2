"""Checkpoint/resume (checkpoint.py): a resumed planner continues exactly
the trajectory of an uninterrupted one — same RNG key, same elite noise,
same optimal control."""

import numpy as np
import jax.numpy as jnp
import pytest

from assistedmanipulation_tpu import checkpoint, mppi
from assistedmanipulation_tpu.forecast import forecast as forecast_module
from assistedmanipulation_tpu.models import point_mass


def _planner():
    configuration = mppi.Configuration(
        rollouts=10,
        keep_best_rollouts=3,
        time_step=0.1,
        horizon=0.5,
        covariance=np.eye(2) * 0.5,
        control_min=-np.ones(2),
        control_max=np.ones(2),
        smoothing=None,
        dtype="float32",
    )
    plant = point_mass.make_point_mass_plant(point_mass.PointMassConfig())
    return mppi.Planner(configuration, plant)


def test_planner_state_roundtrip(tmp_path):
    planner = _planner()
    x0 = jnp.zeros(4, dtype=jnp.float32)

    state = planner.init(seed=7)
    for i in range(3):
        state, _ = planner.update(state, x0, 0.1 * i)

    path = str(tmp_path / "planner.ckpt.npz")
    checkpoint.save_checkpoint(
        path, state, metadata={"update_count": int(state.update_count)}
    )

    assert checkpoint.load_metadata(path)["update_count"] == 3

    resumed = checkpoint.restore_checkpoint(path, planner.init(seed=0))

    # Continue both and compare: identical continuation.
    cont_a, _ = planner.update(state, x0, 0.3)
    cont_b, _ = planner.update(resumed, x0, 0.3)
    np.testing.assert_array_equal(
        np.asarray(cont_a.optimal_control), np.asarray(cont_b.optimal_control)
    )
    np.testing.assert_array_equal(
        np.asarray(cont_a.rng), np.asarray(cont_b.rng)
    )


def test_forecast_state_roundtrip(tmp_path):
    forecast = forecast_module.create(
        forecast_module.Configuration(
            type="kalman",
            kalman=forecast_module.KalmanForecastConfiguration(
                order=1, time_step=0.1, horizon=1.0
            ),
        )
    )
    state = forecast.init()
    for k in range(5):
        state = forecast.update(state, jnp.full(6, float(k)), 0.1 * k)

    path = str(tmp_path / "forecast.ckpt.npz")
    checkpoint.save_checkpoint(path, state)
    resumed = checkpoint.restore_checkpoint(path, forecast.init())

    t = jnp.asarray(0.6)
    np.testing.assert_allclose(
        np.asarray(forecast.forecast(state, t)),
        np.asarray(forecast.forecast(resumed, t)),
    )


def test_structure_mismatch_raises(tmp_path):
    planner = _planner()
    path = str(tmp_path / "bad.ckpt.npz")
    checkpoint.save_checkpoint(path, planner.init(seed=0))
    with pytest.raises(ValueError, match="structure|shape"):
        checkpoint.restore_checkpoint(path, {"something": jnp.zeros(3)})
