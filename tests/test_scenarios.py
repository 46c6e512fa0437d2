"""Forecast scenario ensemble (forecast/scenarios.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from assistedmanipulation_tpu.forecast import forecast as forecast_module
from assistedmanipulation_tpu.forecast.scenarios import (
    make_scenario_rollout_fn,
    sample_scenarios,
)
from assistedmanipulation_tpu.kernels.lane_rollout import (
    make_lanes_rollout_fn,
)
from assistedmanipulation_tpu.models import frankaridgeback as fr
from assistedmanipulation_tpu.models.model_data import frankaridgeback_model
from assistedmanipulation_tpu.objectives.assisted_manipulation import (
    Configuration as ObjectiveConfiguration,
    ForecastContext,
)

STEPS = 4
DT = 0.01


def _kalman_state():
    forecast = forecast_module.create(
        forecast_module.Configuration(
            type="kalman",
            kalman=forecast_module.KalmanForecastConfiguration(
                order=1, time_step=DT, horizon=STEPS * DT
            ),
        )
    )
    state = forecast.init(dtype=jnp.float32)
    for k in range(6):
        wrench = jnp.zeros(6, dtype=jnp.float32).at[0].set(5.0 + k)
        state = forecast.update(state, wrench, DT * k)
    return forecast, state


def test_scenario_zero_is_mean():
    forecast, state = _kalman_state()
    scenarios = sample_scenarios(forecast, state, jax.random.PRNGKey(0), 5)
    assert scenarios.shape == (5, STEPS + 1, 6)
    np.testing.assert_array_equal(
        np.asarray(scenarios[0]), np.asarray(state.prediction)
    )
    assert np.isfinite(np.asarray(scenarios)).all()
    # Draws differ from the mean but stay near it (posterior is tight).
    spread = np.abs(np.asarray(scenarios[1:]) - np.asarray(scenarios[0]))
    assert spread.max() > 0


def test_scenario_mean_matches_individual_rollouts(rng):
    model = frankaridgeback_model()
    rollout_fn = make_lanes_rollout_fn(
        model, ObjectiveConfiguration(), fr.Configuration(), STEPS, DT
    )
    scenario_fn = make_scenario_rollout_fn(rollout_fn)

    R, C = 5, 3
    noise = jnp.asarray(
        rng.normal(scale=0.3, size=(R, STEPS, 12)), dtype=jnp.float32
    )
    optimal = jnp.zeros((STEPS, 12), dtype=jnp.float32)
    x0 = jnp.asarray(fr.make_state("huddled"), dtype=jnp.float32)
    time = jnp.asarray(0.0, dtype=jnp.float32)

    horizons = jnp.asarray(
        rng.normal(scale=10.0, size=(C, STEPS + 1, 6)), dtype=jnp.float32
    )

    def ctx(w):
        return ForecastContext(
            wrench_horizon=w,
            start_time=time,
            time_step=DT,
            horizon=STEPS * DT,
        )

    ensemble, ensemble_states = scenario_fn(
        noise, optimal, x0, time, ctx(horizons)
    )
    ensemble = np.asarray(ensemble)
    singles = np.stack(
        [
            np.asarray(
                rollout_fn(noise, optimal, x0, time, ctx(horizons[c]))[0]
            )
            for c in range(C)
        ]
    )
    np.testing.assert_allclose(ensemble, singles.mean(axis=0), rtol=1e-5, atol=1e-5)
    # Rollout-0 states pass through from scenario 0 (dynamics are
    # forecast-independent).
    single_states = rollout_fn(noise, optimal, x0, time, ctx(horizons[0]))[1]
    np.testing.assert_array_equal(
        np.asarray(ensemble_states), np.asarray(single_states)
    )

    # Single-scenario ctx passes straight through.
    passthrough = np.asarray(
        scenario_fn(noise, optimal, x0, time, ctx(horizons[0]))[0]
    )
    np.testing.assert_array_equal(passthrough, singles[0])
