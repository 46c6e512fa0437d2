"""Forecast subsystem tests: golden values mirroring the reference's own
forecast unit tests (test/case/forecast.cpp:23-160), Kalman filter math
checks, and the DynamicsForecast rollout."""

import numpy as np
import jax
import jax.numpy as jnp

from assistedmanipulation_tpu.forecast import forecast as fc
from assistedmanipulation_tpu.forecast import kalman as kf
from assistedmanipulation_tpu.forecast.dynamics_forecast import (
    Configuration as DFConfig,
    DynamicsForecast,
)
from assistedmanipulation_tpu.models import frankaridgeback as fr


# --- LOCF (test/case/forecast.cpp:23-60) -------------------------------------


def test_locf_carries_forward(rng):
    strategy = fc.LOCFForecast(fc.LOCFConfiguration(horizon=10.0, states=3))
    state = strategy.init(dtype=jnp.float64)
    for _ in range(5):
        position = rng.normal(size=3)
        state = strategy.update(state, position, 0.0)
        for dt in (0.0, 1.0, 2.0):
            np.testing.assert_allclose(
                np.asarray(strategy.forecast(state, jnp.asarray(dt))),
                position,
                atol=1e-12,
            )


def test_locf_expires_to_zero():
    strategy = fc.LOCFForecast(fc.LOCFConfiguration(horizon=0.3, states=3))
    state = strategy.init(dtype=jnp.float64)
    state = strategy.update(state, np.array([1.0, 2.0, 3.0]), 1.0)
    np.testing.assert_allclose(
        np.asarray(strategy.forecast(state, jnp.asarray(1.2))), [1, 2, 3]
    )
    np.testing.assert_allclose(
        np.asarray(strategy.forecast(state, jnp.asarray(1.5))), [0, 0, 0]
    )


# --- Average (test/case/forecast.cpp:62-101 golden sequence) -----------------


def test_average_golden_sequence():
    strategy = fc.AverageForecast(
        fc.AverageConfiguration(states=3, window=1.0, max_measurements=32)
    )
    state = strategy.init(dtype=jnp.float64)

    np.testing.assert_allclose(
        np.asarray(strategy.forecast(state, jnp.asarray(0.0))), 0.0
    )

    state = strategy.update(state, np.array([0.0, 1.0, 0.0]), 1.01)
    np.testing.assert_allclose(
        np.asarray(strategy.forecast(state, jnp.asarray(5.0))), [0, 1.0, 0]
    )

    state = strategy.update(state, np.array([0.0, 1.5, 0.0]), 1.5)
    np.testing.assert_allclose(
        np.asarray(strategy.forecast(state, jnp.asarray(10.0))), [0, 1.25, 0]
    )

    state = strategy.update(state, np.array([1.0, 1.0, 1.0]), 3.0)
    np.testing.assert_allclose(
        np.asarray(strategy.forecast(state, jnp.asarray(3.0))), [1, 1, 1]
    )

    for i in range(10):
        state = strategy.update(
            state, np.array([float(i)] * 3), 4.5 + i * 0.05
        )
    np.testing.assert_allclose(
        np.asarray(strategy.forecast(state, jnp.asarray(3.5))), [4.5] * 3
    )

    # Time-only update far in the future: only the most recent measurement
    # survives (the reference's documented/tested behavior).
    state = strategy.observe_time(state, 10.0)
    np.testing.assert_allclose(
        np.asarray(strategy.forecast(state, jnp.asarray(10.0))), [9.0] * 3
    )


def test_average_ignores_past_measurements():
    strategy = fc.AverageForecast(fc.AverageConfiguration(states=2, window=5.0))
    state = strategy.init(dtype=jnp.float64)
    state = strategy.update(state, np.array([2.0, 2.0]), 2.0)
    state = strategy.update(state, np.array([100.0, 100.0]), 1.0)  # in the past
    np.testing.assert_allclose(
        np.asarray(strategy.forecast(state, jnp.asarray(2.0))), [2.0, 2.0]
    )


# --- Kalman ------------------------------------------------------------------


def test_euler_transition_matrix_order2():
    """3 observed states, order 2 (forecast.cpp:233-241 comment block)."""
    dt = 0.1
    F = kf.euler_state_transition_matrix(dt, 3, 2)
    expected = np.zeros((9, 9))
    for s in range(3):
        expected[s, s] = 1
        expected[s, 3 + s] = dt
        expected[s, 6 + s] = 0.5 * dt * dt
        expected[3 + s, 3 + s] = 1
        expected[3 + s, 6 + s] = dt
        expected[6 + s, 6 + s] = 1
    np.testing.assert_allclose(F, expected, atol=1e-15)


def test_kalman_filter_converges_to_constant():
    spec = kf.KalmanSpec(
        state_transition=np.eye(1),
        transition_covariance=np.eye(1) * 1e-6,
        observation=np.eye(1),
        observation_covariance=np.eye(1) * 0.1,
    ).validate()
    state = kf.kalman_init(spec, jnp.zeros(1), jnp.eye(1))
    rng = np.random.default_rng(0)
    for _ in range(200):
        state = kf.kalman_update(spec, state, jnp.asarray([5.0 + rng.normal() * 0.1]))
    np.testing.assert_allclose(float(state.state[0]), 5.0, atol=0.1)


def test_kalman_forecast_tracks_line():
    """Order-1 Kalman forecast extrapolates a linear signal over the horizon
    (the reference's visual linear test, test/case/forecast.cpp:103-160)."""
    config = fc.KalmanForecastConfiguration(
        observed_states=6, order=1, time_step=0.01, horizon=0.3
    )
    strategy = fc.KalmanForecast(config)
    state = strategy.init(dtype=jnp.float64)

    slope = np.array([2.0, -1.0, 0.5, 0.0, 0.0, 1.0])
    t = 0.0
    for i in range(50):
        t = i * 0.01
        measurement = slope * t
        state = strategy.update(state, measurement, t)

    # Forecast 0.2 s ahead: expect slope * (t + 0.2).
    prediction = np.asarray(strategy.forecast(state, jnp.asarray(t + 0.2)))
    np.testing.assert_allclose(prediction, slope * (t + 0.2), atol=0.02)

    # Beyond the horizon: zero (forecast.cpp:348-350).
    beyond = np.asarray(strategy.forecast(state, jnp.asarray(t + 0.5)))
    np.testing.assert_allclose(beyond, 0.0)


def test_kalman_forecast_interpolates():
    config = fc.KalmanForecastConfiguration(
        observed_states=1, order=0, time_step=0.1, horizon=0.3
    )
    strategy = fc.KalmanForecast(config)
    state = strategy.init(dtype=jnp.float64)
    for i in range(10):
        state = strategy.update(state, np.array([4.0]), i * 0.1)
    # Order 0: constant model; the estimate converges to the measurement and
    # all horizon nodes are equal, so interpolation is flat.
    np.testing.assert_allclose(
        float(strategy.forecast(state, jnp.asarray(0.9 + 0.15))[0]), 4.0, atol=0.05
    )
    np.testing.assert_allclose(
        float(strategy.forecast(state, jnp.asarray(0.9 + 0.15))[0]),
        float(strategy.forecast(state, jnp.asarray(0.9))[0]),
        atol=1e-9,
    )


# --- DynamicsForecast --------------------------------------------------------


def test_dynamics_forecast_rollout():
    forecaster = DynamicsForecast(DFConfig(time_step=0.01, horizon=0.1))
    x = jnp.asarray(fr.make_state("huddled"), dtype=jnp.float64)

    constant_wrench = jnp.asarray([20.0, 0, 0, 0, 0, 0], dtype=jnp.float64)
    rollout, ctx = forecaster.forecast(x, 0.0, lambda t: constant_wrench)

    assert rollout.joint_positions.shape == (10, 12)
    assert rollout.wrench.shape == (10, 6)
    np.testing.assert_allclose(
        np.asarray(rollout.wrench), np.tile([20.0, 0, 0, 0, 0, 0], (10, 1))
    )
    # Zero control -> zero external power -> constant tank energy
    # (raisim_dynamics.cpp:226-234 with control = 0). The incoming state's
    # tank energy (preset: 100) is carried, matching set_state semantics
    # (raisim_dynamics.cpp:119-129).
    np.testing.assert_allclose(np.asarray(rollout.external_power), 0.0)
    np.testing.assert_allclose(np.asarray(rollout.energy), 100.0)
    # The pushed end effector accelerates in +x over the horizon.
    assert float(rollout.ee_positions[-1, 0]) > float(rollout.ee_positions[0, 0])
    # Context interpolates the cached wrench.
    np.testing.assert_allclose(
        np.asarray(ctx.wrench(jnp.asarray(0.05))), np.asarray(constant_wrench)
    )
