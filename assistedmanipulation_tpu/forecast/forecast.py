"""Wrench forecast strategies: LOCF, sliding-window average, Kalman.

Functional re-design of the reference's polymorphic Forecast hierarchy
(src/controller/forecast.hpp:14-416, forecast.cpp). Each strategy is an
explicit state pytree + pure update/forecast functions, so the whole
observe -> roll-horizon -> query path jits and vmaps over batched forecast
scenarios. The shared_mutex synchronization disappears: states are values.

The reference factory bug at forecast.cpp:19-25 (AVERAGE validating the locf
config) is not reproduced; create() validates the matching config.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from .kalman import (
    KalmanSpec,
    KalmanState,
    euler_state_transition_matrix,
    kalman_init,
    kalman_predict,
    kalman_update,
)


# --- LOCF (forecast.hpp:62-140) ----------------------------------------------


@dataclasses.dataclass
class LOCFConfiguration:
    observation: Optional[np.ndarray] = None  # initial observation
    horizon: float = 0.3
    states: int = 6


class LOCFState(NamedTuple):
    observation: jnp.ndarray  # (n,)
    valid_until: jnp.ndarray  # scalar


class LOCFForecast:
    """Last observation carried forward with a validity horizon."""

    def __init__(self, configuration: LOCFConfiguration):
        self.configuration = configuration

    def init(self, dtype=jnp.float32) -> LOCFState:
        obs = (
            jnp.asarray(self.configuration.observation, dtype=dtype)
            if self.configuration.observation is not None
            else jnp.zeros(self.configuration.states, dtype=dtype)
        )
        return LOCFState(observation=obs, valid_until=jnp.asarray(0.0, dtype=dtype))

    def update(self, state: LOCFState, measurement, time) -> LOCFState:
        return LOCFState(
            observation=jnp.asarray(measurement, dtype=state.observation.dtype),
            valid_until=jnp.asarray(time + self.configuration.horizon,
                                    dtype=state.valid_until.dtype),
        )

    def observe_time(self, state: LOCFState, time) -> LOCFState:
        return state  # no-op (forecast.hpp:107-108)

    def forecast(self, state: LOCFState, time) -> jnp.ndarray:
        expired = time > state.valid_until
        return jnp.where(expired, jnp.zeros_like(state.observation), state.observation)


# --- Sliding-window average (forecast.hpp:147-231, forecast.cpp:41-128) ------


@dataclasses.dataclass
class AverageConfiguration:
    states: int = 6
    window: float = 0.3
    # TPU addition: static ring capacity (the reference uses an unbounded
    # deque; a static ring holds max_measurements most-recent samples).
    max_measurements: int = 64


class AverageState(NamedTuple):
    buffer: jnp.ndarray  # (capacity, n)
    times: jnp.ndarray  # (capacity,) -inf where empty
    cursor: jnp.ndarray  # int32 ring insert position
    last: jnp.ndarray  # most recent measurement time


class AverageForecast:
    """Mean of all measurements within the trailing time window."""

    def __init__(self, configuration: AverageConfiguration):
        if configuration.window < 0:
            raise ValueError("prediction window time is negative")
        self.configuration = configuration

    def init(self, dtype=jnp.float32) -> AverageState:
        c = self.configuration
        return AverageState(
            buffer=jnp.zeros((c.max_measurements, c.states), dtype=dtype),
            times=jnp.full((c.max_measurements,), -jnp.inf, dtype=dtype),
            cursor=jnp.asarray(0, dtype=jnp.int32),
            last=jnp.asarray(0.0, dtype=dtype),
        )

    def update(self, state: AverageState, measurement, time) -> AverageState:
        """Insert a measurement; stale measurements (older than the window)
        are masked at query time. Measurements in the past are ignored
        (forecast.cpp:113-117)."""
        time = jnp.asarray(time, dtype=state.last.dtype)
        stale = time < state.last
        measurement = jnp.asarray(measurement, dtype=state.buffer.dtype)
        buffer = jax.lax.cond(
            stale,
            lambda: state.buffer,
            lambda: state.buffer.at[state.cursor].set(measurement),
        )
        times = jax.lax.cond(
            stale,
            lambda: state.times,
            lambda: state.times.at[state.cursor].set(time),
        )
        cursor = jnp.where(
            stale,
            state.cursor,
            (state.cursor + 1) % self.configuration.max_measurements,
        )
        last = jnp.maximum(state.last, time)
        return AverageState(buffer=buffer, times=times, cursor=cursor, last=last)

    def observe_time(self, state: AverageState, time) -> AverageState:
        """Advance the window clock (clear_old_measurements semantics,
        forecast.cpp:102-107): expiry is handled by masking against ``last``."""
        return state._replace(
            last=jnp.maximum(state.last, jnp.asarray(time, state.last.dtype))
        )

    def forecast(self, state: AverageState, time) -> jnp.ndarray:
        """Average of in-window measurements; zero if empty
        (forecast.cpp:86-100, 124-128). The most recent measurement is always
        retained even when the window has expired — the reference's
        clear_old_measurements comment and its own unit test
        (test/case/forecast.cpp:95-98) specify this, though the deque
        implementation erases everything; we implement the intended/tested
        behavior."""
        has_any = jnp.isfinite(state.times).any()
        most_recent = state.times == jnp.max(state.times)
        in_window = state.times > (state.last - self.configuration.window)
        included = (in_window | most_recent) & jnp.isfinite(state.times)
        count = jnp.sum(included)
        total = jnp.sum(
            jnp.where(included[:, None], state.buffer, 0.0), axis=0
        )
        average = total / jnp.maximum(count, 1)
        return jnp.where(has_any & (count > 0), average, jnp.zeros_like(average))


# --- Kalman forecast (forecast.hpp:238-385, forecast.cpp:130-367) ------------


@dataclasses.dataclass
class KalmanForecastConfiguration:
    observed_states: int = 6
    order: int = 1
    time_step: float = 0.01
    horizon: float = 0.3
    variance: Optional[np.ndarray] = None  # (observed_states,) — see note
    initial_state: Optional[np.ndarray] = None
    # Honest noise model (no reference equivalent — the reference pins both
    # covariances at 1e-8 I and ignores `variance`, forecast.cpp:277-286,
    # leaving the posterior degenerate ~1e-4 N: fine for the mean forecast,
    # useless for the scenario-ensemble sampling in forecast/scenarios.py).
    # When set, these scale the observation / transition covariances so the
    # filter posterior reflects real measurement noise and model mismatch,
    # giving sample_scenarios a non-degenerate ensemble. None = reference
    # 1e-8 parity.
    observation_variance: Optional[float] = None
    transition_variance: Optional[float] = None

    @property
    def steps(self) -> int:
        return int(math.ceil(self.horizon / self.time_step))

    @property
    def states(self) -> int:
        return self.observed_states * (self.order + 1)


class KalmanForecastState(NamedTuple):
    filter: KalmanState
    measurement: jnp.ndarray  # (states,) stacked value + fd derivatives
    prediction: jnp.ndarray  # (steps + 1, observed_states)
    last_update: jnp.ndarray  # scalar


class KalmanForecast:
    """Constant-derivative Kalman wrench predictor with a cached horizon.

    Matches KalmanForecast (forecast.cpp:130-367): the filter observes the
    full derivative-augmented state (H = I) built from finite differences of
    the measurements; after each update a predictor clone rolls the model
    ``steps`` times caching the horizon; queries linearly interpolate and
    return zero beyond the horizon.

    NOTE: the reference builds the transition covariance as 1e-8 * I and
    ignores the configured variance entirely (forecast.cpp:277-286) — kept.
    """

    def __init__(self, configuration: KalmanForecastConfiguration):
        c = configuration
        self.configuration = c
        n = c.states
        observation_variance = (
            1e-8 if c.observation_variance is None else c.observation_variance
        )
        transition_variance = (
            1e-8 if c.transition_variance is None else c.transition_variance
        )
        self.spec = KalmanSpec(
            state_transition=euler_state_transition_matrix(
                c.time_step, c.observed_states, c.order
            ),
            transition_covariance=np.eye(n) * transition_variance,
            observation=np.eye(n),
            observation_covariance=np.eye(n) * observation_variance,
        ).validate()

    def init(self, dtype=jnp.float32) -> KalmanForecastState:
        c = self.configuration
        initial = jnp.zeros(c.states, dtype=dtype)
        if c.initial_state is not None:
            initial = initial.at[: c.observed_states].set(
                jnp.asarray(c.initial_state, dtype=dtype)
            )
        ks = kalman_init(self.spec, initial, jnp.eye(c.states, dtype=dtype) * 1e-8)
        prediction = jnp.zeros((c.steps + 1, c.observed_states), dtype=dtype)
        return KalmanForecastState(
            filter=ks,
            measurement=jnp.zeros(c.states, dtype=dtype),
            prediction=prediction,
            # First dt = time - (-time_step) (forecast.cpp:195).
            last_update=jnp.asarray(-c.time_step, dtype=dtype),
        )

    def update(self, state: KalmanForecastState, measurement, time):
        """Measurement update: finite-difference derivative stacking
        (forecast.cpp:288-310), filter update, horizon roll
        (forecast.cpp:322-330)."""
        c = self.configuration
        o = c.observed_states
        dtype = state.measurement.dtype
        measurement = jnp.asarray(measurement, dtype=dtype)
        time = jnp.asarray(time, dtype=dtype)
        dt = time - state.last_update

        stacked = state.measurement
        delta = (measurement - stacked[:o]) / dt
        new_stacked = stacked
        for i in range(1, c.order + 1):
            next_delta = (delta - stacked[o * i : o * (i + 1)]) / dt
            new_stacked = new_stacked.at[o * i : o * (i + 1)].set(delta)
            delta = next_delta
        new_stacked = new_stacked.at[:o].set(measurement)

        filter_state = kalman_update(self.spec, state.filter, new_stacked)

        # Roll a predictor clone over the horizon (covariance not updated,
        # forecast.cpp:327 predict(false)).
        def roll(pred_state, _):
            pred_state = kalman_predict(self.spec, pred_state, update_covariance=False)
            return pred_state, pred_state.state[:o]

        _, horizon = jax.lax.scan(roll, filter_state, None, length=c.steps)
        prediction = jnp.concatenate(
            [filter_state.state[:o][None], horizon], axis=0
        )
        return KalmanForecastState(
            filter=filter_state,
            measurement=new_stacked,
            prediction=prediction,
            last_update=time,
        )

    def observe_time(self, state: KalmanForecastState, time):
        """Prediction-only tick (forecast.cpp:332-340): extrapolate the
        filter, leave the cached horizon untouched."""
        advance = jnp.asarray(time, state.last_update.dtype) > state.last_update
        predicted = kalman_predict(self.spec, state.filter, update_covariance=True)
        filter_state = jax.tree.map(
            lambda new, old: jnp.where(advance, new, old), predicted, state.filter
        )
        return state._replace(filter=filter_state)

    def forecast(self, state: KalmanForecastState, time) -> jnp.ndarray:
        """Linear interpolation into the cached horizon; zero beyond it
        (forecast.cpp:342-367)."""
        c = self.configuration
        rel = (time - state.last_update) / c.time_step
        lower = jnp.clip(rel.astype(jnp.int32), 0, c.steps - 1)
        frac = jnp.clip(rel - lower, 0.0, 1.0)
        value = (
            (1.0 - frac) * state.prediction[lower]
            + frac * state.prediction[lower + 1]
        )
        beyond = (time - state.last_update) > c.horizon
        return jnp.where(beyond, jnp.zeros_like(value), value)


# --- factory (forecast.cpp:7-39) ---------------------------------------------


@dataclasses.dataclass
class Configuration:
    type: str = "kalman"  # "locf" | "average" | "kalman"
    locf: Optional[LOCFConfiguration] = None
    average: Optional[AverageConfiguration] = None
    kalman: Optional[KalmanForecastConfiguration] = None


ForecastStrategy = Union[LOCFForecast, AverageForecast, KalmanForecast]


def create(configuration: Configuration) -> ForecastStrategy:
    if configuration.type == "locf":
        return LOCFForecast(configuration.locf or LOCFConfiguration())
    if configuration.type == "average":
        return AverageForecast(configuration.average or AverageConfiguration())
    if configuration.type == "kalman":
        return KalmanForecast(
            configuration.kalman or KalmanForecastConfiguration()
        )
    raise ValueError(f"unknown forecast type {configuration.type}")
