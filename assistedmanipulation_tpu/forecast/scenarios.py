"""Batched wrench-forecast scenarios (BASELINE config 5).

The reference plans against a single point forecast of the human wrench
(DynamicsForecast caches one horizon, frankaridgeback/dynamics.cpp:104-138).
The Kalman filter, however, carries a full posterior covariance it never
uses for planning. This module samples a scenario ensemble from that
posterior — scenario 0 is always the mean (the reference's forecast), the
rest are posterior draws rolled through the same constant-derivative
predictor — and scores every MPPI rollout against the ensemble, so forecast
uncertainty widens the effective cost landscape instead of being discarded.

On device this is a pure batch axis: the scenario ensemble vmaps over the
rollout evaluator (lanes or Pallas backends unchanged) and the cost channels
average over scenarios; NaN poisoning in any scenario poisons the rollout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .forecast import KalmanForecast, KalmanForecastState


def sample_scenarios(
    forecast: KalmanForecast,
    state: KalmanForecastState,
    key: jax.Array,
    count: int,
) -> jnp.ndarray:
    """Sample ``count`` wrench horizons (count, steps + 1, observed) from
    the filter posterior. Scenario 0 is the cached mean prediction."""
    if count < 1:
        raise ValueError("need at least one scenario")
    c = forecast.configuration
    o = c.observed_states
    dtype = state.prediction.dtype
    if count == 1:
        return state.prediction[None]

    F = jnp.asarray(forecast.spec.state_transition, dtype=dtype)
    covariance = state.filter.covariance
    # Symmetrize + jitter: the filter covariance is tiny (the reference
    # fixes process/observation noise at 1e-8 I, forecast.cpp:277-286) and
    # f32 round-off can push it indefinite.
    covariance = 0.5 * (covariance + covariance.T)
    jitter = 1e-10 * jnp.eye(covariance.shape[0], dtype=dtype)
    transform = jnp.linalg.cholesky(covariance + jitter)

    draws = jax.random.normal(key, (count - 1, covariance.shape[0]), dtype)
    samples = state.filter.state[None] + draws @ transform.T

    def horizon(x0):
        def roll(x, _):
            x = F @ x
            return x, x[:o]

        _, rolled = jax.lax.scan(roll, x0, None, length=c.steps)
        return jnp.concatenate([x0[:o][None], rolled], axis=0)

    sampled = jax.vmap(horizon)(samples)  # (count - 1, steps + 1, o)
    return jnp.concatenate([state.prediction[None], sampled], axis=0)


def make_scenario_rollout_fn(rollout_fn, weights=None):
    """Wrap a Planner rollout_fn to accept a ctx whose ``wrench_horizon``
    carries a leading scenario axis (C, steps + 1, 6). Cost channels are the
    (optionally weighted) scenario mean — risk-neutral scoring; pass e.g.
    softmax weights for risk-sensitive variants.

    A rollout_fn returning ``(costs, rollout-0 states)`` passes the states
    through from scenario 0 (the dynamics do not depend on the forecast —
    only the cost reads the wrench horizon)."""

    def fn(noise, optimal_shifted, x0, time, ctx):
        if ctx is None or ctx.wrench_horizon.ndim == 2:
            return rollout_fn(noise, optimal_shifted, x0, time, ctx)
        horizons = ctx.wrench_horizon  # (C, steps + 1, 6)

        def one(horizon):
            return rollout_fn(
                noise,
                optimal_shifted,
                x0,
                time,
                ctx._replace(wrench_horizon=horizon),
            )

        out = jax.vmap(one)(horizons)
        states = None
        if isinstance(out, tuple):
            costs, states = out  # (C, R, 2), (C, S, state_dof)
            states = states[0]  # scenario-independent
        else:
            costs = out  # (C, R, 2)
        if weights is None:
            mean = jnp.mean(costs, axis=0)
        else:
            w = jnp.asarray(weights, dtype=costs.dtype)
            w = w / jnp.sum(w)
            mean = jnp.einsum("c,crk->rk", w, costs)
        return mean if states is None else (mean, states)

    return fn
