"""Kalman filter as a pure function of an explicit state pytree.

Re-implements the reference KalmanFilter (src/controller/kalman.cpp:103-152)
functionally so it jits, scans over horizons, and vmaps over batched forecast
scenarios (BASELINE config 5):

- update: optimal gain K = P H^T (H P H^T + R)^-1; correct the previously
  predicted state; covariance (I - K H) P then extrapolate F P F^T + Q
  (kalman.cpp:106-137);
- predict: process-only extrapolation, optional covariance propagation
  (kalman.cpp:140-152).

The constructor bug at kalman.cpp:81-87 (building the filter twice and
multiplying an uninitialized next_state) is not reproduced; initialization
follows the (working) member-initializer path kalman.cpp:90-101.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import math

import numpy as np
import jax.numpy as jnp

from ..ops.precision import f32_matmuls


@dataclasses.dataclass(frozen=True)
class KalmanSpec:
    """Static filter matrices (host numpy, trace-time constants)."""

    state_transition: np.ndarray  # F (n, n)
    transition_covariance: np.ndarray  # Q (n, n)
    observation: np.ndarray  # H (m, n)
    observation_covariance: np.ndarray  # R (m, m)

    def validate(self):
        n = self.state_transition.shape[0]
        m = self.observation.shape[0]
        assert self.state_transition.shape == (n, n)
        assert self.transition_covariance.shape == (n, n)
        assert self.observation.shape == (m, n)
        assert self.observation_covariance.shape == (m, m)
        return self


class KalmanState(NamedTuple):
    state: jnp.ndarray  # (..., n) corrected estimate
    next_state: jnp.ndarray  # (..., n) one-step prediction
    covariance: jnp.ndarray  # (..., n, n)


def kalman_init(spec: KalmanSpec, initial_state, initial_covariance) -> KalmanState:
    initial_state = jnp.asarray(initial_state)
    F = jnp.asarray(spec.state_transition, dtype=initial_state.dtype)
    return KalmanState(
        state=initial_state,
        next_state=(F @ initial_state[..., None])[..., 0],
        covariance=jnp.asarray(initial_covariance, dtype=initial_state.dtype),
    )


@f32_matmuls
def kalman_update(spec: KalmanSpec, ks: KalmanState, observation) -> KalmanState:
    """Measurement update + one-step prediction (kalman.cpp:103-138)."""
    dtype = ks.state.dtype
    F = jnp.asarray(spec.state_transition, dtype=dtype)
    Q = jnp.asarray(spec.transition_covariance, dtype=dtype)
    H = jnp.asarray(spec.observation, dtype=dtype)
    R = jnp.asarray(spec.observation_covariance, dtype=dtype)
    observation = jnp.asarray(observation, dtype=dtype)

    P = ks.covariance
    innovation_cov = H @ P @ H.T + R
    gain = jnp.linalg.solve(innovation_cov.T, (P @ H.T).T).T  # P H^T S^-1

    state = ks.next_state + gain @ (observation - H @ ks.next_state)
    eye = jnp.eye(P.shape[-1], dtype=dtype)
    P = (eye - gain @ H) @ P
    next_state = F @ state
    P = F @ P @ F.T + Q
    return KalmanState(state=state, next_state=next_state, covariance=P)


@f32_matmuls
def kalman_predict(
    spec: KalmanSpec, ks: KalmanState, update_covariance: bool = True
) -> KalmanState:
    """Process-only extrapolation (kalman.cpp:140-152)."""
    dtype = ks.state.dtype
    F = jnp.asarray(spec.state_transition, dtype=dtype)
    Q = jnp.asarray(spec.transition_covariance, dtype=dtype)
    state = ks.next_state
    next_state = F @ state
    covariance = (
        F @ ks.covariance @ F.T + Q if update_covariance else ks.covariance
    )
    return KalmanState(state=state, next_state=next_state, covariance=covariance)


def euler_state_transition_matrix(
    time_step: float, observed_states: int, order: int
) -> np.ndarray:
    """Constant-derivative Taylor-block transition matrix
    (KalmanForecast::create_euler_state_transition_matrix,
    forecast.cpp:212-275): block (i, i+j) = dt^j / j! on the diagonal of
    each observed-state group."""
    n = observed_states * (order + 1)
    matrix = np.zeros((n, n))
    for derivative in range(order + 1):
        for state in range(observed_states):
            row = derivative * observed_states + state
            for j in range(order - derivative + 1):
                col = (derivative + j) * observed_states + state
                matrix[row, col] = time_step**j / math.factorial(j)
    return matrix
