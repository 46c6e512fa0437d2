"""Vector PID controller (the human model in the experiment harness).

Functional re-implementation of controller::PID (src/controller/pid.cpp:
34-90): proportional + finite-difference derivative + integral with
saturation and anti-windup (error integrates only where the control is not
saturated, pid.cpp:77-86). Presets HUMAN_POINT_CONTROL (kp 300, kd 10, ki 5,
bounds +/-100 N, pid.hpp:55-63) and HUMAN_ORIENTATION_CONTROL
(pid.hpp:240-247).

The reference's QuaternionPID::update body is empty (pid.cpp:122-125) and
the orientation wrench path is commented out of the harness
(external_wrench.cpp:214-221); a working quaternion error PID is provided
here for completeness but defaults stay unused, matching the experiments.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..ops.rotations import quat_conjugate, quat_multiply


@dataclasses.dataclass
class Configuration:
    n: int = 3
    kp: Optional[np.ndarray] = None
    kd: Optional[np.ndarray] = None
    ki: Optional[np.ndarray] = None
    minimum: Optional[np.ndarray] = None
    maximum: Optional[np.ndarray] = None
    reference: Optional[np.ndarray] = None
    initial_time: float = 0.0


HUMAN_POINT_CONTROL = Configuration(
    n=3,
    kp=np.full(3, 300.0),
    kd=np.full(3, 10.0),
    ki=np.full(3, 5.0),
    minimum=np.full(3, -100.0),
    maximum=np.full(3, 100.0),
    reference=np.zeros(3),
)

HUMAN_ORIENTATION_CONTROL = Configuration(
    n=3,
    kp=np.full(3, 500.0),
    kd=np.full(3, 50.0),
    ki=np.zeros(3),
    minimum=np.full(3, -10000.0),
    maximum=np.full(3, 10000.0),
    reference=np.zeros(3),
)


class PIDState(NamedTuple):
    reference: jnp.ndarray  # (n,)
    last_error: jnp.ndarray  # (n,)
    cumulative_error: jnp.ndarray  # (n,)
    saturation: jnp.ndarray  # (n,) 1.0 where saturated last update
    control: jnp.ndarray  # (n,)
    last_time: jnp.ndarray  # scalar
    derivative_valid: jnp.ndarray  # bool


class PID:
    def __init__(self, configuration: Configuration):
        c = configuration
        n = c.n
        for name in ("kp", "kd", "ki", "minimum", "maximum", "reference"):
            value = getattr(c, name)
            if value is not None and len(np.asarray(value)) != n:
                raise ValueError(f"pid {name} must have dimension {n}")
        self.configuration = c
        self._kp = np.asarray(c.kp if c.kp is not None else np.zeros(n))
        self._kd = np.asarray(c.kd if c.kd is not None else np.zeros(n))
        self._ki = np.asarray(c.ki if c.ki is not None else np.zeros(n))
        self._minimum = np.asarray(
            c.minimum if c.minimum is not None else np.full(n, -np.inf)
        )
        self._maximum = np.asarray(
            c.maximum if c.maximum is not None else np.full(n, np.inf)
        )
        self._reference = np.asarray(
            c.reference if c.reference is not None else np.zeros(n)
        )

    def init(self, dtype=jnp.float64) -> PIDState:
        n = self.configuration.n
        return PIDState(
            reference=jnp.asarray(self._reference, dtype=dtype),
            last_error=jnp.zeros(n, dtype=dtype),
            cumulative_error=jnp.zeros(n, dtype=dtype),
            saturation=jnp.zeros(n, dtype=dtype),
            control=jnp.zeros(n, dtype=dtype),
            last_time=jnp.asarray(self.configuration.initial_time, dtype=dtype),
            derivative_valid=jnp.asarray(False),
        )

    def set_reference(self, state: PIDState, reference) -> PIDState:
        return state._replace(
            reference=jnp.asarray(reference, dtype=state.reference.dtype)
        )

    def update(self, state: PIDState, observation, time) -> PIDState:
        """One PID tick (pid.cpp:50-90). Monotonic-time and first-update
        bootstrap semantics preserved."""
        dtype = state.control.dtype
        time = jnp.asarray(time, dtype=dtype)
        observation = jnp.asarray(observation, dtype=dtype)
        kp = jnp.asarray(self._kp, dtype=dtype)
        kd = jnp.asarray(self._kd, dtype=dtype)
        ki = jnp.asarray(self._ki, dtype=dtype)
        minimum = jnp.asarray(self._minimum, dtype=dtype)
        maximum = jnp.asarray(self._maximum, dtype=dtype)

        stale = time <= state.last_time
        dt = jnp.where(stale, 1.0, time - state.last_time)
        error = state.reference - observation

        raw = (
            kp * error
            + kd * (error - state.last_error) / dt
            + ki * state.cumulative_error
        )
        control = jnp.clip(raw, minimum, maximum)
        saturation = ((control >= maximum) | (control <= minimum)).astype(dtype)
        cumulative = state.cumulative_error + error * (1.0 - saturation) * dt

        bootstrap = ~state.derivative_valid
        new_state = PIDState(
            reference=state.reference,
            last_error=jnp.where(stale, state.last_error, error),
            cumulative_error=jnp.where(
                stale | bootstrap, state.cumulative_error, cumulative
            ),
            saturation=jnp.where(stale | bootstrap, state.saturation, saturation),
            control=jnp.where(stale | bootstrap, state.control, control),
            last_time=jnp.where(stale, state.last_time, time),
            derivative_valid=state.derivative_valid | ~stale,
        )
        return new_state


class QuaternionPID(PID):
    """Orientation PID on the rotation-vector error between quaternions —
    the working version of the reference's empty QuaternionPID::update
    (pid.cpp:122-125)."""

    def update_quaternion(self, state: PIDState, observation_quat, reference_quat, time):
        error_quat = quat_multiply(reference_quat, quat_conjugate(observation_quat))
        # Rotation vector (small-angle 2*vec part with sign fix).
        sign = jnp.where(error_quat[..., 0] < 0, -1.0, 1.0)
        rotvec = 2.0 * sign * error_quat[..., 1:]
        state = state._replace(reference=jnp.zeros_like(state.reference))
        return self.update(state, -rotvec, time)
