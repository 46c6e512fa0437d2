"""DynamicsForecast: open-loop rollout of the robot under the forecast wrench.

Re-implements FrankaRidgeback::DynamicsForecast (frankaridgeback/dynamics.hpp
:122-408, dynamics.cpp:58-140): before each controller update, a dedicated
dynamics instance rolls the current state forward over the horizon with ZERO
control and the forecast wrench injected each step, caching per-step joint
positions, end-effector states, powers, tank energy, and the wrench itself.
The objective's trajectory term reads the cached wrench through a handle —
here a ForecastContext pytree passed to the planner as ctx.

One jitted scan; the wrench query uses the strategy's cached horizon.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import frankaridgeback as fr
from ..models.model_data import RobotModel, frankaridgeback_model
from ..objectives.assisted_manipulation import ForecastContext


@dataclasses.dataclass
class Configuration:
    """Mirror of DynamicsForecast::Configuration (dynamics.hpp:176-196)."""

    time_step: float = 0.01
    horizon: float = 0.3

    @property
    def steps(self) -> int:
        import math

        return int(math.ceil(self.horizon / self.time_step))


class ForecastRollout(NamedTuple):
    """Cached horizon (the reference's m_* vectors, dynamics.cpp:96-101)."""

    joint_positions: jnp.ndarray  # (steps, 12)
    ee_positions: jnp.ndarray  # (steps, 3)
    ee_orientations: jnp.ndarray  # (steps, 4)
    ee_linear_velocities: jnp.ndarray  # (steps, 3)
    ee_angular_velocities: jnp.ndarray  # (steps, 3)
    ee_linear_accelerations: jnp.ndarray  # (steps, 3)
    ee_angular_accelerations: jnp.ndarray  # (steps, 3)
    joint_power: jnp.ndarray  # (steps,)
    external_power: jnp.ndarray  # (steps,)
    energy: jnp.ndarray  # (steps,)
    wrench: jnp.ndarray  # (steps, 6)


class DynamicsForecast:
    """Rolls the plant under zero control + forecast wrench."""

    def __init__(
        self,
        configuration: Configuration = None,
        robot_configuration: fr.Configuration = None,
        model: RobotModel = None,
        gravity=(0.0, 0.0, 9.81),
    ):
        self.configuration = configuration or Configuration()
        self.model = model or frankaridgeback_model()
        self.robot_configuration = robot_configuration or fr.Configuration()
        _, self._kp, self._kd = self.robot_configuration.resolve()
        self._gravity = gravity

    def forecast(self, x, time, wrench_at) -> tuple[ForecastRollout, ForecastContext]:
        """Roll out from state ``x`` at ``time``; ``wrench_at(t) -> (6,)``
        queries the wrench strategy's cached horizon (dynamics.cpp:104-138).

        joint_power is h(q, v) . v — the generalized force the reference's
        act() installed (gravity/Coriolis compensation; control is zero here)
        dotted with the velocity (raisim_dynamics.cpp:176-179). The external
        power is control^T J^T w = 0 under zero control
        (raisim_dynamics.cpp:226-234), so the tank stays constant — kept.
        """
        from ..models import dynamics as dyn
        from ..models import kinematics as kin

        cfg = self.configuration
        model = self.model
        kp = jnp.asarray(self._kp, dtype=x.dtype)
        kd = jnp.asarray(self._kd, dtype=x.dtype)
        dt = cfg.time_step
        gravity = self._gravity
        u = jnp.zeros(12, dtype=x.dtype)

        def body(carry, step):
            x = carry
            t = time + step * dt
            aux = fr.derive_aux(model, x)
            wrench = wrench_at(t).astype(x.dtype)

            q, v = x[fr.POSITION], x[fr.VELOCITY]
            h = dyn.nonlinear_effects(model, aux.fk, v, gravity)
            joint_power = h @ v
            external_power = u @ (aux.ee_jacobian.T @ wrench)

            x_next, qdd, _ = fr.integrate_with_wrench_extras(
                model, kp, kd, x, u, aux, wrench, dt
            )
            lin_acc, ang_acc = fr.ee_classical_acceleration(model, q, v, qdd)
            outputs = (
                q,
                aux.ee_position,
                aux.ee_orientation,
                aux.ee_linear_velocity,
                aux.ee_angular_velocity,
                lin_acc,
                ang_acc,
                joint_power,
                external_power,
                x[fr.ENERGY],
                wrench,
            )
            return x_next, outputs

        steps = jnp.arange(cfg.steps, dtype=x.dtype)
        _, outputs = jax.lax.scan(body, x, steps)
        rollout = ForecastRollout(*outputs)

        # The objective interpolates into steps+1 nodes; extend with the last
        # wrench (queries are clipped to the horizon anyway).
        wrench_nodes = jnp.concatenate(
            [rollout.wrench, rollout.wrench[-1:]], axis=0
        )
        ctx = ForecastContext(
            wrench_horizon=wrench_nodes,
            start_time=jnp.asarray(time, dtype=x.dtype),
            time_step=cfg.time_step,
            horizon=cfg.horizon,
        )
        return rollout, ctx
