"""Actor: the composition root wiring plant dynamics + MPPI controller +
dynamics forecast, with countdown-based rate division.

Re-implements FrankaRidgeback::Actor (simulation/frankaridgeback/actor.cpp):

- the controller updates every ``controller_rate / sim_dt`` ticks with
  ``controller_substeps`` repeats (actor.cpp:166-192);
- wrench observations feed the forecast strategy at most every
  ``forecast_rate`` (actor.cpp:154-164); between controller updates the
  strategy gets prediction-only ticks (actor.cpp:194-198);
- every tick queries the interpolated control and steps the plant with the
  accumulated external wrench (actor.cpp:200-202).

The simulator split (Simulator::step = act-all -> integrate -> update-all,
simulator.cpp:40-54) collapses here: the plant step *is* the integration.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from .. import mppi
from ..forecast import forecast as fc
from ..forecast.dynamics_forecast import (
    Configuration as DynamicsForecastConfiguration,
    DynamicsForecast,
)
from ..models import frankaridgeback as fr
from ..models.model_data import frankaridgeback_model
from ..objectives.assisted_manipulation import (
    AssistedManipulation,
    Configuration as AssistedManipulationConfiguration,
)
from ..objectives.track_point import (
    Configuration as TrackPointConfiguration,
    TrackPoint,
)
from ..safety import Configuration as SafetyConfiguration


@dataclasses.dataclass
class ObjectiveConfiguration:
    type: str = "assisted_manipulation"
    assisted_manipulation: Optional[AssistedManipulationConfiguration] = None
    track_point: Optional[TrackPointConfiguration] = None


@dataclasses.dataclass
class ForecastConfiguration:
    # merge-patch can't express "delete the optional forecast" (the
    # reference documents this wart at pose.hpp:50-60); an explicit flag can.
    enabled: bool = True
    configuration: DynamicsForecastConfiguration = dataclasses.field(
        default_factory=DynamicsForecastConfiguration
    )
    end_effector_wrench_forecast: fc.Configuration = dataclasses.field(
        default_factory=lambda: fc.Configuration(
            type="kalman",
            kalman=fc.KalmanForecastConfiguration(
                observed_states=6,
                time_step=0.01,
                horizon=0.3,
                order=1,
            ),
        )
    )


@dataclasses.dataclass
class Configuration:
    """Mirror of Actor::Configuration defaults (base.hpp:68-151)."""

    mppi: mppi.Configuration = dataclasses.field(
        default_factory=lambda: mppi.Configuration(
            rollouts=50,
            keep_best_rollouts=20,
            time_step=0.01,
            horizon=0.3,
            gradient_step=2.0,
            cost_scale=10.0,
            cost_discount_factor=1.0,
            covariance=fr.DEFAULT_COVARIANCE,
            control_bound=True,
            control_min=fr.DEFAULT_CONTROL_MIN,
            control_max=fr.DEFAULT_CONTROL_MAX,
            control_default=np.zeros(12),
            smoothing=mppi.Smoothing(window=10, order=1),
        )
    )
    dynamics: fr.Configuration = dataclasses.field(default_factory=fr.Configuration)
    objective: ObjectiveConfiguration = dataclasses.field(
        default_factory=ObjectiveConfiguration
    )
    forecast: Optional[ForecastConfiguration] = dataclasses.field(
        default_factory=ForecastConfiguration
    )
    controller_rate: float = 0.05
    controller_substeps: int = 1
    forecast_rate: float = 0.0
    # Optional QP trajectory safety filter (safety.Configuration). None =
    # disabled, matching the reference actor's nullptr filter
    # (actor.cpp:96-101).
    safety_filter: Optional[SafetyConfiguration] = None


class Actor:
    """Stateful host-side wrapper (the per-tick loop is host logic at
    ~200 Hz; all math inside is jitted)."""

    def __init__(
        self,
        configuration: Configuration,
        sim_time_step: float,
        dtype=jnp.float32,
    ):
        if configuration.controller_substeps < 1:
            raise ValueError("actor substeps must be at least one")
        self.configuration = configuration
        self.dtype = dtype
        self.model = frankaridgeback_model()

        # Objective (actor.cpp:20-48).
        obj_cfg = configuration.objective
        if obj_cfg.type == "assisted_manipulation":
            self.objective = AssistedManipulation(
                obj_cfg.assisted_manipulation
                or AssistedManipulationConfiguration()
            )
        elif obj_cfg.type == "track_point":
            self.objective = TrackPoint(
                obj_cfg.track_point or TrackPointConfiguration()
            )
        else:
            raise ValueError(f"unknown objective type {obj_cfg.type}")

        plant = fr.make_plant(
            self.objective, configuration.dynamics, self.model
        )
        # Optional QP safety filter (the reference's actor always passed a
        # nullptr filter because TrajectorySafetyFilter was a stub,
        # actor.cpp:96-101; ours is real — safety.make_safety_filter).
        filter_fn = None
        if configuration.safety_filter is not None:
            from .. import safety as safety_module

            filter_fn = safety_module.make_safety_filter(
                configuration.safety_filter
            )
        self.planner = mppi.Planner(
            configuration.mppi, plant, filter_fn=filter_fn
        )
        self.plant_step = fr.make_plant_step(configuration.dynamics, self.model)
        # Backend for the actor's own aux queries, matching plant_step's
        # (the SimulatorDynamics type seam, actor_dynamics.cpp:46-86).
        self._backend = fr.factory.create(
            configuration.dynamics.dynamics_type
        )

        # Forecast (actor.cpp:55-80).
        if configuration.forecast is not None and configuration.forecast.enabled:
            self.wrench_forecast = fc.create(
                configuration.forecast.end_effector_wrench_forecast
            )
            self.dynamics_forecast = DynamicsForecast(
                configuration.forecast.configuration,
                configuration.dynamics,
                self.model,
            )
        else:
            self.wrench_forecast = None
            self.dynamics_forecast = None

        # Rate division (actor.cpp:107-116).
        self._controller_countdown_max = int(
            configuration.controller_rate / sim_time_step
        )
        self._forecast_countdown_max = int(
            configuration.forecast_rate / sim_time_step
        )
        self._sim_time_step = sim_time_step

        self.reset()

    def reset(self, initial_state: Optional[np.ndarray] = None):
        initial, _, _ = self.configuration.dynamics.resolve()
        if initial_state is not None:
            initial = np.asarray(initial_state)
        self.x = jnp.asarray(initial, dtype=self.dtype)
        self.planner_state = self.planner.init()
        self.forecast_state = (
            self.wrench_forecast.init(self.dtype)
            if self.wrench_forecast is not None
            else None
        )
        self.ctx = None
        self.control = jnp.zeros(12, dtype=self.dtype)
        self.aux = fr.derive_aux(self.model, self.x, backend=self._backend)
        self.last_forecast_rollout = None
        self.last_update_info = None
        self._trajectory_countdown = 0  # update on first tick (actor.cpp:147)
        self._forecast_countdown = 0
        self._pending_wrench = jnp.zeros(6, dtype=self.dtype)

    # -- observation path (actor.cpp:154-164) --------------------------------

    def add_end_effector_wrench(self, wrench, time):
        """Apply an external wrench this tick and feed the forecast."""
        self._pending_wrench = self._pending_wrench + jnp.asarray(
            wrench, dtype=self.dtype
        )
        if self.wrench_forecast is not None and self._forecast_countdown <= 0:
            self.forecast_state = self.wrench_forecast.update(
                self.forecast_state, jnp.asarray(wrench, dtype=self.dtype), time
            )
            self._forecast_countdown = self._forecast_countdown_max

    # -- control path (actor.cpp:166-203) ------------------------------------

    def act(self, time):
        """One simulator tick: maybe update the controller, query the
        interpolated control, step the plant."""
        self._trajectory_countdown -= 1
        if self._trajectory_countdown <= 0:
            self._trajectory_countdown = self._controller_countdown_max

            if self.dynamics_forecast is not None:
                strategy, strategy_state = self.wrench_forecast, self.forecast_state
                rollout, self.ctx = self.dynamics_forecast.forecast(
                    self.x,
                    time,
                    lambda t: strategy.forecast(strategy_state, t),
                )
                self.last_forecast_rollout = rollout

            for _ in range(self.configuration.controller_substeps):
                self.planner_state, self.last_update_info = self.planner.update(
                    self.planner_state, self.x, time, self.ctx
                )

        if self.wrench_forecast is not None:
            if self._forecast_countdown != self._forecast_countdown_max:
                self.forecast_state = self.wrench_forecast.observe_time(
                    self.forecast_state, time
                )
            self._forecast_countdown -= 1

        self.control = self.planner.get(self.planner_state, time)
        self.x, self.aux = self.plant_step(
            self.x, self.control, self._pending_wrench, self._sim_time_step
        )
        self._pending_wrench = jnp.zeros(6, dtype=self.dtype)
        return self.control
