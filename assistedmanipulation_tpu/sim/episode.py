"""Fully-jitted experiment episode: the whole control experiment as one
device program.

The reference runs its experiments as a host loop at 200 Hz with a
thread-pooled controller (base.cpp:150-163 + actor.cpp:166-203). The
TPU-native equivalent compiles the *entire episode* — human-model PID wrench,
forecast observation, controller updates at the configured rate division,
plant integration — into a single ``lax.scan`` over simulator ticks. One
dispatch runs 15 simulated seconds; outputs (end-effector trace, applied
wrench, reference trajectory, tank energy) land as device arrays for the
analysis metrics (mean user force, tracking RMSE — analysis.py:350-504).

The controller update fires inside ``lax.cond`` on the countdown, exactly
mirroring the actor's rate division (actor.cpp:172-192).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np
import jax
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
    ForecastContext,
)
from . import pid as pid_module
from . import trajectories


class EpisodeOutputs(NamedTuple):
    ee_position: jax.Array  # (ticks, 3)
    reference: jax.Array  # (ticks, 3)
    wrench: jax.Array  # (ticks, 6)
    control: jax.Array  # (ticks, 12)
    tank_energy: jax.Array  # (ticks,)
    optimal_cost: jax.Array  # (ticks,)


class EpisodeLogs(NamedTuple):
    """Full observability stream for the harness CSV tree
    (``collect_logs=True``): everything the host-loop loggers consume,
    collected inside the scan and written post-hoc in one pass. Per-update
    structures are zero-filled on ticks where the controller did not fire."""

    x: jax.Array  # (ticks, state_dof) plant state
    pid: object  # stacked sim.pid.PIDState
    update_fired: jax.Array  # (ticks,) bool
    update_info: object  # stacked mppi.UpdateInfo (zeros when not fired)
    optimal_control: jax.Array  # (ticks, steps, dof) (zeros when not fired)
    forecast: object  # stacked ForecastRollout (zeros when not fired)
    ee_linear_acceleration: jax.Array  # (ticks, 3) classical J̇v + Jq̈
    ee_angular_acceleration: jax.Array  # (ticks, 3)
    joint_power: jax.Array  # (ticks,) tau . v (raisim_dynamics.cpp:176-179)
    torque_pid: object  # stacked sim.pid.PIDState (zeros when torque off)
    torque_reference: jax.Array  # (ticks, 4) wxyz quat (zeros when off)


@dataclasses.dataclass
class EpisodeConfiguration:
    duration: float = 15.0
    time_step: float = 0.005
    controller_rate: float = 0.05
    forecast_time_step: float = 0.01
    forecast_horizon: float = 0.3
    wrench_enabled: bool = True  # False = "unassisted-of-wrench" base run
    # Drive the torque channel of the human wrench from the quaternion PID
    # against the orientation trajectory — the reference's intended-but-dead
    # path (external_wrench.cpp:214-221 is commented out and
    # QuaternionPID::update is an empty stub, pid.cpp:122-125). Defaults to
    # the reference's zero-torque reality.
    torque_enabled: bool = False
    # False = the "unassisted" rows of the reference experiment tables
    # (analysis.py:439-460): no wrench forecast reaches the planner, so the
    # trajectory/assistance term is zero (assisted_manipulation.cpp:237-240
    # returns 0 without a forecast) and the human gets no intent-directed
    # help.
    assisted: bool = True
    # Whether the MPPI controller runs at all. In the reference the
    # controller ALWAYS runs — an unassisted run still optimizes the
    # posture terms (velocity redistribution, manipulability, limits), so
    # the base actively follows a dragged arm (actor.cpp:166-203 has no
    # off-switch). False = plant-only (zero commands: PD holds the
    # base/gripper, the arm is gravity-compensated) — a harsher condition
    # with no reference analog, kept for plant-isolation diagnostics
    # (scripts/force_offset_sweep.py measured it at +19-23% human force:
    # circle 33.2 N off vs 27.8 on, ref 24.8; rectangle 42.7 vs 38.3,
    # ref 34.2).
    controller_enabled: bool = True


class Episode:
    """Compiles one experiment configuration into a single jitted run."""

    def __init__(
        self,
        mppi_configuration: mppi.Configuration,
        objective,
        trajectory,
        episode: EpisodeConfiguration = None,
        wrench_strategy=None,
        robot_configuration: fr.Configuration = None,
        pid_configuration: pid_module.Configuration = None,
        dtype=jnp.float32,
        collect_logs: bool = False,
        filter_fn=None,
        model=None,
        orientation_trajectory=None,
        torque_pid_configuration: pid_module.Configuration = None,
    ):
        """``model`` overrides the robot model (e.g. a
        ``frankaridgeback_model()._replace(friction=...)`` variant for
        plant-parameter sweeps, scripts/force_offset_sweep.py).

        ``orientation_trajectory`` + ``episode.torque_enabled`` drive the
        wrench torque channel from the quaternion PID (the slerp scenario,
        slerp.hpp:14-67)."""
        self.episode = episode or EpisodeConfiguration()
        if collect_logs and not self.episode.assisted:
            raise ValueError("collect_logs requires an assisted episode")
        self.collect_logs = collect_logs
        self._filter_fn = filter_fn
        self.dtype = dtype
        self.model = model if model is not None else frankaridgeback_model()
        self.robot_configuration = robot_configuration or fr.Configuration()
        _, self._kp, self._kd = self.robot_configuration.resolve()
        # The dynamics-backend seam the reference's SimulatorDynamics type
        # selects (actor_dynamics.cpp:46-86): the engine's own plant
        # quantities honor dynamics_type, not just make_plant's rollouts.
        self._backend = fr.factory.create(
            self.robot_configuration.dynamics_type
        )

        self.objective = objective
        plant = fr.make_plant(objective, self.robot_configuration, self.model)
        self.planner = mppi.Planner(
            mppi_configuration, plant, filter_fn=filter_fn
        )
        self.trajectory = trajectory
        self.pid = pid_module.PID(
            pid_configuration or pid_module.HUMAN_POINT_CONTROL
        )
        # Always constructed, like the reference (external_wrench.cpp:88-95);
        # active only with an orientation trajectory + torque_enabled.
        self.orientation_trajectory = orientation_trajectory
        self.torque_pid = pid_module.QuaternionPID(
            torque_pid_configuration or pid_module.HUMAN_ORIENTATION_CONTROL
        )
        self._torque_on = (
            orientation_trajectory is not None and self.episode.torque_enabled
        )
        self.wrench_strategy = wrench_strategy or fc.KalmanForecast(
            fc.KalmanForecastConfiguration(
                observed_states=6,
                order=1,
                time_step=self.episode.forecast_time_step,
                horizon=self.episode.forecast_horizon,
            )
        )
        self.dynamics_forecast = DynamicsForecast(
            DynamicsForecastConfiguration(
                time_step=self.episode.forecast_time_step,
                horizon=self.episode.forecast_horizon,
            ),
            self.robot_configuration,
            self.model,
        )

        self.ticks = int(round(self.episode.duration / self.episode.time_step))
        self.countdown_max = int(
            round(self.episode.controller_rate / self.episode.time_step)
        )
        self._run = jax.jit(self._run_impl)

    def init_carry(self, seed: int = 0):
        initial, _, _ = self.robot_configuration.resolve()
        return (
            jnp.asarray(initial, dtype=self.dtype),
            self.planner.init(seed=seed),
            self.wrench_strategy.init(self.dtype),
            self.pid.init(self.dtype),
            self.torque_pid.init(self.dtype),
            jnp.asarray(0, dtype=jnp.int32),  # countdown: update on first tick
        )

    def run(self, seed: int = 0) -> EpisodeOutputs:
        return self._run(self.init_carry(seed))

    def _run_impl(self, carry) -> EpisodeOutputs:
        dt = self.episode.time_step
        kp = jnp.asarray(self._kp, dtype=self.dtype)
        kd = jnp.asarray(self._kd, dtype=self.dtype)
        model = self.model
        planner = self.planner
        strategy = self.wrench_strategy
        forecaster = self.dynamics_forecast
        pid = self.pid
        trajectory = self.trajectory
        wrench_on = self.episode.wrench_enabled

        torque_pid = self.torque_pid
        orientation = self.orientation_trajectory
        torque_on = self._torque_on

        def tick(carry, k):
            (
                x, planner_state, strategy_state, pid_state, torque_state,
                countdown,
            ) = carry
            t = k.astype(self.dtype) * dt

            aux = fr.derive_aux(model, x, backend=self._backend)

            # Human model wrench (external_wrench.cpp:185-231).
            reference = trajectory.position(t).astype(self.dtype)
            pid_state = pid.set_reference(pid_state, reference)
            pid_state = pid.update(pid_state, aux.ee_position, t)
            if torque_on:
                # The reference's intended torque path
                # (external_wrench.cpp:214-221, commented out there):
                # quaternion PID toward the orientation trajectory.
                reference_quat = orientation.orientation(t).astype(self.dtype)
                torque_state = torque_pid.update_quaternion(
                    torque_state, aux.ee_orientation, reference_quat, t
                )
                torque = torque_state.control
            else:
                reference_quat = jnp.zeros(4, dtype=self.dtype)
                torque = jnp.zeros(3, dtype=self.dtype)
            wrench = jnp.concatenate([pid_state.control, torque])
            if not wrench_on:
                wrench = jnp.zeros(6, dtype=self.dtype)

            # Forecast observation every tick (forecast_rate = 0,
            # base.hpp:150, actor.cpp:154-163).
            strategy_state = strategy.update(strategy_state, wrench, t)

            fire = jnp.asarray(False)
            update_extras = None
            if self.episode.controller_enabled:
                # Controller update at the rate division (actor.cpp:172-192).
                def do_update(operand):
                    planner_state, x, strategy_state = operand
                    if self.episode.assisted:
                        rollout, ctx = forecaster.forecast(
                            x, t,
                            lambda tq: strategy.forecast(strategy_state, tq),
                        )
                    else:
                        # No forecast: the trajectory/assistance term is
                        # inactive (assisted_manipulation.cpp:237-240), the
                        # posture terms still optimize.
                        rollout, ctx = None, None
                    new_state, info = planner._update_impl(planner_state, x, t, ctx)
                    return new_state, (info, new_state.optimal_control, rollout)

                def skip_update(operand):
                    planner_state, _, _ = operand
                    shapes = jax.eval_shape(do_update, operand)
                    zeros = jax.tree.map(
                        lambda s: jnp.zeros(s.shape, s.dtype), shapes[1]
                    )
                    return planner_state, zeros

                fire = countdown <= 0
                planner_state, update_extras = jax.lax.cond(
                    fire, do_update, skip_update, (planner_state, x, strategy_state)
                )
                countdown = jnp.where(fire, self.countdown_max - 1, countdown - 1)

                u = planner._get_impl(planner_state, t)
            else:
                # Unassisted: zero commands — PD holds the base/gripper, the
                # arm is gravity-compensated, the human drags the robot.
                u = jnp.zeros(planner.plant.control_dof, dtype=self.dtype)
            x_next, qdd, tau = fr.integrate_with_wrench_extras(
                model, kp, kd, x, u, aux, wrench, dt
            )

            outputs = EpisodeOutputs(
                ee_position=aux.ee_position,
                reference=reference,
                wrench=wrench,
                control=u,
                tank_energy=x[fr.ENERGY],
                optimal_cost=planner_state.optimal_cost,
            )
            if self.collect_logs:
                info, optimal_control, forecast_rollout = update_extras
                aux_full = fr.simulation_extras(
                    model, aux, x, tau, qdd, backend=self._backend
                )
                logs = EpisodeLogs(
                    x=x,
                    pid=pid_state,
                    update_fired=fire,
                    update_info=info,
                    optimal_control=optimal_control,
                    forecast=forecast_rollout,
                    ee_linear_acceleration=aux_full.ee_linear_acceleration,
                    ee_angular_acceleration=aux_full.ee_angular_acceleration,
                    joint_power=aux_full.joint_power,
                    torque_pid=torque_state,
                    torque_reference=reference_quat,
                )
                outputs = (outputs, logs)
            return (
                x_next, planner_state, strategy_state, pid_state, torque_state,
                countdown,
            ), outputs

        _, outputs = jax.lax.scan(
            tick, carry, jnp.arange(self.ticks, dtype=jnp.int32)
        )
        return outputs


def episode_metrics(outputs: EpisodeOutputs) -> dict:
    """The analysis summary metrics (analysis.py:350-504): mean user force
    magnitude and reference-tracking RMSE."""
    force = np.linalg.norm(np.asarray(outputs.wrench[:, :3], dtype=np.float64), axis=-1)
    error = np.asarray(outputs.ee_position, dtype=np.float64) - np.asarray(
        outputs.reference, dtype=np.float64
    )
    rmse = float(np.sqrt(np.mean(np.sum(error**2, axis=-1))))
    return {
        "mean_force": float(force.mean()),
        "max_force": float(force.max()),
        "rmse": rmse,
        "final_energy": float(np.asarray(outputs.tank_energy)[-1]),
    }
