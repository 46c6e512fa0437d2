"""Scenario test cases (reference src/test/case/).

- ``base``: simulator + actor with the assisted-manipulation objective and
  the master DEFAULT_CONFIGURATION (base.hpp:61-196), full CSV logging.
- ``external_wrench``: adds the PID human model pulling the end effector
  toward a reference trajectory by applying wrench
  (external_wrench.cpp:168-234).
- ``circle`` / ``figure_eight`` / ``lissajous`` / ``rectangle`` / ``pose``:
  thin config patches over external_wrench selecting the trajectory type
  (circle.hpp:37-58 et al.) — the experiment matrix.
- ``reach``: TrackPoint objective patch over base (reach.hpp:48-67).
- ``angles``: quaternion round-trip check (angles.hpp:27-35).
- ``trajectory``: trajectory generator playback to CSV (trajectory.cpp:
  144-169, headless).

Tests compose by patching other tests' defaults (DEFAULT_PATCH class attr),
exactly the reference's merge-patch composition. The reference wart that
JSON merge-patch cannot express "disable the optional forecast"
(documented at pose.hpp:50-60) is fixed with an explicit
``forecast.enabled`` flag.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax.numpy as jnp

from .. import config as cfg
from ..forecast import forecast as fc
from ..logging.csv_logger import (
    CSVWriter,
    DynamicsLogger,
    ForecastLogger,
    MPPILogger,
    ObjectiveLogger,
    PIDLogger,
)
from ..sim import pid as pid_module
from ..sim import trajectories
from ..sim.actor import Actor, Configuration as ActorConfiguration
from .runner import register_test


@dataclasses.dataclass
class BaseConfiguration:
    """Master defaults (base.hpp:61-196): sim dt 0.005 s, duration 15 s,
    MPPI 50+2 rollouts / horizon 0.3 s / 20 Hz controller."""

    duration: float = 15.0
    time_step: float = 0.005
    # Checkpoint/resume (SURVEY §5.4; VERDICT r4 weak #7): snapshot the
    # full live state (plant, planner incl. RNG and elite noise, forecast
    # filter, PID states, rate countdowns) to <folder>/checkpoint.npz every
    # this many SIM seconds (0 = disabled). ``--resume <run_folder>``
    # truncates the CSV tree to the snapshot and continues the run
    # bit-exactly (threefry keys make the continuation deterministic).
    # Host engine only — the episode engine is one device dispatch.
    checkpoint_interval: float = 0.0
    # "host": per-tick loop, reference-faithful interleaving + live logging.
    # "episode": the whole experiment as ONE jitted lax.scan (sim/episode.py)
    # with the observability stream collected on device and the CSV tree
    # written post-hoc — the mode to use on TPU, where per-tick dispatch
    # latency makes the host loop orders of magnitude slower.
    engine: str = "host"
    # Pace the host engine to wall clock at 1/time_step Hz — the harness
    # analog of the reference's raisim::TimedLoop (base.cpp:157), which is
    # what a hardware-in-the-loop deployment runs. Unlike the reference
    # (which silently drops late ticks) overruns are COUNTED and written to
    # pacing.json in the run folder. Host engine only: the episode engine
    # is one device dispatch and has nothing to pace (the offline latency
    # budget for that path is scripts/realtime_check.py).
    realtime: bool = False
    actor: ActorConfiguration = dataclasses.field(default_factory=ActorConfiguration)


@register_test("base")
class BaseTest:
    """Canonical sim: actor + loggers, no external wrench (base.hpp:15)."""

    CONFIG_CLASS = BaseConfiguration
    DEFAULT_PATCH: dict = {}

    def __init__(self, folder: str, patch: dict = None, duration: float = None):
        merged = cfg.merge_patch(dict(self.DEFAULT_PATCH), patch or {})
        self.configuration = cfg.patched(self.CONFIG_CLASS(), merged)
        if duration is not None:
            self.configuration.duration = duration
        self.folder = folder

        self.actor = Actor(self.configuration.actor, self.configuration.time_step)
        planner = self.actor.planner
        # optimal_rollout_mode="batch" is accepted: every backend streams
        # the zero-noise rollout's per-step states out of the batch, so
        # optimal_rollout.csv and optimal_cost.csv stay populated — they
        # describe the PRE-update shifted optimal (one update of lag vs the
        # reference's post-update re-rollout, mppi.cpp:450-479; documented
        # at mppi.Configuration.optimal_rollout_mode). "resimulate" remains
        # the reference-parity default.
        self.mppi_logger = MPPILogger(
            os.path.join(folder, "mppi"),
            planner.rollout_count,
            planner.plant.control_dof,
            planner.steps,
        )
        self.dynamics_logger = DynamicsLogger(os.path.join(folder, "dynamics"))
        self.forecast_logger = (
            ForecastLogger(os.path.join(folder, "forecast"))
            if self.actor.dynamics_forecast is not None
            else None
        )
        term_names = getattr(self.actor.objective, "TERM_NAMES", None)
        if term_names is None:
            term_names = ("point", "joint_limit", "self_collision", "reach")
        self.objective_logger = ObjectiveLogger(
            os.path.join(folder, "objective"), term_names
        )
        self.time = 0.0
        self._last_logged_forecast = -1.0
        self._start_tick = 0
        self.extra_setup(folder)

    def extra_setup(self, folder: str):
        pass

    def pre_step(self, time):
        """Subclass hook: runs before actor.act each tick."""

    def step(self):
        """One sim tick (base.cpp:128-148): act, then log."""
        import time as walltime

        self.pre_step(self.time)
        start = walltime.perf_counter()
        self.actor.act(self.time)
        duration = walltime.perf_counter() - start

        planner_state = self.actor.planner_state
        if self.actor.last_update_info is not None:
            self.mppi_logger.log(
                int(planner_state.update_count),
                self.time,
                self.actor.last_update_info,
                planner_state.optimal_control,
                duration,
                self.actor.configuration.mppi.time_step,
            )
        self.dynamics_logger.log(
            self.time, self.actor.x, self.actor.aux, self.actor.control
        )
        if (
            self.forecast_logger is not None
            and self.actor.last_forecast_rollout is not None
            and float(self.actor.ctx.start_time) != self._last_logged_forecast
        ):
            self._last_logged_forecast = float(self.actor.ctx.start_time)
            self.forecast_logger.log(
                self._last_logged_forecast,
                self.actor.dynamics_forecast.configuration.time_step,
                self.actor.last_forecast_rollout,
            )
        terms = self.actor.objective.terms(
            self.actor.x,
            self.actor.control,
            self.actor.aux,
            jnp.asarray(self.time),
            self.actor.ctx,
        )
        self.objective_logger.log(self.time, terms)
        self.time += self.configuration.time_step

    def run(self) -> bool:
        if self.configuration.engine == "episode":
            if self.configuration.realtime:
                raise ValueError(
                    "realtime pacing requires the host engine (the episode "
                    "engine is one device dispatch; use "
                    "scripts/realtime_check.py for its latency budget)"
                )
            return self._run_episode()
        import json as jsonlib
        import time as walltime

        ticks = int(self.configuration.duration / self.configuration.time_step)
        progress_every = max(1, ticks // 20)
        # Flush the CSV tree every ~1 s of WALL time so a live observer
        # (analysis.py watch — the RaiSim-Unity-server analog) sees the
        # run grow instead of buffered-empty files.
        paced = self.configuration.realtime
        dt = self.configuration.time_step
        interval = self.configuration.checkpoint_interval
        next_checkpoint = (
            self.time + interval if interval > 0 else float("inf")
        )
        overruns = 0
        start_wall = walltime.perf_counter()
        next_deadline = start_wall + dt
        next_flush = start_wall + 1.0
        for i in range(self._start_tick, ticks):
            self.step()
            if self.time >= next_checkpoint - 1e-9:
                self.write_checkpoint(i + 1)
                next_checkpoint += interval
            if walltime.perf_counter() >= next_flush:
                self.flush_loggers()
                next_flush = walltime.perf_counter() + 1.0
            if paced:
                # TimedLoop semantics (base.cpp:157): sleep out the rest of
                # the slot; a late tick counts as an overrun and the clock
                # resynchronizes (the reference silently skips the wait).
                now = walltime.perf_counter()
                if now > next_deadline:
                    overruns += 1
                    next_deadline = now + dt
                else:
                    walltime.sleep(next_deadline - now)
                    next_deadline += dt
            if i % progress_every == 0:
                print(".", end="", flush=True)
        print()
        if paced:
            elapsed = walltime.perf_counter() - start_wall
            pacing = {
                "tick_hz": round(1.0 / dt, 1),
                "ticks": ticks,
                "overruns": overruns,
                "overrun_rate": round(overruns / max(1, ticks), 4),
                "wall_s": round(elapsed, 3),
                "simulated_s": round(ticks * dt, 3),
                "realtime_factor": round(ticks * dt / elapsed, 4),
            }
            with open(os.path.join(self.folder, "pacing.json"), "w") as f:
                jsonlib.dump(pacing, f, indent=1)
            print(
                f"realtime pacing: {pacing['overruns']}/{pacing['ticks']} "
                f"overruns at {pacing['tick_hz']} Hz "
                f"(realtime factor {pacing['realtime_factor']})"
            )
        return bool(np.isfinite(np.asarray(self.actor.x)).all())

    # --- checkpoint / resume (SURVEY §5.4) ---------------------------------

    def _ctx_template(self):
        """Structure-matching ForecastContext for checkpoint restore (the
        live ctx shapes are fixed by the forecast configuration)."""
        from ..objectives.assisted_manipulation import ForecastContext

        cfg = self.actor.dynamics_forecast.configuration
        return ForecastContext(
            wrench_horizon=jnp.zeros((cfg.steps + 1, 6), dtype=jnp.float32),
            start_time=jnp.zeros((), dtype=jnp.float32),
            time_step=cfg.time_step,
            horizon=cfg.horizon,
        )

    def _checkpoint_state(self, template: bool = False):
        """The live-state pytree a checkpoint captures: plant state, full
        planner state (optimal control, elite noise, RNG, SG history),
        forecast filter state, rate countdowns. ``template=True`` builds
        the structure-matching restore template from a fresh test."""
        actor = self.actor
        tree = {
            "x": actor.x,
            # aux is deliberately the PREVIOUS tick's pre-step aux (the
            # plant step returns pre-step aux with that step's solved
            # accelerations — make_plant_step docstring), so it must be
            # snapshotted, not recomputed from x on restore.
            "aux": actor.aux,
            "planner_state": actor.planner_state,
            "control": actor.control,
            "trajectory_countdown": np.asarray(actor._trajectory_countdown),
            "forecast_countdown": np.asarray(actor._forecast_countdown),
        }
        if actor.wrench_forecast is not None:
            tree["forecast_state"] = actor.forecast_state
        if actor.dynamics_forecast is not None:
            tree["ctx"] = self._ctx_template() if template else actor.ctx
        return tree

    def _restore_state(self, tree, metadata):
        actor = self.actor
        actor.x = tree["x"]
        actor.aux = tree["aux"]
        actor.planner_state = tree["planner_state"]
        actor.control = tree["control"]
        actor._trajectory_countdown = int(tree["trajectory_countdown"])
        actor._forecast_countdown = int(tree["forecast_countdown"])
        actor._pending_wrench = jnp.zeros(6, dtype=actor.dtype)
        actor.last_forecast_rollout = None
        actor.last_update_info = None
        if "forecast_state" in tree:
            actor.forecast_state = tree["forecast_state"]
        if "ctx" in tree:
            ctx = tree["ctx"]
            # time_step/horizon are static floats in the planner's trace;
            # the npz round-trip turned them into arrays.
            actor.ctx = ctx._replace(
                time_step=float(ctx.time_step), horizon=float(ctx.horizon)
            )
        self.time = float(metadata["time"])
        self._start_tick = int(metadata["tick"])
        self.mppi_logger._last_update = metadata["mppi_last_update"]
        self._last_logged_forecast = metadata["last_logged_forecast"]

    def write_checkpoint(self, tick: int):
        """Flush the CSV tree and snapshot the live state + per-file byte
        sizes (resume truncates each CSV back to exactly this point)."""
        from .. import checkpoint as checkpoint_module

        self.flush_loggers()
        sizes = {}
        for dirpath, _, files in os.walk(self.folder):
            for name in files:
                if name.endswith(".csv"):
                    path = os.path.join(dirpath, name)
                    sizes[os.path.relpath(path, self.folder)] = (
                        os.path.getsize(path)
                    )
        checkpoint_module.save_checkpoint(
            os.path.join(self.folder, "checkpoint.npz"),
            self._checkpoint_state(),
            metadata={
                "test": type(self).TEST_NAME,
                "time": self.time,
                "tick": tick,
                "mppi_last_update": self.mppi_logger._last_update,
                "last_logged_forecast": self._last_logged_forecast,
                "file_sizes": sizes,
            },
        )

    @classmethod
    def resume(cls, run_folder: str):
        """Rebuild this test over an existing run folder and continue from
        its checkpoint: CSVs truncate to the snapshot's byte sizes and the
        loggers reopen in append mode, so the finished tree is identical
        to an uninterrupted run (modulo host-measured update durations)."""
        import json as jsonlib

        from .. import checkpoint as checkpoint_module
        from ..logging import csv_logger

        path = os.path.join(run_folder, "checkpoint.npz")
        metadata = checkpoint_module.load_metadata(path)
        with open(os.path.join(run_folder, "configuration.json")) as handle:
            tree = jsonlib.load(handle)
        if tree.get("engine") == "episode":
            raise ValueError("resume requires the host engine")
        for rel, size in metadata["file_sizes"].items():
            target = os.path.join(run_folder, rel)
            if os.path.exists(target):
                os.truncate(target, size)
        with csv_logger.append_mode():
            test = cls(folder=run_folder, patch=tree)
        state = checkpoint_module.restore_checkpoint(
            path, test._checkpoint_state(template=True)
        )
        test._restore_state(state, metadata)
        return test

    # --- episode engine: one device program + post-hoc CSV writing ---------

    def _episode_human(self):
        """(trajectory, pid_configuration, wrench_enabled, orientation,
        torque_pid_configuration, torque_enabled) for the human model; base
        has none (base.hpp:15)."""
        return (
            trajectories.PointTrajectory(trajectories.PointConfiguration()),
            None,
            False,
            None,
            None,
            False,
        )

    def _run_episode(self) -> bool:
        import time as walltime

        import jax
        from ..sim.episode import Episode, EpisodeConfiguration

        acfg = self.configuration.actor
        (
            trajectory,
            pid_configuration,
            wrench_enabled,
            orientation_trajectory,
            torque_pid_configuration,
            torque_enabled,
        ) = self._episode_human()
        forecast_enabled = acfg.forecast is not None and acfg.forecast.enabled
        if forecast_enabled:
            strategy = fc.create(acfg.forecast.end_effector_wrench_forecast)
            forecast_cfg = acfg.forecast.configuration
            forecast_dt = forecast_cfg.time_step
            forecast_horizon = forecast_cfg.horizon
        else:
            strategy = None  # Episode's default Kalman; zero wrench in, zero out
            forecast_dt, forecast_horizon = acfg.mppi.time_step, acfg.mppi.horizon

        episode = Episode(
            acfg.mppi,
            self.actor.objective,
            trajectory,
            EpisodeConfiguration(
                duration=self.configuration.duration,
                time_step=self.configuration.time_step,
                controller_rate=acfg.controller_rate,
                forecast_time_step=forecast_dt,
                forecast_horizon=forecast_horizon,
                wrench_enabled=wrench_enabled,
                torque_enabled=torque_enabled,
            ),
            wrench_strategy=strategy,
            robot_configuration=acfg.dynamics,
            pid_configuration=pid_configuration,
            collect_logs=True,
            filter_fn=self.actor.planner.filter_fn,
            orientation_trajectory=orientation_trajectory,
            torque_pid_configuration=torque_pid_configuration,
        )
        start = walltime.perf_counter()
        outputs, logs = episode.run(seed=0)
        jax.block_until_ready(outputs.ee_position)
        wall = walltime.perf_counter() - start
        print(f"episode: {episode.ticks} ticks in {wall:.1f}s (one dispatch)")
        self._write_episode_logs(episode, outputs, logs, wall)
        return bool(np.isfinite(np.asarray(logs.x)).all())

    def _write_episode_logs(self, episode, outputs, logs, wall):
        import jax

        from ..models import frankaridgeback as fr
        from ..objectives.assisted_manipulation import ForecastContext

        # The episode ran on the accelerator; the log post-processing is
        # tiny host-side math (3000-state FK, 300 objective evaluations) —
        # pin it to the CPU backend so it doesn't burn accelerator compiles.
        logs = jax.device_get(logs)
        outputs = jax.device_get(outputs)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            self._write_episode_logs_host(episode, outputs, logs, wall)

    def _write_episode_logs_host(self, episode, outputs, logs, wall):
        import jax

        from ..models import frankaridgeback as fr
        from ..objectives.assisted_manipulation import ForecastContext

        dt = self.configuration.time_step
        ticks = episode.ticks
        times = np.arange(ticks) * dt

        x_np = np.asarray(logs.x, dtype=np.float64)
        control_np = np.asarray(outputs.control, dtype=np.float64)
        aux = jax.vmap(lambda s: fr.derive_aux(episode.model, s))(
            jnp.asarray(logs.x)
        )

        class _Row:
            """Lightweight aux view: just the fields DynamicsLogger reads,
            pre-fetched as stacked host arrays (one transfer, not 3000)."""

            __slots__ = ("ee_position", "ee_orientation",
                         "ee_linear_velocity", "ee_angular_velocity",
                         "ee_linear_acceleration", "ee_angular_acceleration",
                         "joint_power")

        ee_pos = np.asarray(aux.ee_position)
        ee_quat = np.asarray(aux.ee_orientation)
        ee_lin = np.asarray(aux.ee_linear_velocity)
        ee_ang = np.asarray(aux.ee_angular_velocity)
        # Accelerations + joint power come from the scan itself (they need
        # the solved qdd and applied torque, EpisodeLogs fields).
        ee_lin_acc = np.asarray(logs.ee_linear_acceleration)
        ee_ang_acc = np.asarray(logs.ee_angular_acceleration)
        joint_power = np.asarray(logs.joint_power)
        for i in range(ticks):
            row = _Row()
            row.ee_position = ee_pos[i]
            row.ee_orientation = ee_quat[i]
            row.ee_linear_velocity = ee_lin[i]
            row.ee_angular_velocity = ee_ang[i]
            row.ee_linear_acceleration = ee_lin_acc[i]
            row.ee_angular_acceleration = ee_ang_acc[i]
            row.joint_power = float(joint_power[i])
            self.dynamics_logger.log(float(times[i]), x_np[i], row, control_np[i])

        fired = np.asarray(logs.update_fired)
        update_ticks = np.flatnonzero(fired)
        mean_duration = wall / max(len(update_ticks), 1)
        info_np = jax.device_get(logs.update_info)
        optimal_np = np.asarray(logs.optimal_control, dtype=np.float64)
        forecast_np = jax.device_get(logs.forecast)
        mppi_dt = self.actor.configuration.mppi.time_step
        forecast_dt = episode.dynamics_forecast.configuration.time_step
        forecast_horizon = episode.dynamics_forecast.configuration.horizon

        # Objective terms for all update ticks in ONE vmapped call
        # (per-tick dispatch costs more than the math).
        wrench_fired = forecast_np.wrench[update_ticks]  # (U, H, 6)
        wrench_nodes = jnp.asarray(
            np.concatenate([wrench_fired, wrench_fired[:, -1:]], axis=1)
        )
        times_fired = jnp.asarray(times[update_ticks], dtype=jnp.float32)
        terms_batched = jax.vmap(
            lambda x, u, a, t, w: self.actor.objective.terms(
                x,
                u,
                a,
                t,
                ForecastContext(
                    wrench_horizon=w,
                    start_time=t,
                    time_step=forecast_dt,
                    horizon=forecast_horizon,
                ),
            )
        )
        terms_all = jax.device_get(
            terms_batched(
                jnp.asarray(logs.x[update_ticks]),
                jnp.asarray(outputs.control[update_ticks]),
                jax.tree.map(lambda a: a[update_ticks], aux),
                times_fired,
                wrench_nodes,
            )
        )

        for count, i in enumerate(update_ticks, start=1):
            t = float(times[i])
            info_row = jax.tree.map(lambda a: a[i], info_np)
            self.mppi_logger.log(
                count, t, info_row, optimal_np[i], mean_duration, mppi_dt
            )
            if self.forecast_logger is not None:
                roll_row = jax.tree.map(lambda a: a[i], forecast_np)
                self.forecast_logger.log(t, forecast_dt, roll_row)
            self.objective_logger.log(
                t, {k: v[count - 1] for k, v in terms_all.items()}
            )
        self._log_episode_extras(times, logs)

    def _log_episode_extras(self, times, logs):
        """Subclass hook (the external-wrench family logs the PID here)."""

    def flush_loggers(self):
        """Push buffered CSV rows to disk mid-run (live observability)."""
        self.mppi_logger.flush()
        self.dynamics_logger.flush()
        if self.forecast_logger is not None:
            self.forecast_logger.flush()
        self.objective_logger.flush()
        pid_logger = getattr(self, "pid_logger", None)
        if pid_logger is not None:
            pid_logger.flush()
        torque_pid_logger = getattr(self, "torque_pid_logger", None)
        if torque_pid_logger is not None:
            torque_pid_logger.flush()

    def close(self):
        self.mppi_logger.close()
        self.dynamics_logger.close()
        if self.forecast_logger is not None:
            self.forecast_logger.close()
        self.objective_logger.close()


@dataclasses.dataclass
class ExternalWrenchConfiguration(BaseConfiguration):
    """base + the human model (external_wrench.hpp)."""

    position: trajectories.PositionConfiguration = dataclasses.field(
        default_factory=trajectories.PositionConfiguration
    )
    orientation: trajectories.OrientationConfiguration = None
    force_pid: pid_module.Configuration = dataclasses.field(
        default_factory=lambda: pid_module.HUMAN_POINT_CONTROL
    )
    # The torque PID exists whenever the case does (the reference constructs
    # it and its logger unconditionally, external_wrench.cpp:88-117) but
    # only drives the wrench torque channel when torque_enabled — the
    # reference's intended-but-dead path (external_wrench.cpp:214-221 is
    # commented out; QuaternionPID::update is empty, pid.cpp:122-125). The
    # default preserves the reference's zero-torque behavior.
    torque_pid: pid_module.Configuration = dataclasses.field(
        default_factory=lambda: pid_module.HUMAN_ORIENTATION_CONTROL
    )
    torque_enabled: bool = False


@register_test("external_wrench")
class ExternalWrenchTest(BaseTest):
    """PID human model applies wrench toward a reference trajectory
    (external_wrench.cpp:168-234)."""

    CONFIG_CLASS = ExternalWrenchConfiguration

    def extra_setup(self, folder: str):
        configuration = self.configuration
        self.position = trajectories.create_position(configuration.position)
        self.orientation = (
            trajectories.create_orientation(configuration.orientation)
            if configuration.orientation is not None
            else None
        )
        self.force_pid = pid_module.PID(configuration.force_pid)
        self.force_pid_state = self.force_pid.init(dtype=jnp.float32)
        self.pid_logger = PIDLogger(
            os.path.join(folder, "pid", "force"), configuration.force_pid.n
        )
        # Constructed unconditionally like the reference
        # (external_wrench.cpp:88-117): the torque logger exists (header-only
        # CSVs) even when the torque path never fires.
        self.torque_pid = pid_module.QuaternionPID(configuration.torque_pid)
        self.torque_pid_state = self.torque_pid.init(dtype=jnp.float32)
        self.torque_pid_logger = PIDLogger(
            os.path.join(folder, "pid", "torque"),
            configuration.torque_pid.n,
            reference_n=4,
        )

    def pre_step(self, time):
        """Human wrench = PID(reference(t) - ee_position)
        (external_wrench.cpp:185-231). The orientation/torque path is
        commented out in the reference and stays off by default; with
        ``torque_enabled`` the quaternion PID drives the torque channel
        toward the orientation trajectory (the intended semantics of
        external_wrench.cpp:214-221)."""
        reference = self.position.position(jnp.asarray(float(time)))
        self.force_pid_state = self.force_pid.set_reference(
            self.force_pid_state, reference
        )
        ee_position = jnp.asarray(self.actor.aux.ee_position, dtype=jnp.float32)
        self.force_pid_state = self.force_pid.update(
            self.force_pid_state, ee_position, time
        )
        self.pid_logger.log(time, self.force_pid_state)

        torque = jnp.zeros(3, dtype=jnp.float32)
        if self.orientation is not None and self.configuration.torque_enabled:
            reference_quat = self.orientation.orientation(
                jnp.asarray(float(time))
            ).astype(jnp.float32)
            ee_quat = jnp.asarray(
                self.actor.aux.ee_orientation, dtype=jnp.float32
            )
            self.torque_pid_state = self.torque_pid.update_quaternion(
                self.torque_pid_state, ee_quat, reference_quat, time
            )
            torque = self.torque_pid_state.control
            # Log with the quaternion reference in xyzw (reference_dof=4,
            # external_wrench.cpp:105-110; Eigen coeffs order like
            # dynamics/end_effector_orientation.csv).
            q = np.asarray(reference_quat, dtype=np.float64)
            self.torque_pid_logger.log(
                time,
                self.torque_pid_state._replace(
                    reference=np.array([q[1], q[2], q[3], q[0]])
                ),
            )

        wrench = jnp.concatenate(
            [
                jnp.asarray(self.force_pid_state.control, dtype=jnp.float32),
                torque,
            ]
        )
        self.actor.add_end_effector_wrench(wrench, time)

    def _checkpoint_state(self, template: bool = False):
        tree = super()._checkpoint_state(template)
        tree["force_pid_state"] = self.force_pid_state
        tree["torque_pid_state"] = self.torque_pid_state
        return tree

    def _restore_state(self, tree, metadata):
        super()._restore_state(tree, metadata)
        self.force_pid_state = tree["force_pid_state"]
        self.torque_pid_state = tree["torque_pid_state"]

    def _episode_human(self):
        return (
            self.position,
            self.configuration.force_pid,
            True,
            self.orientation,
            self.configuration.torque_pid,
            self.configuration.torque_enabled,
        )

    def _log_episode_extras(self, times, logs):
        import jax

        pid_np = jax.device_get(logs.pid)

        class _Row:
            __slots__ = ("reference", "last_error", "cumulative_error",
                         "saturation", "control")

        for i in range(len(times)):
            row = _Row()
            row.reference = pid_np.reference[i]
            row.last_error = pid_np.last_error[i]
            row.cumulative_error = pid_np.cumulative_error[i]
            row.saturation = pid_np.saturation[i]
            row.control = pid_np.control[i]
            self.pid_logger.log(float(times[i]), row)

        if self.orientation is not None and self.configuration.torque_enabled:
            torque_np = jax.device_get(logs.torque_pid)
            quat_np = np.asarray(
                jax.device_get(logs.torque_reference), dtype=np.float64
            )
            for i in range(len(times)):
                row = _Row()
                # wxyz -> xyzw for the CSV (Eigen coeffs order).
                q = quat_np[i]
                row.reference = np.array([q[1], q[2], q[3], q[0]])
                row.last_error = torque_np.last_error[i]
                row.cumulative_error = torque_np.cumulative_error[i]
                row.saturation = torque_np.saturation[i]
                row.control = torque_np.control[i]
                self.torque_pid_logger.log(float(times[i]), row)

    def close(self):
        super().close()
        self.pid_logger.close()
        self.torque_pid_logger.close()


# --- the experiment matrix: trajectory patches (circle.hpp:37-58 etc.) -------


@register_test("circle")
class CircleTest(ExternalWrenchTest):
    DEFAULT_PATCH = {"position": {"type": "circle"}}


@register_test("figure_eight")
class FigureEightTest(ExternalWrenchTest):
    DEFAULT_PATCH = {"position": {"type": "figure_eight"}}


@register_test("lissajous")
class LissajousTest(ExternalWrenchTest):
    DEFAULT_PATCH = {"position": {"type": "lissajous"}}


@register_test("rectangle")
class RectangleTest(ExternalWrenchTest):
    DEFAULT_PATCH = {"position": {"type": "rectangle"}}


@register_test("pose")
class PoseTest(ExternalWrenchTest):
    DEFAULT_PATCH = {
        "position": {"type": "point", "point": {"point": [1.0, 1.0, 1.0]}}
    }


@register_test("slerp")
class SlerpTest(ExternalWrenchTest):
    """Oscillating SLERP orientation trajectory + point position patched
    onto external_wrench — the reference's ``slerp`` CLI case
    (slerp.hpp:14-67 registers it via main.cpp:16; the generator is
    trajectory.cpp:289-325, t = (sin(t)+1)/2). The reference's torque path
    is dead code (external_wrench.cpp:214-221 commented out,
    QuaternionPID::update an empty stub, pid.cpp:122-125), so
    ``torque_enabled`` defaults to False for parity; setting it True drives
    the wrench torque channel from the working quaternion PID — the
    intended closed-loop orientation behavior."""

    DEFAULT_PATCH = {
        "position": {"type": "point", "point": {"point": [1.0, 1.0, 1.0]}},
        "orientation": {"type": "slerp"},
    }


@register_test("lagrangian")
class LagrangianTest(ExternalWrenchTest):
    """The alternative-dynamics-backend case — the reference's runnable
    pinocchio scenario (test/case/pinocchio.hpp:11-60): the PLANT steps on
    the autodiff Euler-Lagrange backend (models/lagrangian.py) while the
    MPPI rollouts keep the analytic CRBA/RNEA kernel — the mixed
    plant/rollout configuration ActorDynamics::create selects
    (actor_dynamics.hpp:146-213). Same circle scenario as the experiment
    matrix so the CSV trees are directly comparable across backends."""

    DEFAULT_PATCH = {
        "position": {"type": "circle"},
        "actor": {
            "dynamics": {
                "dynamics_type": "lagrangian",
                "rollout_dynamics_type": "analytic",
            }
        },
    }


@register_test("reach")
class ReachTest(BaseTest):
    """TrackPoint objective patch over base (reach.hpp:48-67)."""

    DEFAULT_PATCH = {
        "actor": {
            "objective": {"type": "track_point"},
            "forecast": {"enabled": False},
        }
    }


@register_test("trajectory")
class TrajectoryPlaybackTest:
    """Sample each trajectory generator to CSV (the reference renders them
    in the visualizer, trajectory.cpp:144-169; headless here)."""

    def __init__(self, folder: str, patch: dict = None, duration: float = None):
        self.configuration = {"duration": duration or 10.0}
        self.folder = folder
        self.duration = duration or 10.0

    def run(self) -> bool:
        cases = {
            "circle": trajectories.CircularTrajectory(
                trajectories.CircularConfiguration()
            ),
            "rectangle": trajectories.RectangularTrajectory(
                trajectories.RectangularConfiguration()
            ),
            "lissajous": trajectories.LissajousTrajectory(
                trajectories.LissajousConfiguration()
            ),
            "figure_eight": trajectories.FigureEightTrajectory(
                trajectories.FigureEightConfiguration()
            ),
        }
        times = np.arange(0.0, self.duration, 0.05)
        for name, trajectory in cases.items():
            writer = CSVWriter(
                os.path.join(self.folder, f"{name}.csv"), ["time", "x", "y", "z"]
            )
            positions = np.asarray(trajectory.position(jnp.asarray(times)))
            for t, p in zip(times, positions):
                writer.write(float(t), p)
            writer.close()
            if not np.isfinite(positions).all():
                return False
        return True

    def close(self):
        pass


@register_test("forecast")
class ForecastTest:
    """The reference's forecast unit checks behind the CLI registry
    (forecast.cpp:14-160, listed by ``-l`` via test.hpp:233-261): LOCF
    carry-forward/expiry (forecast.cpp:23-60), the windowed-average golden
    sequence (forecast.cpp:62-101), and the order-1 Kalman linear-tracking
    run, logged to kalman.csv for offline inspection exactly like the
    reference's visual check (forecast.cpp:103-160)."""

    def __init__(self, folder: str, patch: dict = None, duration: float = None):
        self.configuration = {}
        self.folder = folder

    def run(self) -> bool:
        ok = True

        # LOCF: carries the last observation until the validity horizon,
        # then zero (forecast.cpp:23-60).
        locf = fc.LOCFForecast(fc.LOCFConfiguration(horizon=0.3, states=3))
        state = locf.init(dtype=jnp.float64)
        state = locf.update(state, np.array([1.0, 2.0, 3.0]), 1.0)
        ok &= np.allclose(
            np.asarray(locf.forecast(state, jnp.asarray(1.2))), [1, 2, 3]
        )
        ok &= np.allclose(
            np.asarray(locf.forecast(state, jnp.asarray(1.5))), [0, 0, 0]
        )

        # Average: the reference's exact golden sequence
        # (forecast.cpp:62-101).
        avg = fc.AverageForecast(
            fc.AverageConfiguration(states=3, window=1.0, max_measurements=32)
        )
        state = avg.init(dtype=jnp.float64)
        ok &= np.allclose(np.asarray(avg.forecast(state, jnp.asarray(0.0))), 0.0)
        state = avg.update(state, np.array([0.0, 1.0, 0.0]), 1.01)
        ok &= np.allclose(
            np.asarray(avg.forecast(state, jnp.asarray(5.0))), [0, 1.0, 0]
        )
        state = avg.update(state, np.array([0.0, 1.5, 0.0]), 1.5)
        ok &= np.allclose(
            np.asarray(avg.forecast(state, jnp.asarray(10.0))), [0, 1.25, 0]
        )
        state = avg.update(state, np.array([1.0, 1.0, 1.0]), 3.0)
        ok &= np.allclose(
            np.asarray(avg.forecast(state, jnp.asarray(3.0))), [1, 1, 1]
        )

        # Kalman order-1 on a linear signal, logged to CSV
        # (forecast.cpp:103-160): the forecast must extrapolate the slope.
        config = fc.KalmanForecastConfiguration(
            observed_states=6, order=1, time_step=0.01, horizon=0.3
        )
        kalman = fc.KalmanForecast(config)
        state = kalman.init(dtype=jnp.float64)
        slope = np.array([2.0, -1.0, 0.5, 0.0, 0.0, 1.0])
        writer = CSVWriter(
            os.path.join(self.folder, "kalman.csv"),
            ["time"]
            + [f"measurement_{i}" for i in range(6)]
            + [f"forecast_{i}" for i in range(6)],
        )
        t = 0.0
        for i in range(50):
            t = i * 0.01
            state = kalman.update(state, slope * t, t)
            prediction = np.asarray(
                kalman.forecast(state, jnp.asarray(t + 0.2))
            )
            writer.write(t, slope * t, prediction)
        writer.close()
        ok &= np.allclose(
            np.asarray(kalman.forecast(state, jnp.asarray(t + 0.2))),
            slope * (t + 0.2),
            atol=0.02,
        )
        # Beyond the horizon: zero (forecast.cpp:348-350).
        ok &= np.allclose(
            np.asarray(kalman.forecast(state, jnp.asarray(t + 0.5))), 0.0
        )
        return bool(ok)

    def close(self):
        pass


@register_test("angles")
class AnglesTest:
    """Quaternion <-> ZXZ euler round trip (angles.hpp:27-35)."""

    def __init__(self, folder: str, patch: dict = None, duration: float = None):
        self.configuration = {}

    def run(self) -> bool:
        from ..ops import rotations as rot

        x = jnp.asarray([0.0, 0.0, np.pi / 8])
        q = rot.euler_zxz_to_quat(x)
        back = rot.quat_to_euler_zxz(q)
        q2 = rot.euler_zxz_to_quat(back)
        return bool(
            np.allclose(
                np.asarray(rot.quat_to_matrix(q)),
                np.asarray(rot.quat_to_matrix(q2)),
                atol=1e-5,
            )
        )

    def close(self):
        pass
