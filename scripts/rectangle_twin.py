"""Split the assisted-rectangle residual with the reference-pipeline twin.

VERDICT r4 weak #1: the assisted rectangle is the one experiment-matrix
cell family still ~1.2x the reference (19.3-21.7 N vs 15.5-16.7 N across
all forecast modes) while the unassisted rectangle matches (34.7 vs 34.2)
— and the decisive experiment never ran: the repo owns a float64
reference-pipeline replayer (parity.py, pinned to 8e-14 against the
engine on recorded noise). THIS script runs that replayer as the
closed-loop controller on the assisted rectangle episode:

- plant: the f64 host plant step with the applied human wrench
  (fr.make_plant_step — the same plant the episode engine integrates);
- human: HUMAN_POINT_CONTROL PID toward the rectangle trajectory
  (external_wrench.cpp:185-231 semantics);
- forecast: order-1 Kalman on the wrench, DynamicsForecast ctx per update
  (the assisted kalman_1 matrix cell's configuration);
- controller: ReferenceTrajectoryReplayer — serial mt19937 column draws,
  elite sort, float64 scalar-cost accumulation, MovingExtendedWindow SG,
  the reference's own pipeline semantics rather than the engine's.

If the twin ALSO lands ~20 N, the residual is plant-side (friction/PD at
the 0.5 m/s sweep); if it lands ~15.5 N, it is engine-side (f32 /
sampler / smoothing interaction). Median of seeds, like the matrix
protocol. Writes RECTANGLE_TWIN.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def build_episode_fns():
    from assistedmanipulation_tpu.models import frankaridgeback as fr
    from assistedmanipulation_tpu.mppi import BARRIER_SCALE
    from assistedmanipulation_tpu.objectives.assisted_manipulation import (
        AssistedManipulation,
        ForecastContext,
    )

    objective = AssistedManipulation()
    rollout_plant = fr.make_plant(objective)
    plant_step = fr.make_plant_step()  # host plant with wrench input

    H = 31  # forecast nodes for a 0.3 s horizon at dt 0.01 (steps + 1)
    STEPS = 30
    DT = 0.01

    def make_ctx(wrench_horizon, start_time):
        return ForecastContext(
            wrench_horizon=wrench_horizon,
            start_time=start_time,
            time_step=DT,
            horizon=0.3,
        )

    @jax.jit
    def _batched_rollout(noise_rds, optimal_ds, x0, t0, wrench, start):
        """All rollouts' f64 cost totals in one call. Per-rollout the step
        order and f64 accumulation match the serial replayer exactly (no
        cross-rollout reduction exists in mppi.cpp:309-342 — only the
        noise DRAWS are serial-order-sensitive, and those stay in numpy)."""
        ctx = make_ctx(wrench, start)
        R = noise_rds.shape[0]

        def body(carry, inputs):
            x, total = carry  # (R, 31), (R,)
            u_ds, noise_rd, s = inputs  # (D,), (R, D), scalar step
            t = t0 + s * DT
            u = u_ds[None, :] + noise_rd
            aux = jax.vmap(lambda xi: rollout_plant.derive(xi, t, ctx))(x)
            cost = jax.vmap(
                lambda xi, ui, ai: rollout_plant.cost(xi, ui, ai, t, ctx)
            )(x, u, aux)
            scalar = cost[:, 0] * BARRIER_SCALE + cost[:, 1]
            total = total + scalar  # discount factor 1.0; NaN propagates
            x = jax.vmap(
                lambda xi, ui, ai: rollout_plant.integrate(
                    xi, ui, ai, t, DT, ctx
                )
            )(x, u, aux)
            return (x, total), None

        steps = jnp.arange(STEPS, dtype=jnp.float64)
        x_init = jnp.broadcast_to(x0, (R,) + x0.shape)
        (_, total), _ = jax.lax.scan(
            body,
            (x_init, jnp.zeros((R,), jnp.float64)),
            (
                jnp.moveaxis(optimal_ds, 1, 0),
                jnp.moveaxis(noise_rds, 2, 0),
                steps,
            ),
        )
        return total

    @jax.jit
    def _filter_rollout(optimal_ds, x0, t0, wrench, start):
        """The published-cost re-rollout (mppi.cpp:450-479), one scan."""
        ctx = make_ctx(wrench, start)

        def body(carry, inputs):
            x, total = carry
            u, s = inputs
            t = t0 + s * DT
            aux = rollout_plant.derive(x, t, ctx)
            cost = rollout_plant.cost(x, u, aux, t, ctx)
            total = total + cost[0] * BARRIER_SCALE + cost[1]
            x = rollout_plant.integrate(x, u, aux, t, DT, ctx)
            return (x, total), None

        steps = jnp.arange(STEPS, dtype=jnp.float64)
        (_, total), _ = jax.lax.scan(
            body, (x0, jnp.asarray(0.0, jnp.float64)),
            (jnp.moveaxis(optimal_ds, 1, 0), steps),
        )
        return total

    @jax.jit
    def _plant_step(x, u, wrench, dt):
        x_next, aux = plant_step(x, u, wrench, dt)
        return x_next, aux.ee_position

    return _batched_rollout, _filter_rollout, _plant_step, H


def run_episode(seed: int, duration: float, assisted: bool = True):
    from assistedmanipulation_tpu.forecast import forecast as fc
    from assistedmanipulation_tpu.models import frankaridgeback as fr
    from assistedmanipulation_tpu.parity import (
        ReferenceTrajectoryReplayer,
        ReplayerConfig,
    )
    from assistedmanipulation_tpu.sim import pid as pid_module
    from assistedmanipulation_tpu.sim import trajectories

    batched_rollout, filter_rollout, plant_step, H = build_episode_fns()

    sim_dt = 0.005
    control_period = 0.05
    ticks = int(round(duration / sim_dt))

    # The kalman_1 matrix cell's forecast (ForecastConfiguration defaults).
    strategy = fc.KalmanForecast(
        fc.KalmanForecastConfiguration(
            observed_states=6, order=1, time_step=0.01, horizon=0.3
        )
    )

    # The ctx wrench nodes are the strategy's forecast at the rollout node
    # times — independent of the DynamicsForecast plant rollout (its body
    # queries wrench_at(t) only; the rolled plant feeds the forecast CSVs,
    # not the ctx). Calling DynamicsForecast.forecast here would also
    # re-trace its un-jitted lax.scan EVERY update (fresh closure), which
    # leaks LLVM code memory until "Cannot allocate memory" after ~200
    # updates — one jitted node evaluator instead.
    @jax.jit
    def kalman_nodes(strategy_state, t0):
        times = t0 + jnp.arange(30, dtype=jnp.float64) * 0.01
        nodes = jax.vmap(lambda tq: strategy.forecast(strategy_state, tq))(
            times
        )
        return jnp.concatenate([nodes, nodes[-1:]], axis=0)

    # Mutable per-update forecast ctx consumed by the replayer's rollouts.
    current = {"wrench": np.zeros((H, 6)), "start": 0.0}

    class BatchedReplayer(ReferenceTrajectoryReplayer):
        """The serial replayer with its rollout/filter loops replaced by
        ONE jitted f64 batch per update. Per-rollout semantics (step
        order, f64 accumulation, NaN propagation) are unchanged — the
        reference's rollout loop has no cross-rollout arithmetic
        (mppi.cpp:309-342); only the serial mt19937 noise draws and the
        serial likelihood/gradient accumulation are order-sensitive, and
        those stay in the parent's numpy code verbatim."""

        def _rollout(self):
            totals = np.asarray(
                batched_rollout(
                    jnp.asarray(self.noise, jnp.float64),
                    jnp.asarray(self.optimal_control_shifted, jnp.float64),
                    jnp.asarray(self.rollout_state, jnp.float64),
                    jnp.asarray(self.rollout_time, jnp.float64),
                    jnp.asarray(current["wrench"], jnp.float64),
                    jnp.asarray(current["start"], jnp.float64),
                ),
                np.float64,
            )
            self.costs[:] = totals

        def _filter(self):
            self.optimal_cost = float(
                filter_rollout(
                    jnp.asarray(self.optimal_control_shifted, jnp.float64),
                    jnp.asarray(self.rollout_state, jnp.float64),
                    jnp.asarray(self.rollout_time, jnp.float64),
                    jnp.asarray(current["wrench"], jnp.float64),
                    jnp.asarray(current["start"], jnp.float64),
                )
            )

    def _unused_step(x, u, dt):  # the batched paths replace these
        raise AssertionError

    replayer = BatchedReplayer(
        ReplayerConfig(
            rollouts=50,
            keep_best_rollouts=20,
            time_step=0.01,
            horizon=0.3,
            gradient_step=2.0,
            cost_scale=10.0,
            cost_discount_factor=1.0,
            covariance=np.diag(np.asarray(fr.DEFAULT_COVARIANCE)),
            control_min=np.asarray(fr.DEFAULT_CONTROL_MIN, np.float64),
            control_max=np.asarray(fr.DEFAULT_CONTROL_MAX, np.float64),
            smoothing_window=10,
            smoothing_order=1,
        ),
        _unused_step,
        _unused_step,
        seed=seed,
    )

    # strategy.update carries an eager lax.scan (the horizon roll) that
    # would re-trace per tick — jit it once; time args as traced arrays.
    strategy_update = jax.jit(strategy.update)

    trajectory = trajectories.RectangularTrajectory(
        trajectories.RectangularConfiguration()
    )
    pid = pid_module.PID(pid_module.HUMAN_POINT_CONTROL)
    pid_state = pid.init(dtype=jnp.float64)
    strategy_state = strategy.init(jnp.float64)

    x = np.asarray(fr.Configuration().resolve()[0], np.float64)
    aux0 = None
    # EE position of the initial state for the first PID tick.
    from assistedmanipulation_tpu.models import frankaridgeback as fr_mod

    ee_position = np.asarray(
        fr_mod.derive_aux(fr_mod.frankaridgeback_model(), jnp.asarray(x)).ee_position,
        np.float64,
    )

    countdown = 0
    forces = []
    wall = time.perf_counter()
    for k in range(ticks):
        t = k * sim_dt

        reference = np.asarray(trajectory.position(jnp.asarray(float(t))))
        pid_state = pid.set_reference(pid_state, reference)
        pid_state = pid.update(pid_state, ee_position, t)
        force = np.asarray(pid_state.control, np.float64)
        wrench = np.concatenate([force, np.zeros(3)])
        forces.append(np.linalg.norm(force))

        strategy_state = strategy_update(
            strategy_state,
            jnp.asarray(wrench),
            jnp.asarray(t, jnp.float64),
        )

        countdown -= 1
        if countdown <= 0:
            countdown = int(round(control_period / sim_dt))
            if assisted:
                current["wrench"] = np.asarray(
                    kalman_nodes(
                        strategy_state, jnp.asarray(t, jnp.float64)
                    ),
                    np.float64,
                )
            else:
                # Unassisted = no forecast reaches the planner; the
                # trajectory/assistance term is inactive on zero wrench
                # (assisted_manipulation.cpp:237-240).
                current["wrench"] = np.zeros((H, 6))
            current["start"] = float(t)
            replayer.update(x, t)

        control = replayer.get(t)
        x_next, ee = plant_step(
            jnp.asarray(x, jnp.float64),
            jnp.asarray(control, jnp.float64),
            jnp.asarray(wrench, jnp.float64),
            sim_dt,
        )
        x = np.asarray(x_next, np.float64)
        ee_position = np.asarray(ee, np.float64)
        if k % 200 == 0:
            print(
                f"seed {seed} t={t:5.2f}s mean|F| so far "
                f"{np.mean(forces):6.2f} N ({time.perf_counter()-wall:.0f}s)",
                flush=True,
            )
        if not np.isfinite(x).all():
            raise RuntimeError(f"NaN state at t={t}")

    forces = np.asarray(forces)
    return {
        "seed": seed,
        "mean_force": float(forces.mean()),
        "max_force": float(forces.max()),
        "wall_s": round(time.perf_counter() - wall, 1),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--duration", type=float, default=15.0)
    parser.add_argument("--seeds", default="0,1,2")
    args = parser.parse_args()

    seeds = [int(s) for s in args.seeds.split(",")]
    cells = [run_episode(s, args.duration, assisted=True) for s in seeds]
    unassisted = [
        run_episode(s, args.duration, assisted=False) for s in seeds
    ]
    result = {
        "metric": "rectangle_twin_mean_force",
        "controller": "float64 reference-pipeline replayer (parity.py), "
        "closed loop on the rectangle",
        "duration": args.duration,
        "cells": cells,
        "median_mean_force": float(
            np.median([c["mean_force"] for c in cells])
        ),
        "unassisted_cells": unassisted,
        "unassisted_median_mean_force": float(
            np.median([c["mean_force"] for c in unassisted])
        ),
        "engine_assisted_rectangle_range": [19.3, 21.7],
        "reference_assisted_rectangle_range": [15.5, 16.7],
        "unassisted_rectangle": {"engine": 34.74, "reference": 34.17},
    }
    print(json.dumps(result))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "RECTANGLE_TWIN.json"), "w") as handle:
        json.dump(result, handle, indent=1)


if __name__ == "__main__":
    main()
