"""Measure the BASELINE "control-seq max error" metric.

Runs the float64 reference-pipeline replayer (assistedmanipulation_tpu/
parity.py — mt19937 serial column noise, elite sort/shift, min-max softmax
optimise, MovingExtendedWindow Savitzky-Golay evolution) for N consecutive
updates on the point-mass plant (BASELINE config 1), feeds the *same
recorded noise* to the JAX engine each update, and records the maximum
absolute difference between the two published control sequences.

The plant state evolves closed-loop between updates (sim dt 0.005, control
period 0.05 — the reference's BaseTest rates, base.hpp:65,148) using the
replayer's published control, so both engines score identical states and
the error isolates the update pipeline (rollout, weighting, gradient, SG
window evolution, shift, clip) across updates.

Writes PARITY_CONTROL_SEQ.json at the repo root:
  float64: engine parity at the reference's own precision;
  float32: the production TPU dtype (divergence here is f32 rounding, not
  semantics).

Usage: python scripts/parity_replay.py [--updates 12] [--rollouts 30]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from assistedmanipulation_tpu import mppi  # noqa: E402
from assistedmanipulation_tpu.models import point_mass  # noqa: E402
from assistedmanipulation_tpu.parity import (  # noqa: E402
    ReferenceTrajectoryReplayer,
    ReplayerConfig,
)

TARGET = np.array([1.0, 1.0])
COVARIANCE = np.array([[0.5, 0.1], [0.1, 0.4]])


def numpy_plant():
    """float64 twin of models/point_mass.py (same constants)."""
    config = point_mass.PointMassConfig()

    def step_fn(x, u, dt):
        v = x[2:] + u * dt
        p = x[:2] + v * dt
        return np.concatenate([p, v])

    def cost_fn(x, u, t):
        return (
            config.position_cost * np.sum((x[:2] - TARGET) ** 2)
            + config.velocity_cost * np.sum(x[2:] ** 2)
            + config.control_cost * np.sum(u**2)
        )

    return step_fn, cost_fn


def run(updates: int, rollouts: int, dtype: str):
    steps_horizon = 0.3
    dt = 0.01
    control_period = 0.05
    sim_dt = 0.005

    replay_cfg = ReplayerConfig(
        rollouts=rollouts,
        keep_best_rollouts=rollouts // 3,
        time_step=dt,
        horizon=steps_horizon,
        gradient_step=2.0,
        cost_scale=10.0,
        cost_discount_factor=1.0,
        covariance=COVARIANCE,
        control_min=-np.ones(2),
        control_max=np.ones(2),
        smoothing_window=10,
        smoothing_order=1,
    )
    step_fn, cost_fn = numpy_plant()
    replayer = ReferenceTrajectoryReplayer(replay_cfg, step_fn, cost_fn, seed=7)

    engine_cfg = mppi.Configuration(
        rollouts=rollouts,
        keep_best_rollouts=rollouts // 3,
        time_step=dt,
        horizon=steps_horizon,
        gradient_step=2.0,
        cost_scale=10.0,
        covariance=COVARIANCE,
        control_min=-np.ones(2),
        control_max=np.ones(2),
        smoothing=mppi.Smoothing(window=10, order=1),
        dtype=dtype,
    )
    plant = point_mass.make_point_mass_plant(
        point_mass.PointMassConfig(target=tuple(TARGET))
    )
    planner = mppi.Planner(engine_cfg, plant)
    state = planner.init(seed=0)

    x = np.zeros(4)
    per_update = []
    for k in range(updates):
        t = k * control_period
        recorded = replayer.update(x, t)
        state, _ = planner.update(state, x, t, None, noise_override=recorded)
        engine_optimal = np.asarray(state.optimal_control, np.float64)
        error = float(
            np.max(np.abs(engine_optimal - replayer.optimal_control.T))
        )
        per_update.append(error)
        # Evolve the plant to the next control tick with the replayer's
        # published control (actor.cpp:166-203 rate division).
        n_sim = int(round(control_period / sim_dt))
        for j in range(n_sim):
            tj = t + j * sim_dt
            x = step_fn(x, replayer.get(tj), sim_dt)

    return {
        "dtype": dtype,
        "updates": updates,
        "rollouts": replayer.rollout_count,
        "steps": replayer.steps,
        "control_seq_max_error": max(per_update),
        "per_update_max_error": per_update,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--updates", type=int, default=12)
    parser.add_argument("--rollouts", type=int, default=30)
    parser.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "PARITY_CONTROL_SEQ.json",
        ),
    )
    args = parser.parse_args()

    results = {
        "metric": "control-seq max error vs reference pipeline replay"
        " (BASELINE.json), recorded-noise protocol",
        "float64": run(args.updates, args.rollouts, "float64"),
        "float32": run(args.updates, args.rollouts, "float32"),
    }
    for key in ("float64", "float32"):
        print(
            json.dumps(
                {
                    "dtype": key,
                    "control_seq_max_error": results[key][
                        "control_seq_max_error"
                    ],
                }
            )
        )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
