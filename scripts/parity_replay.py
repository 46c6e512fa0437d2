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


def franka_plant_fns(nan_control_threshold: float):
    """float64 step/cost twins of the Franka-Ridgeback plant + the full
    7-term assisted-manipulation objective, for the replayer.

    The replayer consumes a SCALAR f64 cost per step (the reference's
    composed total, cost.hpp:43-99: saturated barriers contribute
    maximum_cost=1e10 directly); the engine carries the (saturations,
    smooth) channel pair. Running the same plant on both sides with the
    two different accumulation schemes is exactly the claim under test —
    that the two-channel f32-safe accumulation reproduces the reference's
    float64 totals where barriers saturate (the plant itself is validated
    independently by tests/test_dynamics_oracle.py).

    ``nan_control_threshold``: a deterministic NaN-poisoning rule — cost is
    NaN when the elbow torque command u[5] exceeds the threshold — standing
    in for the reference's dynamics blowups (mppi.cpp:331-334 poisons the
    rollout on any NaN step cost). Applied identically on both sides.
    """
    from assistedmanipulation_tpu.models import frankaridgeback as fr
    from assistedmanipulation_tpu.mppi import BARRIER_SCALE
    from assistedmanipulation_tpu.objectives.assisted_manipulation import (
        AssistedManipulation,
        ForecastContext,
    )
    import jax.numpy as jnp

    objective = AssistedManipulation()
    plant = fr.make_plant(objective)
    # Constant 20 N x-pull forecast so the trajectory term engages; one long
    # horizon covers every update's rollout window identically on both sides.
    ctx = ForecastContext(
        wrench_horizon=jnp.zeros((201, 6), jnp.float64).at[:, 0].set(20.0),
        start_time=jnp.asarray(0.0, jnp.float64),
        time_step=0.01,
        horizon=2.0,
    )

    @jax.jit
    def _step(x, u, dt):
        aux = plant.derive(x, 0.0, ctx)
        return plant.integrate(x, u, aux, 0.0, dt, ctx)

    @jax.jit
    def _cost(x, u, t):
        aux = plant.derive(x, t, ctx)
        channels = plant.cost(x, u, aux, t, ctx)
        scalar = channels[0] * BARRIER_SCALE + channels[1]
        return jnp.where(u[5] > nan_control_threshold, jnp.nan, scalar)

    def step_fn(x, u, dt):
        return np.asarray(
            _step(jnp.asarray(x, jnp.float64), jnp.asarray(u, jnp.float64), dt),
            np.float64,
        )

    def cost_fn(x, u, t):
        return float(
            _cost(jnp.asarray(x, jnp.float64), jnp.asarray(u, jnp.float64), t)
        )

    return step_fn, cost_fn, ctx, objective, plant


def run_franka(updates: int, rollouts: int, dtype: str):
    """The Franka-plant replay: same recorded-noise protocol as ``run`` but
    on the full rigid-body plant + 7-term objective, from the out-of-bounds
    'joint_limit' preset (q[8] = -0.2 < its 0.349 lower bound,
    models/frankaridgeback.PRESETS) so barrier saturation (cost.hpp:43-99),
    elite sorting over saturated totals (mppi.cpp:219-231) and NaN poisoning
    (mppi.cpp:331-334) are all live in every update."""
    from assistedmanipulation_tpu import mppi
    from assistedmanipulation_tpu.models import frankaridgeback as fr

    nan_threshold = 5.5  # ~2 sigma of the 7.5-variance arm noise
    step_fn, cost_fn, ctx, objective, plant = franka_plant_fns(nan_threshold)

    dt = 0.01
    horizon = 0.3
    control_period = 0.05
    sim_dt = 0.005

    replay_cfg = ReplayerConfig(
        rollouts=rollouts,
        keep_best_rollouts=rollouts // 3,
        time_step=dt,
        horizon=horizon,
        gradient_step=2.0,
        cost_scale=10.0,
        cost_discount_factor=1.0,
        covariance=np.diag(fr.DEFAULT_COVARIANCE),
        control_min=fr.DEFAULT_CONTROL_MIN,
        control_max=fr.DEFAULT_CONTROL_MAX,
        smoothing_window=10,
        smoothing_order=1,
    )
    replayer = ReferenceTrajectoryReplayer(replay_cfg, step_fn, cost_fn, seed=7)

    import jax.numpy as jnp

    engine_cfg = mppi.Configuration(
        rollouts=rollouts,
        keep_best_rollouts=rollouts // 3,
        time_step=dt,
        horizon=horizon,
        gradient_step=2.0,
        cost_scale=10.0,
        covariance=fr.DEFAULT_COVARIANCE,
        control_min=fr.DEFAULT_CONTROL_MIN,
        control_max=fr.DEFAULT_CONTROL_MAX,
        smoothing=mppi.Smoothing(window=10, order=1),
        dtype=dtype,
    )

    def poisoned_cost(x, u, aux, t, c=None):
        channels = objective(x, u, aux, t, c)
        return jnp.where(u[5] > nan_threshold, jnp.nan, channels)

    engine_plant = plant._replace(cost=poisoned_cost)
    planner = mppi.Planner(engine_cfg, engine_plant)
    state = planner.init(seed=0)
    engine_ctx = jax.tree.map(
        lambda a: jnp.asarray(a, dtype) if hasattr(a, "dtype") else a, ctx
    )

    x = fr.make_state("joint_limit", energy=10.0)
    per_update = []
    nan_rollouts = 0
    saturated_rollouts = 0
    for k in range(updates):
        t = k * control_period
        recorded = replayer.update(x, t)
        state, _ = planner.update(
            state, x, t, engine_ctx, noise_override=recorded
        )
        nan_rollouts += int(np.sum(np.isnan(replayer.costs)))
        saturated_rollouts += int(
            np.sum(replayer.costs >= mppi.BARRIER_SCALE)
        )
        engine_optimal = np.asarray(state.optimal_control, np.float64)
        error = float(
            np.max(np.abs(engine_optimal - replayer.optimal_control.T))
        )
        per_update.append(error)
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
        "nan_poisoned_rollouts": nan_rollouts,
        "saturated_rollouts": saturated_rollouts,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--updates", type=int, default=12)
    parser.add_argument("--rollouts", type=int, default=30)
    parser.add_argument("--franka-updates", type=int, default=8)
    parser.add_argument("--franka-rollouts", type=int, default=32)
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
        "franka": {
            "metric": "same protocol on the Franka rigid-body plant + "
            "7-term objective with live barrier saturation and NaN "
            "poisoning (cost.hpp:43-99, mppi.cpp:331-334)",
            "float64": run_franka(
                args.franka_updates, args.franka_rollouts, "float64"
            ),
            "float32": run_franka(
                args.franka_updates, args.franka_rollouts, "float32"
            ),
        },
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
        print(
            json.dumps(
                {
                    "plant": "franka",
                    "dtype": key,
                    "control_seq_max_error": results["franka"][key][
                        "control_seq_max_error"
                    ],
                    "nan_poisoned_rollouts": results["franka"][key][
                        "nan_poisoned_rollouts"
                    ],
                    "saturated_rollouts": results["franka"][key][
                        "saturated_rollouts"
                    ],
                }
            )
        )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
