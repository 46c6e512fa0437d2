"""Interleaved A/B: the batch-mode optimal-rollout states side output.

Arm "off" is the round-4 kernel (no states output); arm "on" streams the
zero-noise rollout's per-step states out of the fused sampling kernel
(PallasSampler emit_states — mppi.Configuration.optimal_rollout_mode
"batch" observability, VERDICT r4 #4). Expected cost: 24 extra (1, 128)
VMEM selects+stores per horizon step plus a ~600 KB HBM write-back per
solve against the ~74 MB the two-pass sampler already streams (<1%).

Interleaved same-process blocks (the chip's congestion episodes swing
independent runs 2x — CLAUDE.md); median of BLOCKS blocks per arm.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROLLOUTS = int(os.environ.get("AB_ROLLOUTS", 10_000)) - 2
STEPS = int(os.environ.get("AB_STEPS", 50))
BLOCKS = int(os.environ.get("AB_BLOCKS", 5))
SOLVES = int(os.environ.get("AB_SOLVES", 200))


def build(emit_states: bool):
    from assistedmanipulation_tpu import mppi as mppi_module
    from assistedmanipulation_tpu.kernels.pallas_rollout import PallasSampler
    from assistedmanipulation_tpu.models import frankaridgeback as fr
    from assistedmanipulation_tpu.models.model_data import frankaridgeback_model
    from assistedmanipulation_tpu.objectives.assisted_manipulation import (
        AssistedManipulation,
        Configuration as ObjectiveConfiguration,
    )
    from assistedmanipulation_tpu.parallel.flagship import (
        default_mppi_configuration,
        synthetic_wrench_horizons,
    )
    from assistedmanipulation_tpu.objectives.assisted_manipulation import (
        ForecastContext,
    )

    configuration = default_mppi_configuration(ROLLOUTS, STEPS)  # batch, rbg
    model = frankaridgeback_model()
    objective_cfg = ObjectiveConfiguration()
    robot_cfg = fr.Configuration()
    objective = AssistedManipulation(objective_cfg)
    plant = fr.make_plant(objective, robot_cfg, model)
    covariance = np.asarray(configuration.covariance, np.float64)
    sampler = PallasSampler(
        model,
        objective_cfg,
        robot_cfg,
        configuration.rollout_count,
        configuration.step_count,
        configuration.time_step,
        diag_scale=np.sqrt(covariance),
        sublanes=16,
        emit_states=emit_states,
    )
    planner = mppi_module.Planner(configuration, plant, sampler=sampler)
    ctx = ForecastContext(
        wrench_horizon=synthetic_wrench_horizons(STEPS),
        start_time=jnp.asarray(0.0, jnp.float32),
        time_step=0.01,
        horizon=STEPS * 0.01,
    )
    x0 = jnp.asarray(fr.make_state("huddled"), dtype=jnp.float32)
    return planner, x0, ctx


def time_block(planner, x0, ctx, solves):
    state = planner.init(seed=0)
    t = jnp.asarray(0.0, jnp.float32)
    state, _ = planner.update(state, x0, t, ctx)  # warm
    jax.block_until_ready(state.optimal_control)
    start = time.perf_counter()
    for k in range(solves):
        state, _ = planner.update(
            state, x0, jnp.asarray(0.01 * (k + 1), jnp.float32), ctx
        )
    jax.block_until_ready(state.optimal_control)
    return solves / (time.perf_counter() - start)


def main():
    arms = {"off": build(False), "on": build(True)}
    rates = {name: [] for name in arms}
    for b in range(BLOCKS):
        for name, (planner, x0, ctx) in arms.items():
            rate = time_block(planner, x0, ctx, SOLVES)
            rates[name].append(rate)
            print(f"block {b} {name}: {rate:.1f} solves/s", flush=True)
    summary = {
        name: {
            "median": float(np.median(vals)),
            "blocks": [round(v, 1) for v in vals],
        }
        for name, vals in rates.items()
    }
    summary["on_vs_off"] = round(
        summary["on"]["median"] / summary["off"]["median"], 4
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
