"""Benchmark: MPPI solves/s and rollouts/s on the target hardware.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline target (BASELINE.json): >= 10,000 50-step 10-DoF rollouts per solve
at >= 100 Hz solve rate on one TPU v5e chip. vs_baseline is solve rate / 100.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def build_planner(rollouts, horizon_steps, dims):
    from assistedmanipulation_tpu import mppi
    from assistedmanipulation_tpu.models.point_mass import (
        PointMassConfig,
        make_point_mass_plant,
    )

    configuration = mppi.Configuration(
        rollouts=rollouts,
        keep_best_rollouts=rollouts // 5,
        time_step=0.01,
        horizon=horizon_steps * 0.01,
        covariance=np.full(dims, 0.5),
        control_min=np.full(dims, -10.0),
        control_max=np.full(dims, 10.0),
        smoothing=mppi.Smoothing(window=10, order=1),
    )
    plant = make_point_mass_plant(PointMassConfig(dimensions=dims))
    return mppi.Planner(configuration, plant)


def main():
    rollouts = 10_000 - 2  # +2 static rollouts -> 10k total
    horizon_steps = 50
    dims = 10  # 10-DoF point plant until the Franka-Ridgeback model lands

    planner = build_planner(rollouts, horizon_steps, dims)
    state = planner.init(seed=0)
    x0 = jnp.zeros(planner.plant.state_dof, dtype=jnp.float32)

    # Warm up / compile.
    state, _ = planner.update(state, x0, 0.0)
    jax.block_until_ready(state.optimal_control)

    iterations = 50
    t0 = time.perf_counter()
    t = 0.0
    for i in range(iterations):
        t += 0.01
        state, _ = planner.update(state, x0, t)
    jax.block_until_ready(state.optimal_control)
    elapsed = time.perf_counter() - t0

    solves_per_second = iterations / elapsed
    rollouts_per_second = solves_per_second * planner.rollout_count

    print(
        json.dumps(
            {
                "metric": f"mppi_solves_per_s_{planner.rollout_count}x{horizon_steps}x{dims}dof",
                "value": round(solves_per_second, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_second / 100.0, 3),
                "rollouts_per_s": round(rollouts_per_second),
            }
        )
    )


if __name__ == "__main__":
    main()
