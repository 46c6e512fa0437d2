"""Benchmark: MPPI solves/s and rollouts/s on the target hardware.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline target (BASELINE.json): >= 10,000 50-step 10-DoF rollouts per solve
at >= 100 Hz solve rate on one TPU v5e chip. vs_baseline = solve rate / 100.

The benchmark plant is the real thing: full Franka-Ridgeback rigid-body
dynamics (batched FK + CRBA mass matrix + implicit-PD forward dynamics) with
the 7-term assisted-manipulation objective and a live forecast context —
not a toy point mass.

Env overrides: BENCH_ROLLOUTS, BENCH_STEPS, BENCH_ITERS, BENCH_BACKEND
(pallas | lanes | vmap), BENCH_PROFILE=<dir> to capture a jax.profiler trace
of the timed iterations (SURVEY §5.1: per-kernel timing is the headline
observability the reference lacked).
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def build_franka_planner(rollouts: int, steps: int, backend: str = "lanes"):
    from assistedmanipulation_tpu import mppi
    from assistedmanipulation_tpu.models import frankaridgeback as fr
    from assistedmanipulation_tpu.objectives.assisted_manipulation import (
        AssistedManipulation,
    )

    configuration = mppi.Configuration(
        rollouts=rollouts,
        keep_best_rollouts=rollouts // 5,
        time_step=0.01,
        horizon=steps * 0.01,
        gradient_step=2.0,
        cost_scale=10.0,
        covariance=fr.DEFAULT_COVARIANCE,
        control_min=fr.DEFAULT_CONTROL_MIN,
        control_max=fr.DEFAULT_CONTROL_MAX,
        control_default=np.zeros(12),
        smoothing=mppi.Smoothing(window=10, order=1),
        dtype="float32",
        # Production serving mode: optimal-cost observability reads the
        # zero-noise batch rollout instead of a serial re-simulation (the
        # Amdahl tail — see mppi.Configuration.optimal_rollout_mode).
        # BENCH_OPTIMAL_ROLLOUT=resimulate restores reference-parity mode.
        optimal_rollout_mode=os.environ.get("BENCH_OPTIMAL_ROLLOUT", "batch"),
    )
    if backend == "lanes":
        from assistedmanipulation_tpu.kernels.lane_rollout import (
            make_lanes_planner,
        )

        return make_lanes_planner(configuration)
    if backend == "pallas":
        from assistedmanipulation_tpu.kernels.pallas_rollout import (
            make_pallas_planner,
        )

        return make_pallas_planner(configuration)
    objective = AssistedManipulation()
    plant = fr.make_plant(objective, fr.Configuration())
    return mppi.Planner(configuration, plant)


def make_forecast_ctx(steps: int):
    from assistedmanipulation_tpu.objectives.assisted_manipulation import (
        ForecastContext,
    )

    wrench = jnp.zeros((steps + 1, 6), dtype=jnp.float32).at[:, 0].set(20.0)
    return ForecastContext(
        wrench_horizon=wrench,
        start_time=jnp.asarray(0.0, dtype=jnp.float32),
        time_step=0.01,
        horizon=steps * 0.01,
    )


def main():
    from assistedmanipulation_tpu.cache import enable_compilation_cache

    enable_compilation_cache()
    from assistedmanipulation_tpu.models import frankaridgeback as fr

    rollouts = int(os.environ.get("BENCH_ROLLOUTS", 10_000 - 2))
    steps = int(os.environ.get("BENCH_STEPS", 50))
    iterations = int(os.environ.get("BENCH_ITERS", 30))
    backend = os.environ.get("BENCH_BACKEND", "pallas")

    planner = build_franka_planner(rollouts, steps, backend)
    ctx = make_forecast_ctx(steps)
    state = planner.init(seed=0)
    x0 = jnp.asarray(fr.make_state("huddled"), dtype=jnp.float32)

    # Warm up / compile.
    state, _ = planner.update(state, x0, 0.0, ctx)
    jax.block_until_ready(state.optimal_control)

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    t0 = time.perf_counter()
    t = 0.0
    for _ in range(iterations):
        t += 0.01
        state, _ = planner.update(state, x0, t, ctx)
    jax.block_until_ready(state.optimal_control)
    elapsed = time.perf_counter() - t0

    if profile_dir:
        jax.profiler.stop_trace()

    solves_per_second = iterations / elapsed
    rollouts_per_second = solves_per_second * planner.rollout_count

    print(
        json.dumps(
            {
                "metric": (
                    f"franka_mppi_solves_per_s_{planner.rollout_count}"
                    f"x{steps}steps"
                ),
                "value": round(solves_per_second, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_second / 100.0, 3),
                "rollouts_per_s": round(rollouts_per_second),
            }
        )
    )


if __name__ == "__main__":
    main()
