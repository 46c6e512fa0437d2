"""Interleaved A/B: elite selection by full lexsort vs counting-threshold.

VERDICT r4 #9: the elite lexsort is ~28 us of the solve (PERF.md
attribution); only the keep_best boundary is semantically observable
(mppi.cpp:219-231), so a two-stage top_k threshold select
(mppi.Configuration.elite_select="threshold") can replace the total
order. The keep sets are bit-identical by construction
(tests/test_mppi.py::test_threshold_elite_select_matches_lexsort); this
script measures whether it is actually faster at the bench shape.

Interleaved same-process blocks (chip congestion swings independent runs
2x); median of AB_BLOCKS blocks per arm.
"""

import dataclasses
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


def build(elite_select: str):
    from assistedmanipulation_tpu.kernels.pallas_rollout import (
        make_pallas_planner,
    )
    from assistedmanipulation_tpu.objectives.assisted_manipulation import (
        ForecastContext,
    )
    from assistedmanipulation_tpu.models import frankaridgeback as fr
    from assistedmanipulation_tpu.parallel.flagship import (
        default_mppi_configuration,
        synthetic_wrench_horizons,
    )

    configuration = dataclasses.replace(
        default_mppi_configuration(ROLLOUTS, STEPS),
        elite_select=elite_select,
    )
    planner = make_pallas_planner(
        configuration, sublanes=16, fused_sampling=True
    )
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
    state, _ = planner.update(state, x0, jnp.asarray(0.0, jnp.float32), ctx)
    jax.block_until_ready(state.optimal_control)
    start = time.perf_counter()
    for k in range(solves):
        state, _ = planner.update(
            state, x0, jnp.asarray(0.01 * (k + 1), jnp.float32), ctx
        )
    jax.block_until_ready(state.optimal_control)
    return solves / (time.perf_counter() - start)


def main():
    arms = {name: build(name) for name in ("lexsort", "threshold")}
    rates = {name: [] for name in arms}
    for block in range(BLOCKS):
        for name, (planner, x0, ctx) in arms.items():
            rate = time_block(planner, x0, ctx, SOLVES)
            rates[name].append(rate)
            print(f"block {block} {name}: {rate:.1f} solves/s", flush=True)
    summary = {
        name: {
            "median": float(np.median(vals)),
            "blocks": [round(v, 1) for v in vals],
        }
        for name, vals in rates.items()
    }
    summary["threshold_vs_lexsort"] = round(
        summary["threshold"]["median"] / summary["lexsort"]["median"], 4
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
