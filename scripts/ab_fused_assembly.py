"""A/B the fused-assembly kernel vs the two-pass sampler on one chip.

The tunneled chip shows large run-to-run variance (556-1005 solves/s on the
same commit), so configurations are compared back-to-back in ONE process
with interleaved repetitions: A B A B ... Each rep times ITERS solves after
a shared warmup. Prints per-rep rates and the median per arm.
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp


def build(fused_assembly: bool):
    from assistedmanipulation_tpu.kernels.pallas_rollout import (
        make_pallas_planner,
    )
    from assistedmanipulation_tpu.parallel.flagship import (
        default_mppi_configuration,
        synthetic_wrench_horizons,
    )
    from assistedmanipulation_tpu.objectives.assisted_manipulation import (
        ForecastContext,
    )
    from assistedmanipulation_tpu.models import frankaridgeback as fr

    rollouts = int(os.environ.get("BENCH_ROLLOUTS", 10_000 - 2))
    steps = int(os.environ.get("BENCH_STEPS", 50))
    cfg = default_mppi_configuration(rollouts, steps)
    planner = make_pallas_planner(
        cfg,
        fused_sampling=True,
        fused_assembly=fused_assembly,
        sublanes=int(os.environ.get("AB_SUBLANES", "16")),
    )
    ctx = ForecastContext(
        wrench_horizon=synthetic_wrench_horizons(steps, 1),
        start_time=jnp.asarray(0.0, dtype=jnp.float32),
        time_step=0.01,
        horizon=steps * 0.01,
    )
    x0 = jnp.asarray(fr.make_state("huddled"), dtype=jnp.float32)
    return planner, ctx, x0


def main():
    from assistedmanipulation_tpu.cache import enable_compilation_cache

    enable_compilation_cache()
    iters = int(os.environ.get("AB_ITERS", "100"))
    reps = int(os.environ.get("AB_REPS", "4"))

    arms = {}
    for name, fused in (("two_pass", False), ("fused", True)):
        planner, ctx, x0 = build(fused)
        state = planner.init(seed=0)
        # Warm up with a STAGED device scalar: a Python-float time would
        # compile a different jit signature than the timed loop's traced
        # arrays, so rep 0 of each arm would absorb a retrace (ADVICE r3).
        state, _ = planner.update(
            state, x0, jnp.asarray(0.0, dtype=jnp.float32), ctx
        )
        jax.block_until_ready(state.optimal_control)
        arms[name] = dict(planner=planner, ctx=ctx, x0=x0, state=state,
                          rates=[])

    times = [
        jnp.asarray(0.01 * (i + 1), dtype=jnp.float32)
        for i in range(iters * reps * 2)
    ]
    jax.block_until_ready(times[-1])

    tick = 0
    for rep in range(reps):
        for name in ("two_pass", "fused"):
            arm = arms[name]
            state = arm["state"]
            t0 = time.perf_counter()
            for i in range(iters):
                state, _ = arm["planner"].update(
                    state, arm["x0"], times[tick], arm["ctx"]
                )
                tick += 1
            jax.block_until_ready(state.optimal_control)
            arm["state"] = state
            arm["rates"].append(iters / (time.perf_counter() - t0))

    out = {
        name: {
            "rates": [round(r, 1) for r in arm["rates"]],
            "median": round(sorted(arm["rates"])[len(arm["rates"]) // 2], 1),
        }
        for name, arm in arms.items()
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
