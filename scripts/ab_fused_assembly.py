"""A/B sampler variants back-to-back on one chip.

The tunneled chip shows large run-to-run variance (556-1005 solves/s on the
same commit), so configurations are compared back-to-back in ONE process
with interleaved repetitions: A B C A B C ... Each rep times ITERS solves
after a shared warmup. Prints per-rep rates and the median per arm.

Arms (select with AB_ARMS, comma-separated; default two_pass,fused):
- ``two_pass``: host rbg draws + separate lane assembly pass (the shipping
  default, 16 sublanes).
- ``fused``: assembly fused into the rollout kernel (16 sublanes at the
  round-5 40 MB VMEM budget — the serving default; +5%, PERF.md).
- ``inkernel``: fresh noise generated inside the kernel from the TPU
  per-core PRNG via Box-Muller (8 sublanes; removes the rng-bit stream
  and the fresh-noise HBM traffic, adds VPU transcendentals — VERDICT r3
  item 5; TPU-only).
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


def build(fused_assembly: bool, inkernel_rng: bool = False):
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
        inkernel_rng=inkernel_rng,
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

    specs = {
        "two_pass": dict(fused_assembly=False),
        "fused": dict(fused_assembly=True),
        "inkernel": dict(fused_assembly=True, inkernel_rng=True),
    }
    arm_names = os.environ.get("AB_ARMS", "two_pass,fused").split(",")

    arms = {}
    for name in arm_names:
        planner, ctx, x0 = build(**specs[name])
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
        for i in range(iters * reps * len(arms))
    ]
    jax.block_until_ready(times[-1])

    tick = 0
    for rep in range(reps):
        for name in arm_names:
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
