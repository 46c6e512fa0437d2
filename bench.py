"""Benchmark: MPPI solves/s, rollouts/s and MFU on the target hardware.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "mfu": ..., ...}

Baseline target (BASELINE.json): >= 10,000 50-step 10-DoF rollouts per solve
at >= 100 Hz solve rate on one TPU v5e chip. vs_baseline = solve rate / 100.

The benchmark composition is parallel/flagship.build_flagship — the SAME
code path the driver's dryrun_multichip shards over a mesh — with the real
plant: full Franka-Ridgeback rigid-body dynamics (batched FK + CRBA mass
matrix + implicit-PD forward dynamics), the 7-term assisted-manipulation
objective and a live forecast context — not a toy point mass.

FLOP accounting (ops/flops.py) counts the arithmetic of the ACTUAL fused
step graph by walking its jaxpr, so the reported MFU is a measured lower
bound, not a guess. The workload is VPU-shaped (elementwise scalar graph on
(sublanes, 128) tiles), so utilization against the VPU elementwise peak
("vpu_util") is the honest speed-of-light figure; "mfu" against the chip's
headline matmul peak is reported because the driver asks for it.

Env overrides: BENCH_ROLLOUTS, BENCH_STEPS, BENCH_ITERS, BENCH_BACKEND
(pallas | lanes | vmap), BENCH_SCENARIOS, BENCH_SAFETY=1,
BENCH_OPTIMAL_ROLLOUT (batch | resimulate), BENCH_PROFILE=<dir> to capture
a jax.profiler trace of the timed iterations (SURVEY §5.1).
"""

import json
import os
import statistics
import time

import jax
import jax.numpy as jnp


def main():
    from assistedmanipulation_tpu.cache import enable_compilation_cache

    enable_compilation_cache()
    from assistedmanipulation_tpu.ops.flops import chip_peaks, solve_flops
    from assistedmanipulation_tpu.parallel.flagship import build_flagship

    rollouts = int(os.environ.get("BENCH_ROLLOUTS", 10_000 - 2))
    steps = int(os.environ.get("BENCH_STEPS", 50))
    # 150 iterations: enough for async dispatch to pipeline past the
    # (tunneled) per-call submit latency — at 30 the queue never fills and
    # the measured rate is ~35% below the device's actual throughput.
    iterations = int(os.environ.get("BENCH_ITERS", 150))
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    scenarios = int(os.environ.get("BENCH_SCENARIOS", 1))
    safety = os.environ.get("BENCH_SAFETY", "0") == "1"

    flagship = build_flagship(
        rollouts=rollouts,
        steps=steps,
        backend=backend,
        scenarios=scenarios,
        safety=safety,
        optimal_rollout_mode=os.environ.get("BENCH_OPTIMAL_ROLLOUT", "batch"),
    )
    planner = flagship.planner
    ctx = flagship.make_ctx()
    state = flagship.init(seed=0)
    x0 = flagship.x0

    # Pre-stage the control-tick times on device: a Python-float ``time``
    # argument would device_put a fresh scalar through the (tunneled) host
    # link every iteration, serializing dispatch — measured at ~1.3 ms/solve
    # of pure host stall at 10k x 50 on v5e. A real servo loop pre-stages
    # its tick times (or runs the whole episode on device, sim/episode.py).
    # Parsed once; reused for the times list and the timing loop below so
    # the two can never drift apart. Odd counts give a true median.
    blocks = int(os.environ.get("BENCH_BLOCKS", 3))
    times = [
        jnp.asarray(0.01 * (i + 1), dtype=jnp.float32)
        for i in range(iterations * blocks)
    ]
    jax.block_until_ready(times[-1])

    # Warm up / compile (staged device time: same jit signature as the
    # timed loop).
    state, _ = flagship.update(
        state, x0, jnp.asarray(0.0, dtype=jnp.float32), ctx
    )
    jax.block_until_ready(state.optimal_control)

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # The tunneled chip shows +-10% rate variance across moments in time
    # (contention on the shared runtime): time BENCH_BLOCKS independent
    # blocks and report the median block's rate rather than one long
    # average, so a transient stall doesn't masquerade as a regression.
    rates = []
    tick = 0
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iterations):
            state, _ = flagship.update(state, x0, times[tick], ctx)
            tick += 1
        jax.block_until_ready(state.optimal_control)
        rates.append(iterations / (time.perf_counter() - t0))

    if profile_dir:
        jax.profiler.stop_trace()

    solves_per_second = statistics.median(rates)
    rollouts_per_second = solves_per_second * planner.rollout_count

    flops = solve_flops(planner.rollout_count, steps) * max(1, scenarios)
    flops_per_second = solves_per_second * flops
    matmul_peak, vpu_peak = chip_peaks()

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
                "flops_per_solve": round(flops),
                "tflops_per_s": round(flops_per_second / 1e12, 3),
                "mfu": round(flops_per_second / matmul_peak, 5),
                "vpu_util": round(flops_per_second / vpu_peak, 4),
                "block_rates": [round(r, 1) for r in rates],
                "device": jax.devices()[0].device_kind,
            }
        )
    )


if __name__ == "__main__":
    main()
