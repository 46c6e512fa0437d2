"""Measure the v5e VPU issue peak and pin the rollout kernel's roofline.

VERDICT r4 weak #6: the round-4 roofline bracketed the kernel at "56-112%
of the issue bound" because both the denominator (VPU issue peak) and the
FMA fraction were estimates. This script measures both:

1. **Issue-peak microkernels** — Pallas kernels of KNOWN vector-op count:
   a fused-multiply-add chain (``acc = acc * c + d``) and a pure-add chain
   (``acc = acc + c``) over (8, 128) f32 tiles, at 1-16 INDEPENDENT
   accumulators per program (the dependent-chain latency amortizes across
   accumulators; the saturating rate is the true per-core issue rate).
   Measurement discipline, learned the hard way on the tunneled chip:
   - launches CHAIN (each consumes the previous output) — independent
     same-input launches do not serialize under the tunnel and
     block_until_ready on the last one measures nothing;
   - the rate comes from the DIFFERENCE between two loop lengths
     (K and 4K), cancelling launch/dispatch overhead exactly.
2. **Kernel instruction count** — the fused rollout step's jaxpr walked
   for its arithmetic-primitive histogram and its statically fusable
   multiply-add pairs (ops/flops.count_jaxpr_ops / count_fma_pairs): each
   pair issues as ONE VPU instruction, so
   instructions/step = arith_ops - fma_pairs (pessimistic: the compiler
   can only fuse MORE, making true utilization higher).
3. **Utilization** — the rollout kernel's measured instruction rate
   (10,240 x 50 steps / its profiled time) against the measured peak.

Prints one JSON line; writes VPU_ROOFLINE.json at the repo root. Run on
the real chip. Peaks are the MAX over blocks (a peak is a max; congestion
only ever slows runs down).
"""

import functools
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUB, LANES = 8, 128
G = int(os.environ.get("ROOFLINE_GRID", 16))
K_BASE = int(os.environ.get("ROOFLINE_ITERS", 2048))
BLOCKS = int(os.environ.get("ROOFLINE_BLOCKS", 5))
REPS = int(os.environ.get("ROOFLINE_REPS", 30))  # chained launches


UNROLL = int(os.environ.get("ROOFLINE_UNROLL", 16))


def _chain_kernel(x_ref, out_ref, acc_ref, *, iterations, accumulators, fma):
    # All operands derive from the input block (runtime values — nothing
    # the compiler can fold). c ~ 1 - 1e-7 keeps the chain numerically
    # parked near 1.0 across arbitrarily many chained launches.
    #
    # Loop state lives in a VMEM scratch ref, NOT fori_loop carries:
    # tuple-of-vector carries miscompile on this Mosaic toolchain (observed
    # all-inf outputs at >= 2 carried vectors; the rollout kernels avoid
    # carries for the same reason — pallas_rollout.py "replicated splats"
    # note). Each outer iteration loads each accumulator once, runs UNROLL
    # dependent steps on SSA locals, stores once — the ld/st amortizes to
    # 1/UNROLL per measured op.
    base = x_ref[...]
    c = base * np.float32(0.9999999)
    d = base * np.float32(1e-7)
    for i in range(accumulators):
        acc_ref[i] = base + np.float32(0.001) * np.float32(i)

    def body(_, token):
        for i in range(accumulators):
            acc = acc_ref[i]
            for _ in range(UNROLL):
                acc = acc * c + d if fma else acc + d
            acc_ref[i] = acc
        return token

    jax.lax.fori_loop(0, iterations, body, 0)
    total = acc_ref[0]
    for i in range(1, accumulators):
        total = total + acc_ref[i]
    # Renormalize toward ~1.0 so chained launches stay finite.
    out_ref[...] = total * np.float32(1.0 / accumulators)


def build_chain(iterations: int, accumulators: int, fma: bool):
    kernel = functools.partial(
        _chain_kernel,
        iterations=iterations,
        accumulators=accumulators,
        fma=fma,
    )
    call = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((None, SUB, LANES), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, SUB, LANES), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, SUB, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((max(accumulators, 1), SUB, LANES), jnp.float32)
        ],
    )
    return jax.jit(call)


def _sync(y):
    """Force execution of everything ``y`` depends on and wait for it.

    On the tunneled axon backend, ``jax.block_until_ready`` returns before
    the device has actually executed (measured: 30 chained ~130 us kernels
    "complete" in 0.5 ms) — only a device-to-host transfer (device_get,
    the path bench.py's numbers rest on) truly synchronizes. The transfer
    is a constant cost the K-vs-4K differencing cancels."""
    arr = np.asarray(y)
    if not np.isfinite(arr).all():
        print("warning: non-finite sync read (tunnel glitch?); retrying",
              flush=True)
        arr = np.asarray(y)
        assert np.isfinite(arr).all()
    return arr


def _time_chained(call, x) -> float:
    """Seconds per launch, launches chained output->input (one continuous
    chain — the values are parked at ~1.0 so it never diverges); best of
    BLOCKS segments. Every launch syncs via device_get: rapidly QUEUED
    chained pallas launches intermittently corrupt on the tunnel runtime
    (non-finite read-backs, reproducible only in tight loops), and the
    per-launch transfer is a constant the K-vs-4K differencing cancels."""
    y = call(x)
    _sync(y)  # compile + warm
    best = float("inf")
    for _ in range(BLOCKS):
        start = time.perf_counter()
        for _ in range(REPS):
            y = call(y)
            _sync(y)
        best = min(best, (time.perf_counter() - start) / REPS)
    return best


def measure_rate(accumulators: int, fma: bool, x) -> float:
    """Vector-instruction issue rate (in element-ops/s): the K vs 4K time
    difference divided by the extra work."""
    t1 = _time_chained(build_chain(K_BASE, accumulators, fma), x)
    t4 = _time_chained(build_chain(4 * K_BASE, accumulators, fma), x)
    extra_instr = G * 3 * K_BASE * accumulators * UNROLL  # vector instrs
    if t4 <= t1:
        return float("nan")
    return extra_instr * SUB * LANES / (t4 - t1)


def main():
    x = jnp.full((G, SUB, LANES), 1.0, jnp.float32)
    results = {"fma": {}, "add": {}}
    for fma in (True, False):
        for accumulators in (1, 2, 4, 8, 16):
            rate = measure_rate(accumulators, fma, x)
            results["fma" if fma else "add"][accumulators] = rate
            print(
                f"{'fma' if fma else 'add'} x{accumulators:2d}: "
                f"{rate/1e12:.3f} T elem-ops/s "
                f"({rate/(SUB*LANES)/1e9:.2f} G vinstr/s)",
                flush=True,
            )
    peak_fma = max(results["fma"].values())
    peak_add = max(results["add"].values())

    from assistedmanipulation_tpu.ops import flops

    jaxpr = flops.rollout_step_jaxpr()
    ops = flops.count_jaxpr_ops(jaxpr)
    arith = {k: v for k, v in ops.items() if k in flops._ELEMENTWISE}
    total_arith = sum(arith.values())
    fma_pairs = flops.count_fma_pairs(jaxpr)
    instr_per_step = total_arith - fma_pairs

    kernel_us = float(os.environ.get("ROOFLINE_KERNEL_US", 582.0))
    padded_rollouts = 10_240
    steps = 50
    # Kernel vector-instruction rate: per (16,128) tile the kernel issues
    # instr_per_step instructions covering 2048 rollouts... normalized to
    # element-ops: instructions * elements-per-rollout-step.
    elem_ops = padded_rollouts * steps * instr_per_step
    instr_rate = elem_ops / (kernel_us * 1e-6)
    utilization = instr_rate / peak_fma

    result = {
        "metric": "vpu_roofline",
        "peak_fma_elemops_per_s": peak_fma,
        "peak_add_elemops_per_s": peak_add,
        "peak_fma_flops_per_s": 2 * peak_fma,
        "microkernel_rates_elemops": {
            kind: {str(a): rate for a, rate in table.items()}
            for kind, table in results.items()
        },
        "step_arith_ops": total_arith,
        "step_fma_pairs": fma_pairs,
        "step_instructions": instr_per_step,
        "kernel_us_per_solve": kernel_us,
        "kernel_instr_elemops_per_s": instr_rate,
        "vpu_issue_utilization": utilization,
    }
    print(json.dumps(result))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "VPU_ROOFLINE.json"), "w") as handle:
        json.dump(result, handle, indent=1)


if __name__ == "__main__":
    main()
