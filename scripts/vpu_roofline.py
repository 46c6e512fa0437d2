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
    """REPS kernel invocations CHAINED INSIDE ONE JIT: the tunnel runtime
    intermittently lets device_get race ahead of separately-dispatched
    pallas executions (reads of unwritten buffers -> all-inf), so the
    repetition must be sequenced on device, one dispatch per timing."""
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

    @jax.jit
    def chained(y):
        for _ in range(REPS):
            y = call(y)
        return y

    return chained


def _sync(y):
    """Read ``y`` back, tolerating the tunnel runtime's read-ahead race.

    On the axon tunnel, ``jax.block_until_ready`` returns before execution
    and even a device_get can intermittently race ahead of a just-queued
    pallas execution, returning an UNWRITTEN (all-inf) buffer. A plain
    retry re-reads the Array's CACHED host copy, so each attempt reads a
    FRESH derived array (``y + 0``) after a backoff. Returns
    (host_array, attempts): ``attempts > 0`` marks a raced first read —
    timing blocks built on it under-measure and must be discarded."""
    for attempt in range(20):
        arr = np.asarray(y + 0)
        if np.isfinite(arr).all():
            return arr, attempt
        time.sleep(0.3)
    raise AssertionError("device read never became finite")


def _time_chained(call, x) -> float:
    """Seconds per kernel launch: ``call`` runs REPS device-sequenced
    kernel invocations in ONE dispatch (build_chain); each block times one
    dispatch ending in a device_get (the only reliable sync on the
    tunnel). The dispatch+transfer overhead is a constant the K-vs-4K
    differencing cancels. Best of BLOCKS (congestion only slows)."""
    y = call(x)
    _sync(y)  # compile + warm
    best = float("inf")
    clean_blocks = 0
    for _ in range(BLOCKS):
        start = time.perf_counter()
        y = call(y)
        _, attempts = _sync(y)
        elapsed = time.perf_counter() - start
        if attempts == 0:  # raced reads under-measure; discard the block
            best = min(best, elapsed / REPS)
            clean_blocks += 1
    if clean_blocks == 0:
        raise RuntimeError("every timing block hit the read-ahead race")
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


# --- XLA-fusion chain microbenchmark (the default peak path) ---------------
#
# The pallas microkernels above are kept (ROOFLINE_PALLAS=1) but the
# tunnel runtime intermittently lets device reads race ahead of
# separately-compiled pallas executions (all-inf read-backs, per-call,
# unpredictable), so the DEFAULT peak measurement uses a plain jitted XLA
# elementwise chain instead: same VPU hardware, the standard dispatch path
# bench.py's (profile-validated) numbers ride, and U-vs-4U differencing to
# cancel dispatch + HBM stream costs. XLA fuses the U-deep chain into one
# loop over N register-resident elements — across-element ILP saturates
# the issue slots regardless of per-element dependence.

N_XLA = int(os.environ.get("ROOFLINE_XLA_N", 1 << 22))


def build_xla_chain(u: int, acc: int, fma: bool):
    """``acc`` INDEPENDENT dependent-chains per element: XLA's fused
    elementwise loop runs one vreg's whole chain back-to-back (measured
    ~0.3 instr/cycle at acc=1 = the ~3-cycle FMA latency), so the ILP
    that reveals the ISSUE rate must live inside the loop body."""

    @jax.jit
    def f(y, c, d):
        accs = [y * (1.0 + 0.001 * i) for i in range(acc)]
        for _ in range(u):
            if fma:
                accs = [a * c + d for a in accs]
            else:
                accs = [a * c for a in accs]
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        return out * (1.0 / acc)

    return f


def _time_xla(call, y, c, d) -> float:
    out = call(y, c, d)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(BLOCKS):
        z = y
        start = time.perf_counter()
        for _ in range(REPS):
            z = call(z, c, d)  # chained: each call consumes the previous
        jax.block_until_ready(z)
        best = min(best, (time.perf_counter() - start) / REPS)
    assert np.isfinite(np.asarray(z)).all()
    return best


def measure_xla_rate(u_lo: int, u_hi: int, acc: int, fma: bool) -> float:
    y = jnp.full((N_XLA,), 1.0, jnp.float32)
    c = jnp.asarray(0.9999999, jnp.float32)
    d = jnp.asarray(1e-7, jnp.float32)
    t_lo = _time_xla(build_xla_chain(u_lo, acc, fma), y, c, d)
    t_hi = _time_xla(build_xla_chain(u_hi, acc, fma), y, c, d)
    if t_hi <= t_lo:
        return float("nan")
    return (u_hi - u_lo) * acc * N_XLA / (t_hi - t_lo)


def main():
    results = {"fma": {}, "mul": {}, "add": {}}
    if os.environ.get("ROOFLINE_PALLAS") == "1":
        x = jnp.full((G, SUB, LANES), 1.0, jnp.float32)
        for fma in (True, False):
            for accumulators in (1, 2, 4, 8, 16):
                rate = measure_rate(accumulators, fma, x)
                results["fma" if fma else "add"][accumulators] = rate
                print(
                    f"pallas {'fma' if fma else 'add'} x{accumulators:2d}: "
                    f"{rate/1e12:.3f} T elem-ops/s",
                    flush=True,
                )
    # Deep chains: the U-delta compute (~0.5-2 ms at peak) must dominate
    # per-call congestion jitter for the differencing to resolve (shallow
    # pairs measured noise); acc sweeps the in-loop ILP until the rate
    # saturates at the issue bound. Measured on v5e: 0.30 T at acc=1 (the
    # ~3-cycle dependent-FMA latency), linear scaling, and a clean plateau
    # at 3.05-3.06 T for acc=16/32/64. A pure-mul control chain is NOT
    # used: XLA algebraically collapses repeated multiplication by the
    # same scalar, so its "rate" measures nothing.
    for acc in (1, 4, 8, 16, 32, 64):
        rate = measure_xla_rate(64, 256, acc, True)
        results["fma"][f"xla_u64_256_acc{acc}"] = rate
        print(f"xla fma acc={acc}: {rate/1e12:.3f} T elem-ops/s", flush=True)
    peak_fma = max(v for v in results["fma"].values() if v == v)
    peak_add = float("nan")

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
