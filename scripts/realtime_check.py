"""Realtime budget check (VERDICT r1 #10): p99 solve latency < 50 ms.

The reference's host loop runs the simulator at 200 Hz with the controller
updating every 50 ms (base.cpp:150-163 + the 20 Hz controller rate,
base.hpp:150); the implied realtime contract is that one MPPI update fits
inside its 50 ms slot. This script runs the circle scenario closed-loop on
the real TPU at the reference problem size (50+2 rollouts, 30-step horizon,
Kalman wrench forecast) and measures the wall-clock latency of every
controller update — the forecast rollout + planner.update dispatch,
blocked to completion, exactly the work the 50 ms slot must absorb.

The inter-update simulation (10 sim ticks at 200 Hz: human PID wrench,
forecast observations, control interpolation, plant step — sim/episode.py
tick semantics) advances as ONE jitted scan per control period: it is not
part of the latency contract, and running it as a per-op host loop through
a tunneled device link would measure network round-trips, not the solver.

Deadline accounting (VERDICT r3 weak #4): every update over the 50 ms slot
is a DEADLINE MISS — the reference's raisim::TimedLoop would silently drop
the tick (base.cpp:157); we count them instead. Each miss is attributed:
the latency splits into host dispatch time (Python + trace + enqueue) vs
device block time (execution + tunnel round-trip), and Python GC
collections overlapping the update are flagged — so a 100 ms outlier reads
as "tunnel/device stall" (block-dominated, no GC) or "host stall"
(dispatch-dominated or GC-flagged).

Writes realtime.json {p50, p90, p99, max, histogram, deadline_misses,
miss_rate, misses[]} into --out. The gate is NOT just p99: ok requires
p99 < 50 ms AND miss rate <= 1% AND max < 4x budget (a catastrophic-stall
detector that still tolerates the tunneled chip's occasional scheduling
hiccup — a hard-realtime deployment on a local PCIe chip would gate
max < budget outright).

Usage: python scripts/realtime_check.py [--duration 60.0] [--out /tmp/rt]
"""

import argparse
import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET_S = 0.050
MAX_BUDGET_S = 0.200  # catastrophic-stall gate (4x slot)
MISS_RATE_LIMIT = 0.01


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--duration", type=float, default=60.0)
    parser.add_argument("--out", default="/tmp/realtime_check")
    args = parser.parse_args()

    from assistedmanipulation_tpu.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from assistedmanipulation_tpu import mppi
    from assistedmanipulation_tpu.forecast.dynamics_forecast import (
        DynamicsForecast,
        Configuration as DynamicsForecastConfiguration,
    )
    from assistedmanipulation_tpu.forecast import forecast as fc
    from assistedmanipulation_tpu.models import frankaridgeback as fr
    from assistedmanipulation_tpu.models.model_data import frankaridgeback_model
    from assistedmanipulation_tpu.objectives.assisted_manipulation import (
        AssistedManipulation,
    )
    from assistedmanipulation_tpu.sim import pid as pid_module
    from assistedmanipulation_tpu.sim import trajectories
    from assistedmanipulation_tpu.sim.actor import Configuration

    print(f"platform: {jax.default_backend()}", flush=True)

    configuration = Configuration()
    sim_dt = 0.005
    dtype = jnp.float32

    model = frankaridgeback_model()
    robot = configuration.dynamics
    initial, kp_np, kd_np = robot.resolve()
    objective = AssistedManipulation(
        configuration.objective.assisted_manipulation
    )
    plant = fr.make_plant(objective, robot, model)
    planner = mppi.Planner(configuration.mppi, plant)
    fcfg = configuration.forecast.configuration
    strategy = fc.create(configuration.forecast.end_effector_wrench_forecast)
    forecaster = DynamicsForecast(
        DynamicsForecastConfiguration(
            time_step=fcfg.time_step, horizon=fcfg.horizon
        ),
        robot,
        model,
    )
    trajectory = trajectories.CircularTrajectory(
        trajectories.CircularConfiguration()
    )
    pid = pid_module.PID(pid_module.HUMAN_POINT_CONTROL)

    kp = jnp.asarray(kp_np, dtype=dtype)
    kd = jnp.asarray(kd_np, dtype=dtype)
    per_period = int(round(configuration.controller_rate / sim_dt))

    def advance(x, planner_state, strategy_state, pid_state, t0):
        """One control period of 200 Hz simulation (sim/episode.py tick
        semantics, minus the controller update): human PID wrench toward
        the circle reference, forecast observation, interpolated control
        query, plant step with the applied wrench."""

        def tick(carry, k):
            x, strategy_state, pid_state = carry
            t = t0 + k.astype(dtype) * sim_dt
            aux = fr.derive_aux(model, x)
            reference = trajectory.position(t).astype(dtype)
            pid_state = pid.set_reference(pid_state, reference)
            pid_state = pid.update(pid_state, aux.ee_position, t)
            wrench = jnp.concatenate(
                [pid_state.control, jnp.zeros(3, dtype=dtype)]
            )
            strategy_state = strategy.update(strategy_state, wrench, t)
            u = planner._get_impl(planner_state, t)
            x_next, _, _ = fr.integrate_with_wrench_extras(
                model, kp, kd, x, u, aux, wrench, dt=sim_dt
            )
            return (x_next, strategy_state, pid_state), None

        (x, strategy_state, pid_state), _ = jax.lax.scan(
            tick,
            (x, strategy_state, pid_state),
            jnp.arange(per_period, dtype=jnp.int32),
        )
        return x, strategy_state, pid_state

    def controller_update(planner_state, x, strategy_state, t):
        """The measured 50 ms-slot work (actor.cpp:172-192): forecast the
        wrench horizon from the current state, then one MPPI update."""
        _, ctx = forecaster.forecast(
            x, t, lambda tq: strategy.forecast(strategy_state, tq)
        )
        new_state, _ = planner._update_impl(planner_state, x, t, ctx)
        return new_state

    advance_jit = jax.jit(advance)
    update_jit = jax.jit(controller_update)

    x = jnp.asarray(initial, dtype=dtype)
    planner_state = planner.init(seed=0)
    strategy_state = strategy.init(dtype)
    pid_state = pid.init(dtype=dtype)

    updates = int(args.duration / configuration.controller_rate)
    times = [
        jnp.asarray(i * configuration.controller_rate, dtype=dtype)
        for i in range(updates)
    ]
    jax.block_until_ready(times[-1])

    # GC observation: flag updates a collection overlapped (host-stall
    # attribution; gen-2 collections run milliseconds).
    gc_spans = []
    gc_start = [None]

    def gc_callback(phase, info):
        now = time.perf_counter()
        if phase == "start":
            gc_start[0] = now
        elif gc_start[0] is not None:
            gc_spans.append((gc_start[0], now, info.get("generation")))
            gc_start[0] = None

    gc.callbacks.append(gc_callback)

    latencies = []
    dispatch_times = []
    block_times = []
    starts = []
    wall0 = time.perf_counter()
    try:
        for i in range(updates):
            t = times[i]
            start = time.perf_counter()
            planner_state = update_jit(planner_state, x, strategy_state, t)
            dispatched = time.perf_counter()
            jax.block_until_ready(planner_state.optimal_control)
            end = time.perf_counter()
            starts.append(start)
            latencies.append(end - start)
            dispatch_times.append(dispatched - start)
            block_times.append(end - dispatched)
            x, strategy_state, pid_state = advance_jit(
                x, planner_state, strategy_state, pid_state, t
            )
        jax.block_until_ready(x)
    finally:
        gc.callbacks.remove(gc_callback)

    # Skip the first update (compile/cache-load, not the steady state the
    # 20 Hz contract covers).
    steady = np.asarray(latencies[1:])
    edges = [0.0, 0.005, 0.010, 0.020, 0.030, 0.040, 0.050, 0.100, np.inf]
    histogram, _ = np.histogram(steady, bins=edges)

    # Deadline misses with per-miss attribution.
    misses = []
    for i in range(1, updates):
        if latencies[i] < BUDGET_S:
            continue
        s, e = starts[i], starts[i] + latencies[i]
        gc_during = [
            gen for (g0, g1, gen) in gc_spans if g0 < e and g1 > s
        ]
        dispatch_ms = dispatch_times[i] * 1e3
        block_ms = block_times[i] * 1e3
        if gc_during and dispatch_ms > block_ms:
            cause = f"host GC (gen {max(gc_during)}) during dispatch"
        elif dispatch_ms > block_ms:
            cause = "host dispatch stall (Python/trace/enqueue)"
        else:
            cause = "device-side stall (tunnel round-trip or chip contention)"
        misses.append(
            {
                "update": i,
                "wall_offset_s": round(starts[i] - wall0, 2),
                "latency_ms": round(latencies[i] * 1e3, 2),
                "dispatch_ms": round(dispatch_ms, 2),
                "block_ms": round(block_ms, 2),
                "gc_generations_overlapping": gc_during,
                "attribution": cause,
            }
        )

    report = {
        "platform": jax.default_backend(),
        "updates": int(steady.size),
        "duration_s": args.duration,
        "rollouts": planner.rollout_count,
        "steps": planner.steps,
        "controller_period_s": configuration.controller_rate,
        "budget_s": BUDGET_S,
        "p50_ms": round(float(np.percentile(steady, 50)) * 1e3, 3),
        "p90_ms": round(float(np.percentile(steady, 90)) * 1e3, 3),
        "p99_ms": round(float(np.percentile(steady, 99)) * 1e3, 3),
        "max_ms": round(float(steady.max()) * 1e3, 3),
        "first_update_ms": round(latencies[0] * 1e3, 1),
        "histogram_edges_s": edges[:-1] + ["inf"],
        "histogram_counts": histogram.tolist(),
        "deadline_misses": len(misses),
        "miss_rate": round(len(misses) / max(1, steady.size), 5),
        "misses": misses,
        "gc_collections_observed": len(gc_spans),
        "final_state_finite": bool(np.isfinite(np.asarray(x)).all()),
    }
    report["ok"] = (
        report["p99_ms"] < BUDGET_S * 1e3
        and report["miss_rate"] <= MISS_RATE_LIMIT
        and report["max_ms"] < MAX_BUDGET_S * 1e3
        and report["final_state_finite"]
    )

    os.makedirs(args.out, exist_ok=True)
    out = os.path.join(args.out, "realtime.json")
    with open(out, "w") as handle:
        json.dump(report, handle, indent=1)
    print(json.dumps(report, indent=1), flush=True)
    print(f"wrote {out}; ok={report['ok']}", flush=True)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
