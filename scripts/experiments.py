"""Run the reference's headline experiment matrix on TPU.

Reproduces the experiment grid hard-coded in the reference analysis script
(src/analysis.py:439-460): trajectory {pose, circle, figure_eight,
rectangle} x strategy {unassisted, average, locf, kalman_1, kalman_2},
reporting mean user force (N) and reference-tracking RMSE (m) per cell.
Each cell is one fully-jitted Episode (sim/episode.py) — the whole 15 s
experiment compiles to a single lax.scan device program, so a cell is one
dispatch instead of the reference's 3000-tick host loop.

Usage:
    python scripts/experiments.py            # full matrix, 15 s episodes
    EXP_DURATION=2 python scripts/experiments.py   # quick pass

Outputs: EXPERIMENTS.md (summary tables vs the reference numbers) and
experiments.json at the repo root.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from assistedmanipulation_tpu import mppi
from assistedmanipulation_tpu.forecast import forecast as fc
from assistedmanipulation_tpu.models import frankaridgeback as fr
from assistedmanipulation_tpu.objectives.assisted_manipulation import (
    AssistedManipulation,
)
from assistedmanipulation_tpu.sim import trajectories
from assistedmanipulation_tpu.sim.episode import (
    Episode,
    EpisodeConfiguration,
    episode_metrics,
)

# Reference experiment results (src/analysis.py:439-460) for side-by-side
# comparison: {trajectory: {strategy: (mean_force_N, rmse_m)}}.
REFERENCE = {
    "pose": {
        "unassisted": (0.00, 0.00109),
        "average": (0.22, 0.00091),
        "locf": (0.09, 0.00071),
        "kalman_1": (0.04, 0.00067),
        "kalman_2": (0.07, 0.00069),
    },
    "circle": {
        "unassisted": (24.81, 0.0906),
        "average": (11.94, 0.0452),
        "locf": (12.29, 0.0437),
        "kalman_1": (12.59, 0.0431),
        "kalman_2": (12.73, 0.0441),
    },
    "figure_eight": {
        "unassisted": (46.32, 0.2072),
        "average": (21.94, 0.0797),
        "locf": (19.18, 0.0702),
        "kalman_1": (16.52, 0.0604),
        "kalman_2": (17.90, 0.0653),
    },
    "rectangle": {
        "unassisted": (34.17, 0.1348),
        "average": (15.50, 0.0574),
        "locf": (15.90, 0.0540),
        "kalman_1": (15.75, 0.0552),
        "kalman_2": (16.70, 0.0569),
    },
}

FORECAST_DT = 0.01
FORECAST_HORIZON = 0.3


def make_trajectory(name: str):
    if name == "pose":
        return trajectories.PointTrajectory(
            trajectories.PointConfiguration(point=(1.0, 1.0, 1.0))
        )
    if name == "circle":
        return trajectories.CircularTrajectory(trajectories.CircularConfiguration())
    if name == "figure_eight":
        return trajectories.FigureEightTrajectory(
            trajectories.FigureEightConfiguration()
        )
    if name == "rectangle":
        return trajectories.RectangularTrajectory(
            trajectories.RectangularConfiguration()
        )
    if name == "lissajous":
        return trajectories.LissajousTrajectory(
            trajectories.LissajousConfiguration()
        )
    raise ValueError(name)


def make_strategy(name: str):
    """Wrench forecast strategy per experiment column; None = unassisted."""
    if name == "unassisted":
        return None
    if name == "average":
        return fc.AverageForecast(fc.AverageConfiguration(window=FORECAST_HORIZON))
    if name == "locf":
        return fc.LOCFForecast(fc.LOCFConfiguration(horizon=FORECAST_HORIZON))
    if name.startswith("kalman_"):
        order = int(name.split("_")[1])
        return fc.KalmanForecast(
            fc.KalmanForecastConfiguration(
                observed_states=6,
                order=order,
                time_step=FORECAST_DT,
                horizon=FORECAST_HORIZON,
            )
        )
    raise ValueError(name)


def mppi_configuration() -> mppi.Configuration:
    """The master defaults (base.hpp:61-196, mirrored in sim/actor.py)."""
    return mppi.Configuration(
        rollouts=50,
        keep_best_rollouts=20,
        time_step=0.01,
        horizon=0.3,
        gradient_step=2.0,
        cost_scale=10.0,
        cost_discount_factor=1.0,
        covariance=fr.DEFAULT_COVARIANCE,
        control_bound=True,
        control_min=fr.DEFAULT_CONTROL_MIN,
        control_max=fr.DEFAULT_CONTROL_MAX,
        control_default=np.zeros(12),
        smoothing=mppi.Smoothing(window=10, order=1),
    )


def run_cell(trajectory_name: str, strategy_name: str, duration: float, seed: int):
    strategy = make_strategy(strategy_name)
    episode = Episode(
        mppi_configuration(),
        AssistedManipulation(),
        make_trajectory(trajectory_name),
        EpisodeConfiguration(
            duration=duration,
            time_step=0.005,
            controller_rate=0.05,
            forecast_time_step=FORECAST_DT,
            forecast_horizon=FORECAST_HORIZON,
            assisted=strategy is not None,
        ),
        wrench_strategy=strategy,
    )
    start = time.perf_counter()
    outputs = episode.run(seed=seed)
    jnp.asarray(outputs.ee_position).block_until_ready()
    elapsed = time.perf_counter() - start
    metrics = episode_metrics(outputs)
    metrics["wall_s"] = round(elapsed, 2)
    return metrics


def main():
    from assistedmanipulation_tpu.cache import enable_compilation_cache

    enable_compilation_cache()
    duration = float(os.environ.get("EXP_DURATION", 15.0))
    seed = int(os.environ.get("EXP_SEED", 0))
    trajectory_names = os.environ.get(
        "EXP_TRAJECTORIES", "pose,circle,figure_eight,rectangle"
    ).split(",")
    strategy_names = os.environ.get(
        "EXP_STRATEGIES", "unassisted,average,locf,kalman_1,kalman_2"
    ).split(",")

    results = {}
    for trajectory_name in trajectory_names:
        results[trajectory_name] = {}
        for strategy_name in strategy_names:
            metrics = run_cell(trajectory_name, strategy_name, duration, seed)
            results[trajectory_name][strategy_name] = metrics
            print(
                f"{trajectory_name:13s} {strategy_name:10s} "
                f"force {metrics['mean_force']:7.2f} N  "
                f"rmse {metrics['rmse']:7.4f} m  "
                f"({metrics['wall_s']}s wall)",
                flush=True,
            )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    payload = {"duration": duration, "seed": seed, "results": results}
    with open(os.path.join(root, "experiments.json"), "w") as handle:
        json.dump(payload, handle, indent=2)

    lines = [
        "# EXPERIMENTS — assisted-manipulation matrix on TPU",
        "",
        f"Episode duration {duration} s, seed {seed}, sim dt 0.005 s, MPPI "
        "50+2 rollouts / 0.3 s horizon / 20 Hz (the reference defaults). "
        "Each cell is one jitted episode (sim/episode.py). Reference numbers "
        "from src/analysis.py:439-460.",
        "",
        "## Mean user force (N) — lower = more assistance",
        "",
        "| Trajectory | " + " | ".join(strategy_names) + " |",
        "|---|" + "---|" * len(strategy_names),
    ]
    for trajectory_name in trajectory_names:
        row = [trajectory_name]
        for strategy_name in strategy_names:
            ours = results[trajectory_name][strategy_name]["mean_force"]
            ref = REFERENCE.get(trajectory_name, {}).get(strategy_name)
            cell = f"{ours:.2f}" + (f" (ref {ref[0]:.2f})" if ref else "")
            row.append(cell)
        lines.append("| " + " | ".join(row) + " |")
    lines += [
        "",
        "## Tracking RMSE (m) — human-intended trajectory error",
        "",
        "| Trajectory | " + " | ".join(strategy_names) + " |",
        "|---|" + "---|" * len(strategy_names),
    ]
    for trajectory_name in trajectory_names:
        row = [trajectory_name]
        for strategy_name in strategy_names:
            ours = results[trajectory_name][strategy_name]["rmse"]
            ref = REFERENCE.get(trajectory_name, {}).get(strategy_name)
            cell = f"{ours:.4f}" + (f" (ref {ref[1]:.4f})" if ref else "")
            row.append(cell)
        lines.append("| " + " | ".join(row) + " |")
    if "unassisted" in strategy_names:
        assisted_names = [s for s in strategy_names if s != "unassisted"]
        lines += [
            "",
            "## Assistance ratio — assisted / unassisted mean force "
            "(reference ≈ 0.5, analysis.py:451-458)",
            "",
            "| Trajectory | " + " | ".join(assisted_names) + " |",
            "|---|" + "---|" * len(assisted_names),
        ]
        for trajectory_name in trajectory_names:
            base = results[trajectory_name]["unassisted"]["mean_force"]
            ref_base = REFERENCE.get(trajectory_name, {}).get("unassisted")
            row = [trajectory_name]
            for strategy_name in assisted_names:
                ours = results[trajectory_name][strategy_name]["mean_force"]
                ratio = ours / base if base > 1e-9 else float("nan")
                ref = REFERENCE.get(trajectory_name, {}).get(strategy_name)
                cell = f"{ratio:.2f}"
                if ref and ref_base and ref_base[0] > 1e-9:
                    cell += f" (ref {ref[0] / ref_base[0]:.2f})"
                row.append(cell)
            lines.append("| " + " | ".join(row) + " |")
    lines += _artifact_sections(root)
    lines.append("")
    with open(os.path.join(root, "EXPERIMENTS.md"), "w") as handle:
        handle.write("\n".join(lines))
    print("wrote EXPERIMENTS.md, experiments.json")


def _artifact_sections(root):
    """Render committed measurement artifacts (scaling, realtime, TPU
    cross-check) into EXPERIMENTS.md so one regeneration carries every
    recorded number (VERDICT r1 #4, #9, #10)."""
    lines = []

    path = os.path.join(root, "scaling_cpu.json")
    if os.path.exists(path):
        with open(path) as handle:
            scaling = json.load(handle)
        lines += [
            "",
            "## Scaling (8 virtual CPU devices — ICI-free upper bound on "
            "sharding overhead; see scaling_cpu.json)",
            "",
            f"Backend: {scaling.get('backend')}. "
            f"Caveat: {scaling.get('weak_caveat', '')}",
            "",
            "| devices | rollouts | solves/s | rollouts/s | weak-scaling eff |",
            "|---|---|---|---|---|",
        ]
        for row in scaling.get("weak", []):
            lines.append(
                f"| {row['devices']} | {row['rollouts']} | "
                f"{row['solves_per_s']} | {row['rollouts_per_s']} | "
                f"{row['weak_scaling_efficiency']:.3f} |"
            )
        overhead = scaling.get("overhead", [])
        if overhead:
            total = overhead[0].get("rollouts", "?")
            lines += [
                "",
                f"Fixed-work sharding overhead (same {total} rollouts, "
                "split across devices; median of repeated runs — single-"
                "machine virtual devices contend for cores, so wall-clock "
                "here bounds scheduler noise, not ICI):",
                "",
                "| devices | solves/s (runs) | efficiency vs 1 device | "
                "collectives per solve |",
                "|---|---|---|---|",
            ]
            for row in overhead:
                cc = row.get("collectives")
                if cc:
                    ops = ", ".join(
                        f"{k} x{v}" for k, v in sorted(cc["ops"].items())
                    )
                    cc_text = f"{ops} ({cc['payload_bytes']} B)"
                else:
                    cc_text = "—"
                runs = row.get("solves_per_s_runs", [row["solves_per_s"]])
                lines.append(
                    f"| {row['devices']} | {row['solves_per_s']} "
                    f"{runs} | "
                    f"{row['sharding_efficiency_same_work']:.3f} | "
                    f"{cc_text} |"
                )
            lines += [
                "",
                "The compile-level collective footprint is the quantity the "
                ">=80% multi-chip target depends on: the payload that must "
                "cross ICI per solve is constant and tiny against the "
                "per-device rollout compute (the rollout batch itself is "
                "embarrassingly parallel; only the weighting reductions "
                "cross devices).",
            ]

    path = os.path.join(root, "TPU_CROSSCHECK.json")
    if os.path.exists(path):
        with open(path) as handle:
            cc = json.load(handle)
        lines += [
            "",
            "## Production Pallas kernel numeric cross-check (real TPU; "
            "TPU_CROSSCHECK.json)",
            "",
            "```json",
            json.dumps(cc, indent=1),
            "```",
        ]

    path = os.path.join(root, "realtime.json")
    if os.path.exists(path):
        with open(path) as handle:
            rt = json.load(handle)
        lines += [
            "",
            "## Realtime budget (real TPU, 20 Hz control loop, 50 ms slot; "
            "realtime.json)",
            "",
            f"p50 {rt.get('p50_ms')} ms · p90 {rt.get('p90_ms')} ms · "
            f"p99 {rt.get('p99_ms')} ms · max {rt.get('max_ms')} ms over "
            f"{rt.get('updates')} updates "
            f"({'PASS' if rt.get('ok') else 'FAIL'} vs 50 ms budget).",
        ]

    return lines


if __name__ == "__main__":
    main()
