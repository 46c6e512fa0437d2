"""Map the pose-hold exploration dither to its knobs.

VERDICT r4 weak #2 / next #7: the pose row's absolute force is
qualitatively off (unassisted 7.80 N vs ref 0.00, assisted 1.4-2.5 N vs
0.04-0.22) and the round-4 diagnosis — MPPI exploration dither at hold,
with the inert-controller control at 4e-5 N proving the plant holds —
stopped at the mechanism. This sweep maps dither amplitude -> force over
the knobs that set the exploration magnitude, one at a time from the
reference defaults (base.hpp:69-101):

- covariance scale x{1, 0.5, 0.25, 0.1, 0.05} (the sampling noise itself),
- gradient_step {2, 1, 0.5, 0.25} (how much of the weighted noise is
  applied),
- SG window {5, 10, 15, 20} (how much of it smoothing removes),
- keep_best {10, 20, 35, 50} (elite reuse concentration).

Cell protocol matches the experiment matrix (scripts/experiments.py): the
pose episode holds the INITIAL huddled EE pose, kalman order-1 assisted,
15 s, median of seeds 0-2. Per cell: whole-episode mean human force (the
matrix metric), tail (t > 7.5 s) mean force, and tail EE dither RMS about
its own mean. Writes POSE_DITHER.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def run_cell(overrides: dict, duration: float, seed: int):
    import dataclasses

    from assistedmanipulation_tpu.models import dynamics as dyn

    # Stiction-hypothesis arm: shrink the Coulomb regularization toward
    # true stiction (creep velocity ~ eps * F / (f - F), dynamics.py:183).
    # Each Episode jits per-instance, so the module global binds at trace
    # time; restore after the run.
    eps_default = dyn.FRICTION_EPS
    if "friction_eps" in overrides:
        dyn.FRICTION_EPS = overrides["friction_eps"]

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

    covariance_scale = overrides.get("covariance_scale", 1.0)
    smoothing_window = overrides.get("smoothing_window", 10)
    configuration = mppi.Configuration(
        rollouts=50,
        keep_best_rollouts=overrides.get("keep_best", 20),
        time_step=0.01,
        horizon=0.3,
        gradient_step=overrides.get("gradient_step", 2.0),
        cost_scale=10.0,
        cost_discount_factor=1.0,
        covariance=np.asarray(fr.DEFAULT_COVARIANCE) * covariance_scale,
        control_bound=True,
        control_min=fr.DEFAULT_CONTROL_MIN,
        control_max=fr.DEFAULT_CONTROL_MAX,
        control_default=np.zeros(12),
        smoothing=mppi.Smoothing(window=smoothing_window, order=1),
    )

    # Initial huddled EE pose (the matrix's pose protocol).
    from assistedmanipulation_tpu.models.model_data import frankaridgeback_model

    model = frankaridgeback_model()
    x0 = jnp.asarray(fr.make_state("huddled"))
    point = tuple(
        float(v) for v in np.asarray(fr.derive_aux(model, x0).ee_position)
    )

    strategy = fc.KalmanForecast(
        fc.KalmanForecastConfiguration(
            observed_states=6, order=1, time_step=0.01, horizon=0.3
        )
    )
    episode = Episode(
        configuration,
        AssistedManipulation(),
        trajectories.PointTrajectory(
            trajectories.PointConfiguration(point=point)
        ),
        EpisodeConfiguration(
            duration=duration,
            time_step=0.005,
            controller_rate=0.05,
            forecast_time_step=0.01,
            forecast_horizon=0.3,
            assisted=True,
            controller_enabled=True,
        ),
        wrench_strategy=strategy,
    )
    try:
        outputs = episode.run(seed=seed)
        jnp.asarray(outputs.ee_position).block_until_ready()
    finally:
        dyn.FRICTION_EPS = eps_default

    metrics = episode_metrics(outputs)
    force = np.linalg.norm(
        np.asarray(outputs.wrench[:, :3], np.float64), axis=-1
    )
    ee = np.asarray(outputs.ee_position, np.float64)
    tail = slice(len(force) // 2, None)
    ee_tail = ee[tail]
    dither_rms = float(
        np.sqrt(np.mean(np.sum((ee_tail - ee_tail.mean(axis=0)) ** 2, -1)))
    )
    return {
        "mean_force": metrics["mean_force"],
        "tail_mean_force": float(force[tail].mean()),
        "tail_dither_rms_m": dither_rms,
    }


def run_config(overrides: dict, duration: float, seeds):
    cells = [run_cell(overrides, duration, seed) for seed in seeds]
    forces = sorted(c["mean_force"] for c in cells)
    tails = sorted(c["tail_mean_force"] for c in cells)
    dithers = sorted(c["tail_dither_rms_m"] for c in cells)
    mid = len(cells) // 2
    return {
        **overrides,
        "mean_force": round(forces[mid], 3),
        "force_range": [round(forces[0], 3), round(forces[-1], 3)],
        "tail_mean_force": round(tails[mid], 3),
        "tail_dither_rms_m": round(dithers[mid], 5),
    }


def main():
    duration = float(os.environ.get("POSE_DURATION", 15.0))
    seeds = [int(s) for s in os.environ.get("POSE_SEEDS", "0,1,2").split(",")]

    which = os.environ.get("POSE_SWEEP", "knobs")
    sweeps = []
    if which in ("knobs", "all"):
        sweeps += [("default", {})]
        for scale in (0.5, 0.25, 0.1, 0.05):
            sweeps.append((f"cov_x{scale}", {"covariance_scale": scale}))
        for step in (1.0, 0.5, 0.25):
            sweeps.append((f"grad_{step}", {"gradient_step": step}))
        for window in (5, 15, 20):
            sweeps.append((f"sg_{window}", {"smoothing_window": window}))
        for keep in (10, 35, 50):
            sweeps.append((f"keep_{keep}", {"keep_best": keep}))
    if which in ("eps", "all"):
        # Stiction hypothesis (EXPERIMENTS.md pose note): RaiSim's LCP
        # friction has true static stiction; this plant's regularized
        # Coulomb creeps at ~eps*F/(f-F) under the controller's dither,
        # continuously engaging the kp=300 human PID. If the hypothesis
        # holds, shrinking eps (more stiction-like) should collapse the
        # pose force toward the reference's ~0 N.
        for eps in (1e-3, 1e-4, 1e-5):
            sweeps.append((f"eps_{eps:g}", {"friction_eps": eps}))

    rows = []
    for name, overrides in sweeps:
        start = time.perf_counter()
        row = run_config(overrides, duration, seeds)
        row["name"] = name
        row["wall_s"] = round(time.perf_counter() - start, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    result = {
        "metric": (
            "pose_stiction_eps_sweep" if which == "eps"
            else "pose_dither_knob_map"
        ),
        "duration": duration,
        "seeds": seeds,
        "protocol": "pose holds the initial huddled EE pose; kalman_1 "
        "assisted; median of seeds; tail = second half of the episode",
        "reference_pose_assisted_range": [0.04, 0.22],
        "engine_pose_assisted_baseline": "1.4-2.5 N (EXPERIMENTS.md)",
        "rows": rows,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_name = "POSE_STICTION.json" if which == "eps" else "POSE_DITHER.json"
    with open(os.path.join(root, out_name), "w") as handle:
        json.dump(result, handle, indent=1)
    print(f"wrote {out_name}")


if __name__ == "__main__":
    main()
