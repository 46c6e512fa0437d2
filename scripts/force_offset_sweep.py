"""Plant-parameter sweep behind the unassisted force-offset analysis.

VERDICT r3 weak #3: the r3 experiment matrix showed a one-directional
~1.25-1.35x mean-force offset on the unassisted cells (circle 33.2 vs ref
24.8 N, rectangle 42.7 vs 34.2, figure-eight 56.4 vs 46.3). This script
commits the evidence grid that localized it:

1. ``friction``: base Coulomb friction scale sweep — rules friction OUT
   (zeroing all of it recovers only ~2.3 N on the circle; the drag load
   rebalances onto the base PD).
2. ``gains``: base/arm differential-gain sweep — quantifies the kd=1000
   base PD as the dominant resistance, but changing it contradicts the
   reference's published gains (raisim_dynamics.hpp:57-76), so it is NOT
   the discrepancy.
3. ``controller``: the actual mechanism — the reference's "unassisted" runs
   keep the MPPI controller RUNNING with no forecast (actor.cpp:166-203
   has no off-switch; assisted_manipulation.cpp:237-240 zeroes only the
   trajectory term), while r3's matrix switched the controller off
   entirely. Controller-on unassisted lands within ~10% of the reference.
4. ``seeds``: the residual is seed variance of a chaotic dragged episode
   (figure-eight unassisted spans 41.5-86.0 N over seeds 0-2).

Writes force_offset_sweep.json at the repo root. Runs on CPU (the jitted
episode engine makes each 15 s cell seconds of wall time).

Usage: [SWEEP_DURATION=15] python scripts/force_offset_sweep.py
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = {"circle": 24.81, "rectangle": 34.17, "figure_eight": 46.32}


def main():
    import jax

    if jax.default_backend() not in ("cpu", "tpu"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from assistedmanipulation_tpu.models import frankaridgeback as fr
    from assistedmanipulation_tpu.models.model_data import frankaridgeback_model
    from assistedmanipulation_tpu.objectives.assisted_manipulation import (
        AssistedManipulation,
    )
    from assistedmanipulation_tpu.sim.episode import (
        Episode,
        EpisodeConfiguration,
        episode_metrics,
    )
    import scripts.experiments as ex

    duration = float(os.environ.get("SWEEP_DURATION", 15.0))
    base_model = frankaridgeback_model()

    def run(traj, seed=0, model=None, robot_cfg=None, controller=False):
        episode = Episode(
            ex.mppi_configuration(),
            AssistedManipulation(),
            ex.make_trajectory(traj),
            EpisodeConfiguration(
                duration=duration,
                time_step=0.005,
                controller_rate=0.05,
                forecast_time_step=0.01,
                forecast_horizon=0.3,
                assisted=False,
                controller_enabled=controller,
            ),
            wrench_strategy=None,
            robot_configuration=robot_cfg,
            model=model,
        )
        outputs = episode.run(seed=seed)
        jnp.asarray(outputs.ee_position).block_until_ready()
        metrics = episode_metrics(outputs)
        return {
            "mean_force": round(metrics["mean_force"], 2),
            "rmse": round(metrics["rmse"], 4),
        }

    report = {"duration": duration, "reference": REFERENCE}

    # 1. Base Coulomb friction scale (controller off to isolate the plant).
    report["friction"] = []
    for scale in (1.0, 0.5, 0.25, 0.0):
        model = dataclasses.replace(
            base_model, friction=base_model.friction * scale
        )
        row = {"friction_scale": scale}
        for traj in ("circle", "rectangle"):
            row[traj] = run(traj, model=model)
        report["friction"].append(row)
        print("friction", row, flush=True)

    # 2. Differential gains (controller off; reference gains are
    # base kd=1000 / arm kd=10, raisim_dynamics.hpp:57-76).
    base_kp = np.array([0.0] * 10 + [100.0, 100.0])
    report["gains"] = []
    for base_kd, arm_kd in ((1000.0, 10.0), (500.0, 10.0), (250.0, 10.0),
                            (1000.0, 5.0)):
        kd = np.array([base_kd] * 3 + [arm_kd] * 7 + [50.0, 50.0])
        cfg = fr.Configuration(
            proportional_gain=base_kp, differential_gain=kd
        )
        row = {"base_kd": base_kd, "arm_kd": arm_kd}
        for traj in ("circle", "rectangle"):
            row[traj] = run(traj, robot_cfg=cfg)
        report["gains"].append(row)
        print("gains", row, flush=True)

    # 3. Controller off vs on (the reference-faithful unassisted mode).
    report["controller"] = []
    for controller in (False, True):
        row = {"controller_enabled": controller}
        for traj in ("circle", "rectangle", "figure_eight"):
            row[traj] = run(traj, controller=controller)
        report["controller"].append(row)
        print("controller", row, flush=True)

    # 4. Seed variance of the controller-on unassisted episodes.
    report["seeds"] = []
    for traj in ("circle", "rectangle", "figure_eight"):
        runs = {
            seed: run(traj, seed=seed, controller=True)
            for seed in (0, 1, 2)
        }
        report["seeds"].append({"trajectory": traj, "runs": runs})
        print("seeds", traj, runs, flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "force_offset_sweep.json")
    with open(out, "w") as handle:
        json.dump(report, handle, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
