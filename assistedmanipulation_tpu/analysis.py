"""Offline analysis of experiment runs (reference src/analysis.py).

Reads the CSV tree a harness run writes (the reference schema) and produces:

- per-run plots: optimal cost, tank energy, applied force magnitude,
  reference-tracking error, per-term objective costs
  (analysis.py:128-348);
- multi-run comparison tables: mean user force and tracking RMSE per
  (trajectory x forecast) combination (analysis.py:350-504) — the headline
  experiment numbers of the project (analysis.py:439-460).

CLI:
  python -m assistedmanipulation_tpu.analysis single <run_folder>
  python -m assistedmanipulation_tpu.analysis multiple <run_folder>...
"""

from __future__ import annotations

import dataclasses
import os
import sys
from typing import Optional

import numpy as np


def _read_csv(path: str):
    """Minimal CSV reader -> dict of column arrays (no pandas dependency on
    the hot path; pandas is available if plotting is requested)."""
    with open(path) as handle:
        header = handle.readline().strip().split(",")
        rows = [line.strip().split(",") for line in handle if line.strip()]
    if not rows:
        return {name: np.zeros(0) for name in header}
    data = np.asarray(rows, dtype=np.float64)
    return {name: data[:, i] for i, name in enumerate(header)}


@dataclasses.dataclass
class Run:
    """Dataclass mirror of one run's CSV tree (analysis.py:15-126)."""

    folder: str
    joints: Optional[dict] = None
    control: Optional[dict] = None
    ee_position: Optional[dict] = None
    tank_energy: Optional[dict] = None
    optimal_cost: Optional[dict] = None
    update: Optional[dict] = None
    objective: Optional[dict] = None
    pid_control: Optional[dict] = None
    pid_reference: Optional[dict] = None

    @classmethod
    def load(cls, folder: str) -> "Run":
        def maybe(*parts):
            path = os.path.join(folder, *parts)
            return _read_csv(path) if os.path.exists(path) else None

        return cls(
            folder=folder,
            joints=maybe("dynamics", "joints.csv"),
            control=maybe("dynamics", "control.csv"),
            ee_position=maybe("dynamics", "end_effector_position.csv"),
            tank_energy=maybe("dynamics", "tank_energy.csv"),
            optimal_cost=maybe("mppi", "optimal_cost.csv"),
            update=maybe("mppi", "update.csv"),
            objective=maybe("objective", "costs.csv"),
            pid_control=maybe("pid", "force", "control.csv"),
            pid_reference=maybe("pid", "force", "reference.csv"),
        )

    # -- metrics (analysis.py:350-504) ---------------------------------------

    def mean_user_force(self) -> Optional[float]:
        """Mean magnitude of the PID (human) force."""
        if self.pid_control is None:
            return None
        forces = np.stack(
            [self.pid_control[k] for k in ("control0", "control1", "control2")],
            axis=-1,
        )
        return float(np.linalg.norm(forces, axis=-1).mean())

    def tracking_rmse(self) -> Optional[float]:
        """RMSE between the end effector and the PID reference trajectory."""
        if self.pid_reference is None or self.ee_position is None:
            return None
        reference = np.stack(
            [self.pid_reference[k] for k in ("reference0", "reference1", "reference2")],
            axis=-1,
        )
        position = np.stack(
            [self.ee_position[k] for k in ("x", "y", "z")], axis=-1
        )
        n = min(len(reference), len(position))
        error = reference[:n] - position[:n]
        return float(np.sqrt(np.mean(np.sum(error**2, axis=-1))))

    def mean_solve_duration(self) -> Optional[float]:
        if self.update is None or len(self.update["update_duration"]) == 0:
            return None
        return float(self.update["update_duration"].mean())

    def summary(self) -> dict:
        return {
            "folder": self.folder,
            "mean_user_force_N": self.mean_user_force(),
            "tracking_rmse_m": self.tracking_rmse(),
            "mean_solve_duration_s": self.mean_solve_duration(),
            "final_tank_energy": (
                float(self.tank_energy["energy"][-1])
                if self.tank_energy is not None and len(self.tank_energy["energy"])
                else None
            ),
        }


def analyse_single(folder: str, plot: bool = True) -> dict:
    """Per-run summary + plots (analysis.py:128-348)."""
    run = Run.load(folder)
    summary = run.summary()
    for key, value in summary.items():
        print(f"  {key}: {value}")

    if plot:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            figure, axes = plt.subplots(2, 2, figsize=(12, 8))
            if run.optimal_cost is not None:
                axes[0, 0].plot(run.optimal_cost["time"], run.optimal_cost["cost"])
                axes[0, 0].set_title("optimal rollout cost")
                axes[0, 0].set_yscale("symlog")
            if run.tank_energy is not None:
                axes[0, 1].plot(run.tank_energy["time"], run.tank_energy["energy"])
                axes[0, 1].set_title("tank energy")
            if run.pid_control is not None:
                force = np.linalg.norm(
                    np.stack(
                        [run.pid_control[f"control{i}"] for i in range(3)], -1
                    ),
                    axis=-1,
                )
                axes[1, 0].plot(run.pid_control["time"], force)
                axes[1, 0].set_title("user force magnitude [N]")
            if run.objective is not None:
                for name, series in run.objective.items():
                    if name in ("time", "total"):
                        continue
                    axes[1, 1].plot(run.objective["time"], series, label=name)
                axes[1, 1].set_title("objective terms")
                axes[1, 1].set_yscale("symlog")
                axes[1, 1].legend(fontsize=6)
            figure.tight_layout()
            out = os.path.join(folder, "analysis.png")
            figure.savefig(out, dpi=120)
            print(f"  wrote {out}")
        except Exception as error:
            print(f"  plotting skipped: {error}")
    return summary


def analyse_multiple(folders) -> list:
    """Comparison table over runs (analysis.py:350-504)."""
    rows = [Run.load(folder).summary() for folder in folders]
    width = max(len(os.path.basename(r["folder"])) for r in rows)
    print(
        f"{'run':<{width}}  {'force[N]':>10}  {'rmse[m]':>10}  {'solve[ms]':>10}"
    )
    for row in rows:
        force = row["mean_user_force_N"]
        rmse = row["tracking_rmse_m"]
        solve = row["mean_solve_duration_s"]
        print(
            f"{os.path.basename(row['folder']):<{width}}  "
            f"{force if force is None else f'{force:10.2f}'}  "
            f"{rmse if rmse is None else f'{rmse:10.4f}'}  "
            f"{solve if solve is None else f'{solve * 1e3:10.2f}'}"
        )
    return rows


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2 or argv[0] not in ("single", "multiple"):
        print(__doc__)
        return 1
    if argv[0] == "single":
        analyse_single(argv[1])
    else:
        analyse_multiple(argv[1:])
    return 0


if __name__ == "__main__":
    sys.exit(main())
