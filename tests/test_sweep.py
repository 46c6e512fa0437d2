"""Parameter sweep harness (harness/sweep.py) — the working version of the
reference's excluded parameter_sweep test."""

import csv
import os

from assistedmanipulation_tpu.harness.sweep import (
    parameter_values,
    pointer_to_patch,
)


def test_pointer_to_patch():
    assert pointer_to_patch("/actor/mppi/cost_scale", 5.0) == {
        "actor": {"mppi": {"cost_scale": 5.0}}
    }
    assert pointer_to_patch("/a~1b/c~0d", 1) == {"a/b": {"c~d": 1}}


def test_parameter_values_range():
    assert parameter_values({"minimum": 1.0, "maximum": 2.0, "step": 0.5}) == [
        1.0,
        1.5,
        2.0,
    ]
    assert parameter_values({"values": [3, 7]}) == [3, 7]


def test_sweep_runs_trajectory_grid(tmp_path):
    """Sweep the headless trajectory test (cheap, no planner jit) over a
    dummy single-parameter grid and check the summary CSV."""
    from assistedmanipulation_tpu.harness.runner import TestSuite

    ok = TestSuite.run(
        "parameter_sweep",
        str(tmp_path),
        patch={
            "test": "trajectory",
            "duration": 0.5,
            "parameters": [{"pointer": "/unused", "values": [0, 1, 2]}],
        },
    )
    assert ok

    runs = [d for d in os.listdir(tmp_path) if d.startswith("parameter_sweep")]
    assert len(runs) == 1
    sweep_csv = os.path.join(tmp_path, runs[0], "sweep.csv")
    with open(sweep_csv) as handle:
        rows = list(csv.DictReader(handle))
    assert len(rows) == 3
    assert all(row["passed"] == "1" for row in rows)
