"""Harness checkpoint/resume (SURVEY §5.4, VERDICT r4 weak #7 / next #8):
kill a host-engine run mid-episode, resume from checkpoint.npz, and the
finished CSV tree must BYTE-match an uninterrupted run — the planner's
threefry key, elite noise, SG history, forecast filter state and the PID
states all live in the snapshot, so the continuation is deterministic.

Only mppi/update.csv (host-measured wall-clock durations) is excluded
from the comparison.
"""

import json
import os

import numpy as np

from assistedmanipulation_tpu import config as cfg
from assistedmanipulation_tpu.harness import cases
from assistedmanipulation_tpu.harness.runner import TestSuite


def _patch():
    return {
        "duration": 0.3,
        "engine": "host",
        "actor": {
            "mppi": {"rollouts": 8, "keep_best_rollouts": 3, "horizon": 0.1},
            "controller_rate": 0.05,
        },
    }


def _csv_tree(folder):
    out = {}
    for dirpath, _, files in os.walk(folder):
        for name in files:
            if not name.endswith(".csv"):
                continue
            path = os.path.join(dirpath, name)
            rel = os.path.relpath(path, folder)
            if rel == os.path.join("mppi", "update.csv"):
                continue  # host wall-clock durations differ by run
            with open(path, "rb") as handle:
                out[rel] = handle.read()
    return out


def test_resume_continues_bit_exactly(tmp_path):
    patch = _patch()

    # Reference: one uninterrupted run.
    full = tmp_path / "full"
    os.makedirs(full)
    reference = cases.CircleTest(str(full), patch=patch)
    for _ in range(60):
        reference.step()
    reference.flush_loggers()
    reference.close()

    # Interrupted: 30 ticks, checkpoint, then 5 more ticks of progress that
    # the "crash" loses (flushed to disk so truncation is actually tested).
    run = tmp_path / "run"
    os.makedirs(run)
    interrupted = cases.CircleTest(str(run), patch=patch)
    with open(os.path.join(run, "configuration.json"), "w") as handle:
        json.dump(cfg.to_json(interrupted.configuration), handle, indent=2)
    for _ in range(30):
        interrupted.step()
    interrupted.write_checkpoint(30)
    for _ in range(5):
        interrupted.step()
    interrupted.flush_loggers()
    # Simulated kill: no close(); buffers beyond the flush are lost, rows
    # beyond the checkpoint are on disk and must be truncated by resume.
    assert os.path.exists(os.path.join(run, "checkpoint.npz"))

    ok = TestSuite.resume(str(run))
    assert ok

    got = _csv_tree(str(run))
    expected = _csv_tree(str(full))
    assert sorted(got) == sorted(expected)
    for rel in sorted(expected):
        assert got[rel] == expected[rel], f"{rel} differs after resume"


def test_resume_requires_checkpoint(tmp_path):
    assert TestSuite.resume(str(tmp_path)) is False


def test_checkpoint_interval_writes_snapshots(tmp_path):
    """checkpoint_interval > 0 snapshots during run() itself."""
    patch = _patch()
    patch["duration"] = 0.12
    patch["checkpoint_interval"] = 0.05
    ok = TestSuite.run("circle", str(tmp_path), patch=patch)
    assert ok
    (run_folder,) = [entry.path for entry in os.scandir(tmp_path)]
    path = os.path.join(run_folder, "checkpoint.npz")
    assert os.path.exists(path)
    from assistedmanipulation_tpu.checkpoint import load_metadata

    metadata = load_metadata(path)
    assert metadata["test"] == "circle"
    assert metadata["tick"] >= 20  # the last snapshot (t >= 0.10)
    assert metadata["file_sizes"]
