"""Native CSV writer (native/fastlog.c) vs the Python fallback: identical
bytes, measurably faster."""

import os
import time

import numpy as np
import pytest

from assistedmanipulation_tpu.logging import csv_logger


def _write_rows(writer_cls_kwargs, path, rows):
    writer = csv_logger.CSVWriter(path, ["a", "b", "c"], **writer_cls_kwargs)
    for row in rows:
        writer.write(*row)
    writer.close()
    with open(path) as handle:
        return handle.read()


def test_native_matches_python_bytes(tmp_path, rng, monkeypatch):
    if csv_logger._fastlog is None:
        pytest.skip("native extension not built")
    rows = [tuple(map(float, rng.normal(size=3))) for _ in range(200)]
    rows += [(1, 2.5, "x"), (0, float("inf"), float("-0.0"))]

    native = _write_rows({}, str(tmp_path / "native.csv"), rows)
    monkeypatch.setattr(csv_logger, "_fastlog", None)
    fallback = _write_rows({}, str(tmp_path / "python.csv"), rows)
    assert native == fallback


def test_native_throughput(tmp_path, rng):
    if csv_logger._fastlog is None:
        pytest.skip("native extension not built")
    data = rng.normal(size=(2000, 16))
    writer = csv_logger.CSVWriter(
        str(tmp_path / "bulk.csv"), [f"c{i}" for i in range(16)]
    )
    start = time.perf_counter()
    for row in data:
        writer.write(row)
    writer.close()
    elapsed = time.perf_counter() - start
    # Generous bound: ~2k wide rows must come nowhere near a sim tick budget.
    assert elapsed < 2.0
    with open(tmp_path / "bulk.csv") as handle:
        assert sum(1 for _ in handle) == 2001
