"""Test configuration: run on CPU with 8 virtual devices so sharding tests
exercise the multi-chip code paths without TPU hardware (the TPU answer to
"test multi-node without a cluster" — see SURVEY.md §4)."""

import os

# XLA_FLAGS must be in the environment before the CPU backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon TPU plugin (sitecustomize) registers itself and overrides
# jax_platforms at interpreter start; force it back to CPU before any
# backend initializes so tests never touch the tunneled TPU.
import jax

jax.config.update("jax_platforms", "cpu")
# Parity/oracle tests compare against float64 references; CPU supports x64.
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


def _build_fastlog():
    """Build native/fastlog.c in place before the suite imports csv_logger,
    so the byte-identical native-writer claim is verified on every run (the
    reference's CSV writer, csv.hpp:23-177, is always native). Skips quietly
    when no compiler is available — the two fastlog tests then skip."""
    import glob
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    source = os.path.join(root, "native", "fastlog.c")
    built = glob.glob(
        os.path.join(root, "assistedmanipulation_tpu", "_fastlog*.so")
    )
    if built and os.path.getmtime(built[0]) >= os.path.getmtime(source):
        return
    try:
        subprocess.run(
            ["python", os.path.join(root, "native", "setup.py"),
             "build_ext", "--inplace"],
            cwd=root,
            capture_output=True,
            timeout=120,
            check=True,
        )
    except (OSError, subprocess.SubprocessError):
        pass  # no toolchain: csv_logger falls back to Python, tests skip


_build_fastlog()


@pytest.fixture
def rng():
    return np.random.default_rng(42)
