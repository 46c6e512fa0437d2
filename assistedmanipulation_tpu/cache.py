"""Persistent XLA compilation cache.

The harness/bench entry points are one-shot processes; over a TPU tunnel a
cold compile of the fully-jitted episode costs 1-4 minutes per run. JAX's
persistent compilation cache stores compiled executables on disk keyed by
program fingerprint, so repeat invocations (same config/shapes) skip the
compile entirely.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "assistedmanipulation_tpu", "xla"
)


def enable_compilation_cache(directory: str = None) -> str:
    """Turn on the on-disk compilation cache (idempotent). Respects
    AM_TPU_CACHE_DIR; set AM_TPU_CACHE_DIR=0 to disable."""
    env = os.environ.get("AM_TPU_CACHE_DIR")
    if env == "0":
        return ""
    directory = directory or env or DEFAULT_DIR
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return directory
