"""Checkpoint / resume for controller and experiment state.

The reference has NO state serialization anywhere (SURVEY §5.4): the only
warm state is in-memory (shifted optimal control + kept rollout noise,
mppi.cpp:194-253, and the forecast filter estimate). This module adds what
the reference lacked: any jax pytree — ``PlannerState``, Kalman forecast
state, episode state — round-trips through a single ``.npz`` file keyed by
tree path, so long experiments resume exactly (same optimal control, same
RNG key, same elite noise, same filter covariance).

Restore is template-driven: the caller supplies a pytree of the right
structure (e.g. ``planner.init()``) and gets back the saved values cast to
the template's dtypes, with path/shape validation — a structural mismatch
(config drift between save and load) fails loudly instead of mis-assigning
leaves.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import numpy as np
import jax
from jax.tree_util import keystr, tree_flatten_with_path, tree_unflatten

FORMAT_VERSION = 1


def save_checkpoint(path: str, tree: Any, metadata: Optional[dict] = None):
    """Serialize a pytree of arrays/scalars to ``path`` (.npz). ``metadata``
    is any JSON-serializable dict stored alongside (config digest, time,
    update count, ...)."""
    leaves, _ = tree_flatten_with_path(tree)
    arrays = {}
    paths = []
    for index, (key_path, value) in enumerate(leaves):
        arrays[f"leaf_{index}"] = np.asarray(value)
        paths.append(keystr(key_path))
    manifest = {
        "version": FORMAT_VERSION,
        "paths": paths,
        "metadata": metadata or {},
    }
    directory = os.path.dirname(os.path.abspath(path))
    os.makedirs(directory, exist_ok=True)
    # Write-then-rename so a crash mid-save never leaves a torn checkpoint.
    temporary = path + ".tmp"
    with open(temporary, "wb") as handle:
        np.savez(handle, __manifest__=json.dumps(manifest), **arrays)
    os.replace(temporary, path)


def load_metadata(path: str) -> dict:
    with np.load(path, allow_pickle=False) as data:
        return json.loads(str(data["__manifest__"]))["metadata"]


def restore_checkpoint(path: str, template: Any) -> Any:
    """Load a checkpoint into the structure of ``template``. Leaf dtypes
    follow the template (so a float64-saved state restores onto a float32
    planner cleanly); paths and shapes must match exactly."""
    leaves, treedef = tree_flatten_with_path(template)
    with np.load(path, allow_pickle=False) as data:
        manifest = json.loads(str(data["__manifest__"]))
        if manifest["version"] != FORMAT_VERSION:
            raise ValueError(
                f"checkpoint version {manifest['version']} != {FORMAT_VERSION}"
            )
        saved_paths = manifest["paths"]
        template_paths = [keystr(key_path) for key_path, _ in leaves]
        if saved_paths != template_paths:
            missing = set(saved_paths) ^ set(template_paths)
            raise ValueError(
                "checkpoint structure does not match template "
                f"(differing leaves: {sorted(missing)[:8]})"
            )
        restored = []
        for index, (_, leaf) in enumerate(leaves):
            value = data[f"leaf_{index}"]
            leaf = jax.numpy.asarray(leaf)
            if value.shape != leaf.shape:
                raise ValueError(
                    f"leaf {template_paths[index]} shape {value.shape} != "
                    f"template {leaf.shape}"
                )
            restored.append(jax.numpy.asarray(value, dtype=leaf.dtype))
    return tree_unflatten(treedef, restored)
