"""Test harness: name registry, CLI, timestamped output folders.

Re-implements the reference L5 harness (src/test/test.hpp:23-261,
main.cpp:102-158):

- tests self-register under a name (RegisteredTest static-init pattern ->
  a decorator here);
- CLI: ``-l`` lists tests; ``--test <name> --out <dir> [--config <json>]``
  runs one, with the JSON config merge-patched onto the test's defaults;
- every run writes ``<out>/<name>_<datetime>/`` with the fully-resolved
  configuration.json (base.cpp:88-96) and the CSV logging tree;
- wall-clock timing and progress output (test.hpp:180-212).

Run: ``python -m assistedmanipulation_tpu.harness --test base --out runs``.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time as time_module

_REGISTRY: dict = {}


def register_test(name: str):
    """Class decorator: register a test case under ``name``
    (test.hpp:233-261)."""

    def wrap(cls):
        cls.TEST_NAME = name
        _REGISTRY[name] = cls
        return cls

    return wrap


class TestSuite:
    @staticmethod
    def names():
        return sorted(_REGISTRY)

    @staticmethod
    def run(name: str, out: str, patch: dict = None, duration: float = None) -> bool:
        """Create and run a registered test (test.hpp:134-215)."""
        if name not in _REGISTRY:
            print(f"unknown test {name!r}; available: {TestSuite.names()}", file=sys.stderr)
            return False

        stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        folder = os.path.join(out, f"{name}_{stamp}")
        os.makedirs(folder, exist_ok=True)

        cls = _REGISTRY[name]
        test = cls(folder=folder, patch=patch or {}, duration=duration)

        # Dump the fully-resolved configuration (base.cpp:88-96).
        try:
            from .. import config as cfg

            with open(os.path.join(folder, "configuration.json"), "w") as handle:
                json.dump(cfg.to_json(test.configuration), handle, indent=2, default=str)
        except Exception as error:  # config dump must never kill the run
            print(f"configuration dump failed: {error}", file=sys.stderr)

        print(f"running test {name!r} -> {folder}")
        start = time_module.perf_counter()
        try:
            ok = test.run()
        finally:
            if hasattr(test, "close"):
                test.close()
        elapsed = time_module.perf_counter() - start
        print(f"test {name!r} {'passed' if ok else 'FAILED'} in {elapsed:.1f}s")
        return ok

    @staticmethod
    def resume(run_folder: str) -> bool:
        """Continue an interrupted run from its checkpoint.npz (SURVEY
        §5.4): the test class comes from the checkpoint metadata, the
        configuration from the folder's configuration.json, the CSV tree
        truncates to the snapshot and continues in append mode."""
        from .. import checkpoint as checkpoint_module

        path = os.path.join(run_folder, "checkpoint.npz")
        if not os.path.exists(path):
            print(f"no checkpoint.npz in {run_folder}", file=sys.stderr)
            return False
        name = checkpoint_module.load_metadata(path)["test"]
        if name not in _REGISTRY:
            print(f"unknown test {name!r} in checkpoint", file=sys.stderr)
            return False
        test = _REGISTRY[name].resume(run_folder)
        print(
            f"resuming test {name!r} in {run_folder} from t={test.time:.3f}s "
            f"(tick {test._start_tick})"
        )
        start = time_module.perf_counter()
        try:
            ok = test.run()
        finally:
            if hasattr(test, "close"):
                test.close()
        elapsed = time_module.perf_counter() - start
        print(f"test {name!r} {'passed' if ok else 'FAILED'} in {elapsed:.1f}s")
        return ok


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="assistedmanipulation_tpu.harness",
        description="TPU MPPI experiment harness",
    )
    parser.add_argument("-l", "--list", action="store_true", help="list tests")
    parser.add_argument("--test", help="test name to run")
    parser.add_argument(
        "--resume",
        metavar="RUN_FOLDER",
        help="continue an interrupted run from its checkpoint.npz "
        "(enable snapshots with --config '{\"checkpoint_interval\": N}')",
    )
    parser.add_argument("--out", default="runs", help="output directory")
    parser.add_argument("--config", help="JSON merge-patch onto the defaults")
    parser.add_argument("--duration", type=float, help="override duration [s]")
    parser.add_argument(
        "--platform",
        default=None,
        help="force a jax platform (e.g. cpu) before running",
    )
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    # Persistent XLA cache: repeat runs of the same configuration skip the
    # (minutes-long over a TPU tunnel) episode compile.
    from ..cache import enable_compilation_cache

    enable_compilation_cache()

    if args.list:
        for name in TestSuite.names():
            print(name)
        return 0

    if args.resume:
        return 0 if TestSuite.resume(args.resume) else 1

    if not args.test:
        parser.print_help()
        return 1

    patch = json.loads(args.config) if args.config else {}
    ok = TestSuite.run(args.test, args.out, patch, args.duration)
    return 0 if ok else 1
