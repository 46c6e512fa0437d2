"""TPU numeric cross-check of the production Pallas kernel (VERDICT r1 #9).

Runs ONE planner update at the flagship size (10k rollouts x 50 steps) on
the real TPU through all three rollout backends — the fused Pallas kernel
(sublanes=16, the path bench.py times), the pure-XLA lanes kernel, and the
reference-semantics vmap path — feeding all three the SAME noise tensor via
the parity hook (mppi.Planner.update(noise_override=...)), and compares the
per-rollout cost channels, softmax weights, and resulting optimal control.

Writes TPU_CROSSCHECK.json with the measured deviations and fails loudly if
they exceed f32 accumulation tolerances. This is the correctness artifact
for the production kernel configuration (the benchmark checks throughput,
not values).

Usage: python scripts/tpu_crosscheck.py  (on the TPU host; ~3 compiles)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROLLOUTS = int(os.environ.get("CROSSCHECK_ROLLOUTS", 10_000))
STEPS = int(os.environ.get("CROSSCHECK_STEPS", 50))


def main():
    import jax

    from assistedmanipulation_tpu.cache import enable_compilation_cache

    enable_compilation_cache()

    from assistedmanipulation_tpu import mppi as mppi_module
    from assistedmanipulation_tpu.models import frankaridgeback as fr
    from assistedmanipulation_tpu.parallel.flagship import build_flagship

    device = jax.devices()[0]
    print(f"device: {device.device_kind}", flush=True)

    sampled = ROLLOUTS - mppi_module.STATIC_ROLLOUTS
    rng = np.random.default_rng(0)
    # The parity hook replaces the sampled noise wholesale; draw it on the
    # host at the engine's covariance scale so barriers/saturations see
    # realistic magnitudes.
    scale = np.sqrt(np.asarray(fr.DEFAULT_COVARIANCE, dtype=np.float64))
    noise = (
        rng.standard_normal((sampled, STEPS, 12)) * scale
    ).astype(np.float32)

    results = {}
    for backend in ("pallas", "lanes", "vmap"):
        flagship = build_flagship(
            rollouts=sampled, steps=STEPS, backend=backend, mesh=None,
            # The parity hook injects noise in the logical layout; the
            # fused lane-layout sampler's unique logic (noise assembly) is
            # exact-equality-tested in tests/test_pallas_rollout.py and its
            # kernel is this same pallas_call.
            fused_sampling=False,
        )
        state = flagship.init(seed=0)
        ctx = flagship.make_ctx()
        state, info = flagship.planner.update(
            state, flagship.x0, 0.0, ctx, noise_override=noise
        )
        jax.block_until_ready(state.optimal_control)
        results[backend] = {
            "costs": np.asarray(info.costs, dtype=np.float64),
            "weights": np.asarray(info.weights, dtype=np.float64),
            "optimal": np.asarray(state.optimal_control, dtype=np.float64),
        }
        print(f"{backend}: cost[2]={results[backend]['costs'][2]:.6e}", flush=True)

    def rel(a, b):
        denominator = np.maximum(np.abs(a), np.abs(b))
        return float(
            np.max(np.abs(a - b) / np.where(denominator > 0, denominator, 1.0))
        )

    report = {
        "device": device.device_kind,
        "rollouts": ROLLOUTS,
        "steps": STEPS,
        "pairs": {},
    }
    ok = True
    for a, b in (("pallas", "lanes"), ("pallas", "vmap"), ("lanes", "vmap")):
        ra, rb = results[a], results[b]
        # Saturated barrier costs (1e10-scale) make relative comparison the
        # right metric for costs; weights/optimal are absolute-bounded.
        entry = {
            "max_rel_cost": rel(ra["costs"], rb["costs"]),
            "max_abs_weight": float(np.max(np.abs(ra["weights"] - rb["weights"]))),
            "max_abs_optimal": float(np.max(np.abs(ra["optimal"] - rb["optimal"]))),
        }
        report["pairs"][f"{a}_vs_{b}"] = entry
        print(f"{a} vs {b}: {entry}", flush=True)
        # f32 accumulation over 50 fused steps reorders sums; 1e-3 relative
        # on costs and 1e-3 absolute on the bounded weights/control is the
        # parity bar (controls are O(0.1-100), weights O(1e-4)).
        if (
            entry["max_rel_cost"] > 1e-3
            or entry["max_abs_weight"] > 1e-3
            or entry["max_abs_optimal"] > 1e-2
        ):
            ok = False

    report["ok"] = ok
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TPU_CROSSCHECK.json",
    )
    with open(out, "w") as handle:
        json.dump(report, handle, indent=1)
    print(f"wrote {out}; ok={ok}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
