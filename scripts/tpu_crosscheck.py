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

    # In-kernel PRNG distribution check (VERDICT r3 item 5): the TPU-only
    # Box-Muller sampler (_inkernel_rng_sample_rollout_kernel) must draw
    # N(0, diag) at the engine's covariance scale. Interpret mode cannot
    # run it (pltpu.prng_seed has no CPU lowering), so the distribution
    # gate lives here, on hardware.
    from assistedmanipulation_tpu.kernels.pallas_rollout import (
        make_pallas_planner,
    )
    from assistedmanipulation_tpu.parallel.flagship import (
        default_mppi_configuration,
    )
    import jax.numpy as jnp

    import dataclasses as _dc

    # keep_best_rollouts=0 so every sampled row is a FRESH in-kernel draw:
    # with elite reuse on, 20% of rows carry prior-update noise (zeros
    # after update 1 — measured variance exactly 0.8 sigma^2 — and
    # low-cost-SELECTED draws thereafter), which is assembly semantics,
    # not the PRNG under test.
    planner = make_pallas_planner(
        _dc.replace(
            default_mppi_configuration(sampled, STEPS),
            keep_best_rollouts=0,
        ),
        fused_sampling=True,
        inkernel_rng=True,
        sublanes=8,
    )
    state = planner.init(seed=0)
    flagship_ctx = build_flagship(
        rollouts=sampled, steps=STEPS, backend="pallas"
    ).make_ctx()
    x0 = jnp.asarray(fr.make_state("huddled"), jnp.float32)
    state, _ = planner.update(
        state, x0, jnp.asarray(0.0, jnp.float32), flagship_ctx
    )
    jax.block_until_ready(state.noise)
    lane = np.asarray(state.noise, dtype=np.float64)
    flat = lane.transpose(0, 3, 4, 1, 2).reshape(-1, STEPS, 12)[
        mppi_module.STATIC_ROLLOUTS : ROLLOUTS
    ]
    dist = {"per_dof": [], "ok": True}
    for d in range(12):
        expected = float(scale[d])
        z = flat[:, :, d].ravel()
        got_std = float(z.std())
        entry = {
            "dof": d,
            "mean": round(float(z.mean()), 5),
            "std": round(got_std, 5),
            "expected_std": round(expected, 5),
        }
        if expected > 0:
            skew = float(((z - z.mean()) ** 3).mean() / max(got_std, 1e-12) ** 3)
            entry["skew"] = round(skew, 4)
            n = z.size
            # 5-sigma gates on the sample mean and std of n iid normals.
            if (
                abs(entry["mean"]) > 5 * expected / np.sqrt(n)
                or abs(got_std - expected) > 5 * expected / np.sqrt(2 * n)
                or abs(skew) > 5 * np.sqrt(6.0 / n)
            ):
                dist["ok"] = False
        elif got_std != 0.0:
            dist["ok"] = False
        dist["per_dof"].append(entry)
    dist["draws_per_dof"] = int(flat.shape[0] * STEPS)
    report["inkernel_rng_distribution"] = dist
    print(f"inkernel_rng distribution ok={dist['ok']}", flush=True)
    ok = ok and dist["ok"]

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
