"""Flagship serving composition — BASELINE config 5 in one builder.

"10-DoF + batched forecast scenarios + QP safety-filter layer, multi-host
sharded rollouts" (BASELINE.json configs[4]). This module is the single
composition root for that path so the benchmark (bench.py), the scaling
benchmark (scripts/scaling_bench.py), the driver's multichip dry run
(__graft_entry__.dryrun_multichip) and the sharding tests all exercise the
SAME code: the fused rollout kernel (Pallas on TPU / lanes / vmap), placed
per-device with shard_map over a 1-D rollout mesh or the 2-D scenario x
rollout mesh, with the ADMM-QP safety filter optionally attached to the
optimal re-rollout.

The reference has no analog — its parallelism ends at a 36-thread pool
(src/controller/concurrency.hpp, mppi.cpp:272-307) and both its QP safety
layer and its forecast-uncertainty handling were stubs (safety.cpp:5-22;
the Kalman covariance is computed then discarded, forecast.cpp:277-330).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import mppi as mppi_module
from ..models import frankaridgeback as fr
from .sharding import (
    ROLLOUT_AXIS,
    SCENARIO_AXIS,
    make_sharded_update,
    scenario_ctx_shardings,
    shard_planner_state,
    shard_rollout_fn,
)

LANES = 128


class Flagship(NamedTuple):
    """A ready-to-run flagship planner bundle."""

    planner: mppi_module.Planner
    update: Callable  # (state, x0, time, ctx) -> (state, info)
    init: Callable  # (seed) -> PlannerState (mesh-placed when sharded)
    make_ctx: Callable  # () -> ForecastContext (scenario-batched, placed)
    mesh: Optional[Mesh]
    x0: jax.Array


def default_mppi_configuration(
    rollouts: int,
    steps: int,
    optimal_rollout_mode: str = "batch",
    rng_impl: str = "rbg",
) -> mppi_module.Configuration:
    """The benchmark/serving MPPI configuration: reference defaults
    (base.hpp:69-101) at production rollout counts.

    ``rng_impl`` defaults to the TPU hardware RngBitGenerator ("rbg") —
    the serving choice (mppi.Configuration.rng_impl). Cross-placement
    exact-equality checks (sharding tests, dryrun_multichip) pass
    "threefry2x32", whose counter-based bits are partitioning-invariant;
    rbg bits may legally differ between shardings."""
    return mppi_module.Configuration(
        rollouts=rollouts,
        keep_best_rollouts=max(1, rollouts // 5),
        time_step=0.01,
        horizon=steps * 0.01,
        gradient_step=2.0,
        cost_scale=10.0,
        covariance=fr.DEFAULT_COVARIANCE,
        control_min=fr.DEFAULT_CONTROL_MIN,
        control_max=fr.DEFAULT_CONTROL_MAX,
        control_default=np.zeros(12),
        smoothing=mppi_module.Smoothing(window=10, order=1),
        dtype="float32",
        optimal_rollout_mode=optimal_rollout_mode,
        rng_impl=rng_impl,
    )


def synthetic_wrench_horizons(steps: int, scenarios: int = 1) -> jnp.ndarray:
    """Deterministic stand-in for the Kalman forecast ensemble
    (forecast/scenarios.sample_scenarios): scenario 0 is the mean — a
    constant 20 N x-force, the bench's canonical human pull — and the rest
    spread around it like posterior draws."""
    mean = jnp.zeros((steps + 1, 6), dtype=jnp.float32).at[:, 0].set(20.0)
    if scenarios == 1:
        return mean
    offsets = np.zeros((scenarios, 6), dtype=np.float32)
    # Alternate +/- force offsets of growing magnitude per scenario.
    for c in range(1, scenarios):
        offsets[c, (c - 1) % 3] = 2.0 * ((-1) ** c) * ((c + 1) // 2)
    return mean[None] + jnp.asarray(offsets)[:, None, :]


def build_flagship(
    rollouts: int = 10_000 - mppi_module.STATIC_ROLLOUTS,
    steps: int = 50,
    backend: str = "pallas",
    mesh: Optional[Mesh] = None,
    scenarios: int = 1,
    safety: bool = False,
    optimal_rollout_mode: str = "batch",
    interpret: Optional[bool] = None,
    sublanes: Optional[int] = None,
    rng_impl: str = "rbg",
    fused_sampling: Optional[bool] = None,
    fused_assembly: Optional[bool] = None,
    sampler_shards: int = 1,
) -> Flagship:
    """Compose the flagship planner.

    - ``mesh``: a 1-D (rollouts,) mesh shards the rollout batch over
      devices; a 2-D (scenarios, rollouts) mesh (make_scenario_mesh)
      additionally shards the forecast-scenario ensemble. The fused kernel
      is placed per device via shard_rollout_fn; rollout_count must divide
      the rollout axis and ``scenarios`` the scenario axis.
    - ``scenarios`` > 1 scores every rollout against a wrench-forecast
      ensemble (risk-neutral scenario mean), BASELINE config 5.
    - ``safety`` attaches the ADMM-QP trajectory filter
      (safety.make_safety_filter) to the optimal re-rollout.
    """
    from ..objectives.assisted_manipulation import ForecastContext

    configuration = default_mppi_configuration(
        rollouts, steps, optimal_rollout_mode, rng_impl=rng_impl
    )
    rollout_count = configuration.rollout_count

    rollout_axis_size = 1
    scenario_axis = None
    if mesh is not None:
        if ROLLOUT_AXIS not in mesh.axis_names:
            raise ValueError(f"mesh must carry a '{ROLLOUT_AXIS}' axis")
        rollout_axis_size = mesh.shape[ROLLOUT_AXIS]
        if rollout_count % rollout_axis_size:
            raise ValueError(
                f"rollout count {rollout_count} not divisible by the "
                f"{rollout_axis_size}-device rollout axis"
            )
        if SCENARIO_AXIS in mesh.axis_names and scenarios > 1:
            scenario_axis = SCENARIO_AXIS
            if scenarios % mesh.shape[SCENARIO_AXIS]:
                raise ValueError(
                    f"{scenarios} scenarios not divisible by the "
                    f"{mesh.shape[SCENARIO_AXIS]}-device scenario axis"
                )

    filter_fn = None
    if safety:
        from ..safety import make_safety_filter

        filter_fn = make_safety_filter()

    wrapper = None
    if mesh is not None:
        wrapper = lambda fn: shard_rollout_fn(  # noqa: E731
            fn, mesh, ROLLOUT_AXIS, scenario_axis=scenario_axis
        )
    elif scenarios > 1:
        from ..forecast.scenarios import make_scenario_rollout_fn

        wrapper = make_scenario_rollout_fn

    if backend == "pallas":
        from ..kernels.pallas_rollout import make_pallas_planner

        if sublanes is None:
            local_rollouts = rollout_count // rollout_axis_size
            sublanes = max(1, min(16, local_rollouts // LANES))
        # Lane-layout fused sampling (PallasSampler) is the default pallas
        # composition everywhere: unsharded serving, shard_map-placed under
        # a 1-D rollout mesh or 2-D scenario x rollout mesh, and scenario
        # ensembles (the sampler scores the risk-neutral scenario mean
        # in-layout) — the bench path and the multichip path are the SAME
        # program. Pass fused_sampling=False to force the logical layout
        # (e.g. for the noise_override parity hook,
        # scripts/tpu_crosscheck.py).
        if fused_sampling is None:
            fused_sampling = True
        if fused_assembly is None:
            # In-kernel noise assembly at the full 16-sublane tile measured
            # +5% over the two-pass path (PERF.md round-5; the round-4
            # "neutral" verdict was the old VMEM budget forcing an 8-lane
            # tile). Scenario ensembles need the two-pass sampler (the
            # fused kernel cannot re-score its controls per scenario), and
            # LONG horizons need the two-pass kernel's horizon chunking
            # (the fused kernel's 3 horizon streams can only narrow the
            # tile, which measured 25-30% slower and OOMs VMEM at S=1000)
            # — so fused only when its tile stays at the full 16 sublanes.
            from ..kernels.pallas_rollout import max_sublanes_for_vmem

            fused_assembly = (
                scenarios == 1
                and max_sublanes_for_vmem(steps, 3, 16) >= 16
            )
        if fused_sampling:
            planner = make_pallas_planner(
                configuration,
                sublanes=sublanes,
                interpret=interpret,
                filter_fn=filter_fn,
                fused_sampling=True,
                fused_assembly=fused_assembly,
                mesh=mesh,
                rollout_axis=ROLLOUT_AXIS,
                scenario_axis=scenario_axis,
                sampler_shards=sampler_shards,
            )
        else:
            planner = make_pallas_planner(
                configuration,
                sublanes=sublanes,
                interpret=interpret,
                filter_fn=filter_fn,
                rollout_fn_wrapper=wrapper,
                fused_sampling=False,
            )
    elif backend == "lanes":
        from ..kernels.lane_rollout import make_lanes_planner

        planner = make_lanes_planner(
            configuration, filter_fn=filter_fn, rollout_fn_wrapper=wrapper
        )
    elif backend == "vmap":
        from ..models.model_data import frankaridgeback_model
        from ..objectives.assisted_manipulation import AssistedManipulation

        model = frankaridgeback_model()
        plant = fr.make_plant(AssistedManipulation(), fr.Configuration(), model)
        rollout_fn = None
        if wrapper is not None:
            # The vmap path has no standalone rollout_fn to wrap; build one
            # from a throwaway planner's generic batch rollout.
            base = mppi_module.Planner(configuration, plant)
            rollout_fn = wrapper(
                lambda noise, optimal, x0, time, ctx: base._rollout_batch(
                    noise, optimal, x0, time, ctx
                )
            )
        planner = mppi_module.Planner(
            configuration, plant, rollout_fn=rollout_fn, filter_fn=filter_fn
        )
    else:
        raise ValueError(f"unknown backend {backend!r}")

    if mesh is not None:
        sharded_update = make_sharded_update(
            planner,
            mesh,
            ctx_shardings=(
                scenario_ctx_shardings(mesh) if scenario_axis else None
            ),
        )

        def update(state, x0, time, ctx=None):
            return sharded_update(
                state,
                jnp.asarray(x0, planner.dtype),
                jnp.asarray(time, planner.dtype),
                ctx,
            )

        def init(seed: int = 0):
            return shard_planner_state(planner, planner.init(seed), mesh)

    else:
        update = planner.update
        init = planner.init

    def make_ctx():
        ctx = ForecastContext(
            wrench_horizon=synthetic_wrench_horizons(steps, scenarios),
            start_time=jnp.asarray(0.0, dtype=jnp.float32),
            time_step=0.01,
            horizon=steps * 0.01,
        )
        if mesh is not None:
            placement = (
                scenario_ctx_shardings(mesh)
                if scenario_axis
                else jax.tree.map(
                    lambda _: NamedSharding(mesh, P()), ctx
                )
            )
            ctx = jax.device_put(ctx, placement)
        return ctx

    x0 = jnp.asarray(fr.make_state("huddled"), dtype=jnp.float32)
    return Flagship(planner, update, init, make_ctx, mesh, x0)
