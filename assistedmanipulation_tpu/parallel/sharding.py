"""Rollout-axis sharding over a device mesh.

The reference's only parallel substrate is a 36-thread pool with per-thread
dynamics copies and a future barrier (src/controller/concurrency.hpp,
mppi.cpp:272-307). The TPU-native equivalent: the rollout batch axis shards
over a ``jax.sharding.Mesh`` axis; XLA partitions the embarrassingly-parallel
rollout scan and inserts psum/all-gather collectives exactly where the
reference did serial reductions (cost min/max mppi.cpp:356-366, likelihood
sum mppi.cpp:395-397, weighted-noise gradient mppi.cpp:413-418).

The planner state arrays with a leading rollout axis (noise, costs) are
sharded; the published optimal control and scalars replicate.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mppi import Planner, PlannerState


ROLLOUT_AXIS = "rollouts"
SCENARIO_AXIS = "scenarios"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = ROLLOUT_AXIS) -> Mesh:
    """1-D mesh over all local devices (rollout data parallelism over ICI)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_scenario_mesh(
    scenarios: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D mesh (scenarios x rollouts): the forecast-scenario ensemble axis
    shards over one mesh dimension and the rollout batch over the other —
    BASELINE config 5's layout. The scenario mean reduction becomes a psum
    over the scenario axis; rollout weighting reduces over the rollout axis."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if devices.size % scenarios:
        raise ValueError(
            f"{devices.size} devices not divisible by {scenarios} scenarios"
        )
    grid = devices.reshape(scenarios, devices.size // scenarios)
    return Mesh(grid, (SCENARIO_AXIS, ROLLOUT_AXIS))


def initialize_multi_host(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Join a multi-host (multi-process) run: jax.distributed.initialize
    with explicit or env-provided topology. After this, jax.devices() spans
    every host's chips and the same mesh/sharding code scales over DCN —
    the reference had no multi-node story at all (SURVEY §2.6)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def planner_state_shardings(planner: Planner, mesh: Mesh, axis: str = ROLLOUT_AXIS):
    """NamedShardings for a PlannerState: rollout-major arrays shard over
    ``axis``, everything else replicates."""
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(axis))
    return PlannerState(
        optimal_control=replicated,
        noise=sharded,
        costs=sharded,
        last_shift_time=replicated,
        last_update_time=replicated,
        sg_buffer=replicated,
        sg_time=replicated,
        rng=replicated,
        update_count=replicated,
        optimal_cost=replicated,
        update_duration=replicated,
    )


def shard_planner_state(
    planner: Planner, state: PlannerState, mesh: Mesh, axis: str = ROLLOUT_AXIS
) -> PlannerState:
    """Place an existing PlannerState onto the mesh."""
    shardings = planner_state_shardings(planner, mesh, axis)
    return jax.tree.map(jax.device_put, state, shardings)


def make_sharded_update(
    planner: Planner,
    mesh: Mesh,
    axis: str = ROLLOUT_AXIS,
    ctx_shardings=None,
):
    """Jit the planner update with explicit in/out shardings over the mesh.

    The rollout count must be divisible by the mesh size for an even layout
    (the reference tolerated ragged thread partitions via std::div,
    mppi.cpp:277-287; on TPU we require divisibility for static shapes).

    ``ctx_shardings``: optional sharding pytree for the forecast ctx — pass
    ``scenario_ctx_shardings(mesh)`` to shard a scenario-ensemble ctx over
    the scenario mesh axis; by default the ctx replicates.
    """
    state_shardings = planner_state_shardings(planner, mesh, axis)
    replicated = NamedSharding(mesh, P())
    if ctx_shardings is None:
        ctx_shardings = replicated

    update = jax.jit(
        planner._update_impl,
        # The replicated entries are pytree prefixes: x0 and time replicate
        # across the mesh.
        in_shardings=(state_shardings, replicated, replicated, ctx_shardings),
        donate_argnums=0,
    )
    return update


def shard_rollout_fn(
    rollout_fn,
    mesh: Mesh,
    axis: str = ROLLOUT_AXIS,
    scenario_axis: Optional[str] = None,
    scenario_weights=None,
):
    """shard_map a fused rollout evaluator (lanes / Pallas) over the mesh.

    GSPMD cannot partition an opaque ``pallas_call``, so the flagship kernel
    is placed per device explicitly: each device runs the SAME fused kernel
    on its local block of the rollout batch — the TPU equivalent of the
    reference's thread fan-out + future barrier (mppi.cpp:272-307), with the
    mesh axis in place of the 36-thread block partition (mppi.cpp:277-287).

    On a 2-D scenario x rollout mesh (``scenario_axis`` given, BASELINE
    config 5) the forecast-scenario ensemble additionally splits over the
    scenario axis: each device scores its rollout block against its local
    scenario slice and the risk-neutral scenario mean
    (forecast/scenarios.make_scenario_rollout_fn semantics) becomes a psum
    over the scenario axis. ``scenario_weights`` (global, shape (C,)) makes
    the reduction risk-weighted instead.

    Per-device shapes are static: rollout_count must divide the rollout mesh
    axis size and the scenario count the scenario axis size.

    ``rollout_fn`` returns ``((R_local, 2) costs, (S, state_dof) rollout-0
    states)``; the states are only meaningful on the device holding rollout
    0 (the first rollout shard), so they gate on axis_index and psum to
    every device — replicated out_specs, a 6 KB collective.
    """

    def _broadcast_states(states):
        first = jax.lax.axis_index(axis) == 0
        return jax.lax.psum(
            jnp.where(first, states, jnp.zeros_like(states)), axis
        )

    if scenario_axis is None:

        def plain_local(noise, optimal_shifted, x0, time, ctx):
            costs, states = rollout_fn(noise, optimal_shifted, x0, time, ctx)
            return costs, _broadcast_states(states)

        return jax.shard_map(
            plain_local,
            mesh=mesh,
            in_specs=(P(axis), P(), P(), P(), P()),
            out_specs=(P(axis), P()),
            check_vma=False,
        )

    from ..objectives.assisted_manipulation import ForecastContext

    ctx_specs = ForecastContext(
        wrench_horizon=P(scenario_axis),
        start_time=P(),
        time_step=P(),
        horizon=P(),
    )
    scenario_shards = mesh.shape[scenario_axis]
    if scenario_weights is not None:
        weights = np.asarray(scenario_weights, dtype=np.float64)
        weights = weights / weights.sum()

    def local(noise, optimal_shifted, x0, time, ctx):
        horizons = ctx.wrench_horizon  # (C_local, steps + 1, 6)
        local_scenarios = horizons.shape[0]

        def one(horizon):
            return rollout_fn(
                noise,
                optimal_shifted,
                x0,
                time,
                ctx._replace(wrench_horizon=horizon),
            )

        costs, states = jax.lax.map(one, horizons)  # (C_local, R_local, 2)
        # Rollout-0 states are scenario-independent (the forecast only
        # enters the cost); any scenario slice is the trajectory. They
        # replicate across the scenario axis by construction, so only the
        # rollout-axis broadcast is needed.
        states = _broadcast_states(states[0])
        if scenario_weights is None:
            total = jax.lax.psum(jnp.sum(costs, axis=0), scenario_axis)
            return total / (local_scenarios * scenario_shards), states
        local_w = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(weights, costs.dtype),
            jax.lax.axis_index(scenario_axis) * local_scenarios,
            local_scenarios,
        )
        partial = jnp.einsum("c,crk->rk", local_w, costs)
        return jax.lax.psum(partial, scenario_axis), states

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), ctx_specs),
        out_specs=(P(axis), P()),
        check_vma=False,
    )


def scenario_ctx_shardings(mesh: Mesh, axis: str = SCENARIO_AXIS):
    """ForecastContext shardings for a scenario-batched ctx: the (C, S+1, 6)
    wrench ensemble splits over the scenario mesh axis, scalars replicate."""
    from ..objectives.assisted_manipulation import ForecastContext

    return ForecastContext(
        wrench_horizon=NamedSharding(mesh, P(axis)),
        start_time=NamedSharding(mesh, P()),
        time_step=None,
        horizon=None,
    )
