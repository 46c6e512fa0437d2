"""Fused MPPI rollout+cost as a Pallas TPU kernel.

The reference's hot loop — 50 rollouts x 30 steps of dynamics + objective on
a 36-thread pool (src/controller/mppi.cpp:272-342) — becomes ONE Pallas
kernel: the rollout batch is tiled over the grid, each grid program holds a
(8, 128) lane tile of rollouts, and the full per-step pipeline (FK, 7-term
assisted-manipulation cost, CRBA mass matrix, implicit-PD Cholesky solve,
semi-implicit Euler) runs as scalar-graph VPU ops on those tiles inside a
``fori_loop`` over the horizon. Per-rollout state (q, v — 24 lanes) lives in
registers/VMEM for the whole horizon; the only HBM traffic is the streamed
control tile in and the two cost channels out.

Layout: lanes are (SUBLANES, 128) = the native f32 VPU tile, so every scalar
of the rigid-body graph is exactly one vector register and every graph op is
one VPU instruction with zero padding. The control tensor is pre-transposed
on the host to (G, S, 12, SUBLANES, 128); Mosaic double-buffers the per-
program (S, 12, SUBLANES, 128) block across grid steps, overlapping the next
tile's DMA with the current tile's compute.

Cost semantics are identical to the pure-XLA lanes backend
(kernels/lane_rollout.py) and transitively to the vmap reference path —
cross-validated by tests/test_pallas_rollout.py in interpreter mode.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import frankaridgeback as fr
from ..models.model_data import RobotModel
from ..objectives.assisted_manipulation import (
    Configuration as ObjectiveConfiguration,
)
from .lane_rollout import (
    TrajectoryStepData,
    step_cost_and_dynamics,
    trajectory_step_data,
)

LANES = 128


def _rollout_kernel(
    # SMEM scalar tables (same for every grid program):
    q0_ref,  # (12, 1)
    v0_ref,  # (12, 1)
    energy_ref,  # (1, 1)
    target_ref,  # (S, 3)
    inv2_ref,  # (S, 1)
    pcost_ref,  # (S, 1)
    vtarget_ref,  # (S, 1)
    disc_ref,  # (S, 1)
    # VMEM blocks:
    controls_ref,  # (S, 12, SUBLANES, LANES) this tile's absolute controls
    out_ref,  # (2, SUBLANES, LANES) cost channels
    # VMEM scratch: rollout state lives on-chip for the whole horizon.
    q_ref,  # (12, SUBLANES, LANES)
    v_ref,  # (12, SUBLANES, LANES)
    *,
    model: RobotModel,
    objective_cfg: ObjectiveConfiguration,
    kp: np.ndarray,
    kd: np.ndarray,
    steps: int,
    dt: float,
    sublanes: int,
):
    shape = (sublanes, LANES)
    dtype = controls_ref.dtype

    # Initialize on-chip state + accumulators (the scratch refs give the
    # loop state a concrete vector layout; plain jnp.full carries are
    # "replicated" splats Mosaic cannot relayout at the loop back-edge).
    for i in range(12):
        q_ref[i] = jnp.full(shape, q0_ref[i, 0], dtype=dtype)
        v_ref[i] = jnp.full(shape, v0_ref[i, 0], dtype=dtype)
    out_ref[0] = jnp.zeros(shape, dtype=dtype)
    out_ref[1] = jnp.zeros(shape, dtype=dtype)
    energy = jnp.full(shape, energy_ref[0, 0], dtype=dtype)

    def body(s, _):
        controls_s = controls_ref[s]  # (12, SUBLANES, LANES)
        u = [controls_s[d] for d in range(12)]
        q = [q_ref[i] for i in range(12)]
        v = [v_ref[i] for i in range(12)]
        step_viol, step_smooth, q_next, v_next = step_cost_and_dynamics(
            model,
            objective_cfg,
            kp,
            kd,
            q,
            v,
            u,
            energy,
            [target_ref[s, 0], target_ref[s, 1], target_ref[s, 2]],
            inv2_ref[s, 0],
            pcost_ref[s, 0],
            vtarget_ref[s, 0],
            dt,
        )
        disc = disc_ref[s, 0]
        for i in range(12):
            q_ref[i] = q_next[i]
            v_ref[i] = v_next[i]
        out_ref[0] += disc * step_viol
        out_ref[1] += disc * step_smooth
        return 0

    jax.lax.fori_loop(0, steps, body, 0)


def make_pallas_rollout_fn(
    model: RobotModel,
    objective_cfg: ObjectiveConfiguration,
    robot_cfg: fr.Configuration,
    steps: int,
    dt: float,
    discount: float = 1.0,
    sublanes: int = 8,
    interpret: Optional[bool] = None,
):
    """Rollout evaluator matching Planner's ``rollout_fn`` signature, backed
    by the fused Pallas kernel. ``sublanes`` sets the tile height (8 is the
    native f32 tile; tests use 1 for fast interpreter runs)."""
    _, kp, kd = robot_cfg.resolve()
    tile = sublanes * LANES
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(
        _rollout_kernel,
        model=model,
        objective_cfg=objective_cfg,
        kp=kp,
        kd=kd,
        steps=steps,
        dt=dt,
        sublanes=sublanes,
    )

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731

    def fn(noise, optimal_shifted, x0, time, ctx):
        dtype = noise.dtype
        R = noise.shape[0]
        if ctx is None:
            zeros = jnp.zeros((steps,), dtype=dtype)
            traj = TrajectoryStepData(
                target=jnp.zeros((steps, 3), dtype=dtype),
                inv_norm2=zeros,
                position_cost=zeros,
                velocity_target=zeros,
                active=jnp.zeros((steps,), dtype=bool),
            )
        else:
            traj = trajectory_step_data(objective_cfg, ctx, time, steps, dt)

        # Absolute controls; fold the optimal sequence in on the host side so
        # the kernel streams a single tensor (mppi.cpp:319 u = opt + noise).
        controls = noise + optimal_shifted[None].astype(dtype)
        G = -(-R // tile)
        pad = G * tile - R
        if pad:
            controls = jnp.concatenate(
                [controls, jnp.zeros((pad, steps, 12), dtype=dtype)], axis=0
            )
        # (R', S, 12) -> (G, S, 12, SUBLANES, LANES): rollout r = ((g * SUB)
        # + a) * 128 + b so the reshape is a pure relayout.
        controls = controls.reshape(G, sublanes, LANES, steps, 12)
        controls = controls.transpose(0, 3, 4, 1, 2)

        discounts = (discount ** jnp.arange(steps, dtype=dtype)).reshape(
            steps, 1
        )
        x0 = x0.astype(dtype)

        out = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                smem(),  # q0
                smem(),  # v0
                smem(),  # energy
                smem(),  # target
                smem(),  # inv_norm2
                smem(),  # position_cost
                smem(),  # velocity_target
                smem(),  # discounts
                pl.BlockSpec(
                    (None, steps, 12, sublanes, LANES),
                    lambda g: (g, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (None, 2, sublanes, LANES),
                lambda g: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((G, 2, sublanes, LANES), dtype),
            scratch_shapes=[
                pltpu.VMEM((12, sublanes, LANES), dtype),
                pltpu.VMEM((12, sublanes, LANES), dtype),
            ],
            interpret=interpret,
        )(
            x0[fr.POSITION].reshape(12, 1),
            x0[fr.VELOCITY].reshape(12, 1),
            x0[fr.ENERGY].reshape(1, 1),
            traj.target.astype(dtype),
            traj.inv_norm2.reshape(steps, 1).astype(dtype),
            traj.position_cost.reshape(steps, 1).astype(dtype),
            traj.velocity_target.reshape(steps, 1).astype(dtype),
            discounts,
            controls,
        )
        # (G, 2, SUB, LANES) -> (R, 2), inverse of the controls relayout.
        costs = out.transpose(0, 2, 3, 1).reshape(G * tile, 2)
        return costs[:R]

    return fn


def make_pallas_planner(
    mppi_configuration,
    objective_cfg: ObjectiveConfiguration = None,
    robot_cfg: fr.Configuration = None,
    # 16 benched fastest on v5e at 10k x 50 (4: 277, 8: 414, 16: 439,
    # 32: 411 solves/s).
    sublanes: int = 16,
    interpret: Optional[bool] = None,
    filter_fn=None,
    rollout_fn_wrapper=None,
):
    """Planner with the assisted-manipulation objective on the fused Pallas
    rollout kernel (cost channels identical to the lanes / vmap paths).

    ``filter_fn`` forwards to Planner (the QP safety filter,
    safety.make_safety_filter). ``rollout_fn_wrapper`` post-processes the
    rollout evaluator — e.g. parallel.sharding.shard_rollout_fn to place the
    kernel per-device over a mesh (GSPMD cannot partition a pallas_call)."""
    from .. import mppi as mppi_module
    from ..models.model_data import frankaridgeback_model
    from ..objectives.assisted_manipulation import AssistedManipulation

    model = frankaridgeback_model()
    objective_cfg = objective_cfg or ObjectiveConfiguration()
    robot_cfg = robot_cfg or fr.Configuration()
    objective = AssistedManipulation(objective_cfg)
    plant = fr.make_plant(objective, robot_cfg, model)
    rollout_fn = make_pallas_rollout_fn(
        model,
        objective_cfg,
        robot_cfg,
        mppi_configuration.step_count,
        mppi_configuration.time_step,
        mppi_configuration.cost_discount_factor,
        sublanes=sublanes,
        interpret=interpret,
    )
    if rollout_fn_wrapper is not None:
        rollout_fn = rollout_fn_wrapper(rollout_fn)
    return mppi_module.Planner(
        mppi_configuration, plant, rollout_fn=rollout_fn, filter_fn=filter_fn
    )
