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

# Horizon-loop unroll factor inside the kernel (Mosaic schedules across the
# unrolled steps; >1 trades VMEM/compile time for ILP). Benched on v5e at
# 10k x 50 — see PERF.md.
import os as _os

_KERNEL_UNROLL = int(_os.environ.get("PALLAS_UNROLL", "1"))

# Scoped-VMEM budget for the rollout kernels. XLA's default scoped limit is
# 16 MiB; tiles above 16 sublanes (e.g. the zero-padding 20-sublane tile at
# 10k x 50: 4 programs x 2560 rollouts, 6.1 MB double-buffered control
# blocks) need ~17 MB. v5e has far more physical VMEM (128 MB); raising the
# scoped limit per-kernel is safe and benched (PERF.md round-4 tile note).
# Round 5 default 40 MB: lets the FUSED-assembly kernel (3 double-buffered
# horizon streams, ~29.5 MB at 16 sublanes) keep the full 16-sublane tile,
# which measured +5% over the two-pass path (PERF.md round-5 fused note).
_VMEM_LIMIT_BYTES = int(
    float(_os.environ.get("PALLAS_VMEM_MB", "40")) * 1024 * 1024
)


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def _use_vmem_tables(steps: int, grid: int) -> bool:
    """Whether the per-step scalar tables must live in VMEM instead of
    SMEM. XLA allocates an SMEM input window PER GRID STEP (x2 when
    double-buffered), so at S=500 with ~80 programs the (S, .) tables
    alone exceed the 1 MB SMEM budget ("Ran out of memory in memory
    space smem. Used 1.25M of 1.00M"). A VMEM block with a constant
    index map stays resident across grid steps (one copy, ~16-300 KB
    lane-padded); the kernels index the refs identically either way.
    PALLAS_VMEM_TABLES=1/0 forces the choice (tests force 1 to cover the
    long-horizon spec path at interpret-friendly sizes)."""
    forced = _os.environ.get("PALLAS_VMEM_TABLES")
    if forced is not None:
        return forced == "1"
    return 2 * grid * steps * 8 * 4 > 700_000


def _table_spec(shape, vmem: bool):
    """BlockSpec for one per-step scalar table: SMEM (short horizons) or
    a resident whole-array VMEM block (long horizons)."""
    if not vmem:
        return pl.BlockSpec(memory_space=pltpu.SMEM)
    zeros = tuple(0 for _ in shape)
    return pl.BlockSpec(shape, lambda *_g, _z=zeros: _z,
                        memory_space=pltpu.VMEM)


def _standard_table_specs(steps: int, vmem: bool):
    """in_specs for the 8 shared scalar tables (q0, v0, energy stay SMEM —
    constant-size; the five (S, .) per-step tables follow ``vmem``)."""
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return [
        smem,  # q0
        smem,  # v0
        smem,  # energy
        _table_spec((steps, 3), vmem),  # target
        _table_spec((steps, 1), vmem),  # inv_norm2
        _table_spec((steps, 1), vmem),  # position_cost
        _table_spec((steps, 1), vmem),  # velocity_target
        _table_spec((steps, 1), vmem),  # discounts
    ]


def max_sublanes_for_vmem(
    steps: int, horizon_blocks: int, requested: int = 16
) -> int:
    """Largest power-of-two tile height whose horizon-sized VMEM blocks fit
    the scoped budget (SURVEY §7's 50-500 step scan-efficiency hard part:
    the per-program (S, 12, sub, 128) block grows linearly with the
    horizon, so S=500 at 16 sublanes would need ~49 MB — the tile must
    shrink instead of the kernel failing to compile).

    ``horizon_blocks``: how many horizon-sized streams the kernel
    pipelines per grid program (two-pass rollout kernel: 1 control block;
    fused assembly: old + fresh in, noise out = 3; in-kernel RNG: 2).
    Each is double-buffered across grid steps; 10% headroom covers the
    scratch refs, SMEM tables and the states side output."""
    per_sublane = 2 * horizon_blocks * steps * 12 * LANES * 4
    if requested * per_sublane <= _VMEM_LIMIT_BYTES * 0.9:
        return requested  # explicit choices that fit are honored verbatim
    best = 1
    candidate = 2
    while candidate < requested:
        if candidate * per_sublane <= _VMEM_LIMIT_BYTES * 0.9:
            best = candidate
        candidate *= 2
    return best


def _write_lane0_states(states_ref, s, q_ref, v_ref, is_prog0, gated):
    """Stream the zero-noise rollout's pre-step (q, v) out of the batch:
    rollout 0 is lane (0, 0) of grid program 0, so write the first sublane
    of every q/v row into the (S, 24, 1, LANES) states block — the "batch"
    optimal_rollout_mode's observability (VERDICT r4 #4; the host slices
    [..., 0, 0]). A constant index map keeps the block resident across grid
    steps (accumulator pattern). ``gated`` (Mosaic) predicates the whole
    write region on program 0 so programs > 0 pay one scalar branch;
    interpret mode falls back to a branch-free read-modify-write select
    (``pl.when(program_id == 0)`` has no interpret-mode lowering inside
    the horizon loop)."""
    if gated:
        @pl.when(is_prog0)
        def _():
            for i in range(12):
                states_ref[s, i] = q_ref[i][0:1, :]
                states_ref[s, 12 + i] = v_ref[i][0:1, :]
        return
    for i in range(12):
        states_ref[s, i] = jnp.where(
            is_prog0, q_ref[i][0:1, :], states_ref[s, i]
        )
        states_ref[s, 12 + i] = jnp.where(
            is_prog0, v_ref[i][0:1, :], states_ref[s, 12 + i]
        )


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
    controls_ref,  # (S|chunk, 12, SUBLANES, LANES) absolute controls
    out_ref,  # (2, SUBLANES, LANES) cost channels
    *refs,  # [states_ref when emit_states] + 2 scratch
    # VMEM scratch (last 2 refs): rollout state lives on-chip all horizon.
    model: RobotModel,
    objective_cfg: ObjectiveConfiguration,
    kp: np.ndarray,
    kd: np.ndarray,
    steps: int,
    dt: float,
    sublanes: int,
    emit_states: bool = False,
    gated_states: bool = False,
    chunked: bool = False,
):
    """``chunked``: the horizon is split over a SECOND grid dimension
    (grid = (G, C), c fastest) so long horizons keep wide tiles — the
    per-(g, c) control block holds ``steps`` CHUNK steps while the rollout
    state persists in scratch across the c sweep. The (S, .) tables stay
    full-length resident VMEM blocks indexed globally (c * steps + s); the
    cost accumulator block is per-g (revisited across c) and initializes
    on the first chunk via branch-free selects (``pl.when`` has no
    interpret lowering)."""
    if emit_states:
        states_ref, q_ref, v_ref = refs
    else:
        q_ref, v_ref = refs
    shape = (sublanes, LANES)
    dtype = controls_ref.dtype

    # Initialize on-chip state + accumulators (the scratch refs give the
    # loop state a concrete vector layout; plain jnp.full carries are
    # "replicated" splats Mosaic cannot relayout at the loop back-edge).
    if chunked:
        first_chunk = pl.program_id(1) == 0
        for i in range(12):
            q_ref[i] = jnp.where(
                first_chunk, jnp.full(shape, q0_ref[i, 0], dtype=dtype),
                q_ref[i],
            )
            v_ref[i] = jnp.where(
                first_chunk, jnp.full(shape, v0_ref[i, 0], dtype=dtype),
                v_ref[i],
            )
        zero = jnp.zeros(shape, dtype=dtype)
        out_ref[0] = jnp.where(first_chunk, zero, out_ref[0])
        out_ref[1] = jnp.where(first_chunk, zero, out_ref[1])
        step_base = pl.program_id(1) * steps
    else:
        for i in range(12):
            q_ref[i] = jnp.full(shape, q0_ref[i, 0], dtype=dtype)
            v_ref[i] = jnp.full(shape, v0_ref[i, 0], dtype=dtype)
        out_ref[0] = jnp.zeros(shape, dtype=dtype)
        out_ref[1] = jnp.zeros(shape, dtype=dtype)
        step_base = 0
    energy = jnp.full(shape, energy_ref[0, 0], dtype=dtype)
    if emit_states:
        is_prog0 = pl.program_id(0) == 0

    def body(s, _):
        if emit_states:
            _write_lane0_states(states_ref, s, q_ref, v_ref, is_prog0, gated_states)
        sg = step_base + s  # global step for the full-length tables
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
            [target_ref[sg, 0], target_ref[sg, 1], target_ref[sg, 2]],
            inv2_ref[sg, 0],
            pcost_ref[sg, 0],
            vtarget_ref[sg, 0],
            dt,
        )
        disc = disc_ref[sg, 0]
        for i in range(12):
            q_ref[i] = q_next[i]
            v_ref[i] = v_next[i]
        out_ref[0] += disc * step_viol
        out_ref[1] += disc * step_smooth
        return 0

    jax.lax.fori_loop(0, steps, body, 0, unroll=_KERNEL_UNROLL)


def _fused_sample_rollout_kernel(
    # SMEM scalar tables (same for every grid program):
    q0_ref,  # (12, 1)
    v0_ref,  # (12, 1)
    energy_ref,  # (1, 1)
    target_ref,  # (S, 3)
    inv2_ref,  # (S, 1)
    pcost_ref,  # (S, 1)
    vtarget_ref,  # (S, 1)
    disc_ref,  # (S, 1)
    shift_ref,  # (1, 1) int32: horizon shift (mppi.cpp:194)
    doshift_ref,  # (1, 1) int32: 0/1 shift gate
    first_ref,  # (1, 1) int32: 1 iff this shard holds rollouts 0/1
    optimal_ref,  # (S, 12) pre-shift optimal (static rollout 1)
    optshift_ref,  # (S, 12) shifted optimal (u = noise + this)
    # VMEM blocks (per grid program):
    old_ref,  # (S, 12, SUBLANES, LANES) previous noise tile
    fresh_ref,  # (S, 12, SUBLANES, LANES) fresh N(0, cov) draws
    keep_ref,  # (SUBLANES, LANES) elite keep mask (1.0 kept)
    # Outputs:
    noise_ref,  # (S, 12, SUBLANES, LANES) assembled noise tile
    out_ref,  # (2, SUBLANES, LANES) cost channels
    *refs,  # [states_ref (S, 24, 1, LANES) when emit_states] + 2 scratch
    model: RobotModel,
    objective_cfg: ObjectiveConfiguration,
    kp: np.ndarray,
    kd: np.ndarray,
    steps: int,
    dt: float,
    sublanes: int,
    emit_states: bool = False,
    gated_states: bool = False,
):
    """The rollout kernel with the planner's noise assembly fused in.

    Same semantics as ``lane_noise_assemble`` followed by ``_rollout_kernel``
    on ``noise + optimal_shifted`` (mppi.cpp:242-269 elite keep/shift +
    static rollouts, then the mppi.cpp:272-342 hot loop), but the select
    chain runs in-register per horizon step: the assembled 24 MB noise
    tensor is written out exactly once and the controls tensor never exists
    in HBM at all. The extra old/fresh input streams ride the grid
    pipeline's DMA under the kernel's compute, replacing the separate
    HBM-bound assembly pass (~10% of the solve on v5e — PERF.md)."""
    if emit_states:
        states_ref, q_ref, v_ref = refs
    else:
        q_ref, v_ref = refs
    shape = (sublanes, LANES)
    dtype = old_ref.dtype

    for i in range(12):
        q_ref[i] = jnp.full(shape, q0_ref[i, 0], dtype=dtype)
        v_ref[i] = jnp.full(shape, v0_ref[i, 0], dtype=dtype)
    out_ref[0] = jnp.zeros(shape, dtype=dtype)
    out_ref[1] = jnp.zeros(shape, dtype=dtype)
    energy = jnp.full(shape, energy_ref[0, 0], dtype=dtype)

    # Shard-local rollout index of each lane: static rollouts 0 (zero noise)
    # and 1 (negated pre-shift optimal) live in grid program 0 of the FIRST
    # shard only (first_ref gates them when the rollout batch is partitioned
    # into per-device shards — parallel/sharding.py).
    g = pl.program_id(0)
    row = (
        g * (sublanes * LANES)
        + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    )
    first = first_ref[0, 0] != 0
    row0 = (row == 0) & first
    row1 = (row == 1) & first
    keep = keep_ref[...] != jnp.zeros((), dtype=dtype)
    shift = shift_ref[0, 0]
    do_shift = doshift_ref[0, 0] != 0
    zero = jnp.zeros(shape, dtype=dtype)

    def body(s, _):
        if emit_states:
            _write_lane0_states(states_ref, s, q_ref, v_ref, g == 0, gated_states)
        sidx = jnp.minimum(s + shift, steps - 1)
        tail = s >= steps - shift
        old_shifted = old_ref[sidx]  # (12, SUBLANES, LANES)
        old_s = old_ref[s]
        fresh_s = fresh_ref[s]
        u = []
        for d in range(12):
            kept = jnp.where(tail, fresh_s[d], old_shifted[d])
            kept = jnp.where(do_shift, kept, old_s[d])
            sampled = jnp.where(keep, kept, fresh_s[d])
            n = jnp.where(
                row0, zero, jnp.where(row1, -optimal_ref[s, d], sampled)
            )
            noise_ref[s, d] = n
            u.append(n + optshift_ref[s, d])
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

    jax.lax.fori_loop(0, steps, body, 0, unroll=_KERNEL_UNROLL)


def _inkernel_rng_sample_rollout_kernel(
    # SMEM scalar tables (same for every grid program):
    q0_ref,  # (12, 1)
    v0_ref,  # (12, 1)
    energy_ref,  # (1, 1)
    target_ref,  # (S, 3)
    inv2_ref,  # (S, 1)
    pcost_ref,  # (S, 1)
    vtarget_ref,  # (S, 1)
    disc_ref,  # (S, 1)
    shift_ref,  # (1, 1) int32: horizon shift (mppi.cpp:194)
    doshift_ref,  # (1, 1) int32: 0/1 shift gate
    first_ref,  # (1, 1) int32: 1 iff this shard holds rollouts 0/1
    seed_ref,  # (2, 1) int32: per-solve PRNG seed words
    scale_ref,  # (12, 1) noise standard deviation per dof
    optimal_ref,  # (S, 12) pre-shift optimal (static rollout 1)
    optshift_ref,  # (S, 12) shifted optimal (u = noise + this)
    # VMEM blocks (per grid program):
    old_ref,  # (S, 12, SUBLANES, LANES) previous noise tile
    keep_ref,  # (SUBLANES, LANES) elite keep mask (1.0 kept)
    # Outputs:
    noise_ref,  # (S, 12, SUBLANES, LANES) assembled noise tile
    out_ref,  # (2, SUBLANES, LANES) cost channels
    *refs,  # [states_ref (S, 24, 1, LANES) when emit_states] + 2 scratch
    model: RobotModel,
    objective_cfg: ObjectiveConfiguration,
    kp: np.ndarray,
    kd: np.ndarray,
    steps: int,
    dt: float,
    sublanes: int,
    emit_states: bool = False,
    gated_states: bool = False,
):
    """The fused sample+rollout kernel with the fresh N(0, diag) draws
    generated IN KERNEL from the TPU's per-core PRNG (pltpu.prng_seed /
    prng_random_bits) via Box-Muller, instead of streamed from HBM.

    Removes the separate RngBitGenerator pass (~80 us/solve at 10k x 50,
    PERF.md) and the 12 MB fresh-noise HBM stream, at the price of
    ~6 log/sin/cos/sqrt transcendental pairs per (step, tile) inside an
    already VPU-bound kernel. Distribution-level parity only (the
    reference samples serial mt19937, mppi.cpp:250-261; this framework's
    counter-based streams are already a distribution-level match) — the
    bits differ from the host threefry/rbg paths by construction.
    TPU-only: the per-core PRNG has no interpret-mode lowering, so CPU
    tests cover the surrounding assembly via the streamed-fresh kernels
    and the on-TPU distribution check lives in scripts/tpu_crosscheck.py.
    """
    if emit_states:
        states_ref, q_ref, v_ref = refs
    else:
        q_ref, v_ref = refs
    shape = (sublanes, LANES)
    dtype = old_ref.dtype

    for i in range(12):
        q_ref[i] = jnp.full(shape, q0_ref[i, 0], dtype=dtype)
        v_ref[i] = jnp.full(shape, v0_ref[i, 0], dtype=dtype)
    out_ref[0] = jnp.zeros(shape, dtype=dtype)
    out_ref[1] = jnp.zeros(shape, dtype=dtype)
    energy = jnp.full(shape, energy_ref[0, 0], dtype=dtype)

    g = pl.program_id(0)
    row = (
        g * (sublanes * LANES)
        + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    )
    first = first_ref[0, 0] != 0
    row0 = (row == 0) & first
    row1 = (row == 1) & first
    keep = keep_ref[...] != jnp.zeros((), dtype=dtype)
    shift = shift_ref[0, 0]
    do_shift = doshift_ref[0, 0] != 0
    zero = jnp.zeros(shape, dtype=dtype)

    # One PRNG stream per grid program: the per-solve seed words with the
    # program id folded into the first (Mosaic caps prng_seed at 2 words).
    # Sequential prng_random_bits calls advance the stream.
    pltpu.prng_seed(seed_ref[0, 0] + g, seed_ref[1, 0])

    def uniform():
        """(sublanes, LANES) uniforms in (0, 1]: mantissa-fill bitcast."""
        bits = pltpu.prng_random_bits(shape)
        mant = jax.lax.bitwise_or(
            jax.lax.shift_right_logical(
                pltpu.bitcast(bits, jnp.uint32), jnp.uint32(9)
            ),
            jnp.uint32(0x3F800000),
        )
        return 2.0 - jax.lax.bitcast_convert_type(mant, jnp.float32)

    def body(s, _):
        if emit_states:
            _write_lane0_states(states_ref, s, q_ref, v_ref, g == 0, gated_states)
        # Box-Muller pairs: 6 pairs cover the 12 dofs.
        fresh = []
        for _pair in range(6):
            u1 = uniform()
            u2 = uniform()
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            theta = (2.0 * np.pi) * u2
            fresh.append(r * jnp.cos(theta))
            fresh.append(r * jnp.sin(theta))

        sidx = jnp.minimum(s + shift, steps - 1)
        tail = s >= steps - shift
        old_shifted = old_ref[sidx]
        old_s = old_ref[s]
        u = []
        for d in range(12):
            fresh_d = (fresh[d] * scale_ref[d, 0]).astype(dtype)
            kept = jnp.where(tail, fresh_d, old_shifted[d])
            kept = jnp.where(do_shift, kept, old_s[d])
            sampled = jnp.where(keep, kept, fresh_d)
            n = jnp.where(
                row0, zero, jnp.where(row1, -optimal_ref[s, d], sampled)
            )
            noise_ref[s, d] = n
            u.append(n + optshift_ref[s, d])
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

    jax.lax.fori_loop(0, steps, body, 0, unroll=_KERNEL_UNROLL)


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
    native f32 tile; tests use 1 for fast interpreter runs).

    Returns ``((R, 2) costs, (S, 31) rollout-0 pre-step states)`` — the
    zero-noise static rollout's trajectory streamed out of the batch (the
    "batch" optimal_rollout_mode's observability; a (S, 24, 1, 128) side
    output written by grid program 0, ~25 KB)."""
    _, kp, kd = robot_cfg.resolve()
    sublanes = max_sublanes_for_vmem(steps, 1, sublanes)
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
        emit_states=True,
        gated_states=not interpret,
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

        out, states_out = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=_standard_table_specs(
                steps, _use_vmem_tables(steps, G)
            ) + [
                pl.BlockSpec(
                    (None, steps, 12, sublanes, LANES),
                    lambda g: (g, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (None, 2, sublanes, LANES),
                    lambda g: (g, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (steps, 24, 1, LANES),
                    lambda g: (0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((G, 2, sublanes, LANES), dtype),
                jax.ShapeDtypeStruct((steps, 24, 1, LANES), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((12, sublanes, LANES), dtype),
                pltpu.VMEM((12, sublanes, LANES), dtype),
            ],
            interpret=interpret,
            compiler_params=_compiler_params(),
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
        # Rollout 0 = lane (0, 0) of program 0: (S, 24) pre-step q/v plus
        # x0's wrench/energy tail (the rollout plant applies no wrench,
        # raisim_dynamics.cpp:236-238).
        qv0 = states_out[:, :, 0, 0]
        tail = jnp.broadcast_to(x0[24:], (steps, x0.shape[0] - 24))
        states0 = jnp.concatenate([qv0, tail], axis=-1)
        return costs[:R], states0

    return fn


def lane_noise_assemble(
    old,  # (G, S, 12, SUB, LANES) previous noise in lane layout
    fresh,  # same shape: new N(0, cov) draws
    keep_mask,  # (R,) bool over logical rollouts (False for statics/pad)
    shift_by,  # traced int32 scalar
    do_shift,  # traced bool scalar
    optimal,  # (S, 12) previous optimal control (pre-shift)
    first_shard=None,  # traced bool: this shard holds rollouts 0/1 (def yes)
):
    """The planner's noise assembly (mppi.Planner._sample semantics:
    elite keep with left-shifted history + fresh tail, mppi.cpp:242-253;
    zero and negated-optimal static rollouts, mppi.cpp:264-269) applied
    directly in the kernel's lane layout — logical rollout r maps to
    (g, a, b) = (r // (SUB*LANES), (r % (SUB*LANES)) // LANES, r % LANES),
    the same relayout make_pallas_rollout_fn's host-side reshape performs.
    Assembling here means the 24 MB noise tensor never exists in logical
    layout at all: no transpose/pad/copy chain feeding the kernel.

    Pure jnp; exact-equality-tested against the logical-layout assembly in
    tests/test_pallas_rollout.py (same fresh draws injected both ways)."""
    G, S, D, sub, lanes = old.shape
    col = jnp.arange(S)
    shifted_old = jnp.take(old, jnp.minimum(col + shift_by, S - 1), axis=1)
    kept = jnp.where(
        (col < S - shift_by)[None, :, None, None, None], shifted_old, fresh
    )
    kept = jnp.where(do_shift, kept, old)

    pad = G * sub * lanes - keep_mask.shape[0]
    if pad:
        keep_mask = jnp.concatenate(
            [keep_mask, jnp.zeros((pad,), dtype=bool)]
        )
    keep_lanes = keep_mask.reshape(G, 1, 1, sub, lanes)
    sampled = jnp.where(keep_lanes, kept, fresh)

    # Static rollouts 0 (zero noise) and 1 (negated pre-shift optimal) live
    # at (g=0, a=0, b=0) and (g=0, a=0, b=1) — of the FIRST shard only when
    # the rollout batch is partitioned over devices (``first_shard`` gates
    # them; shards > 0 hold no statics).
    row = (
        (jnp.arange(G) * sub * lanes)[:, None, None]
        + (jnp.arange(sub) * lanes)[None, :, None]
        + jnp.arange(lanes)[None, None, :]
    ).reshape(G, 1, 1, sub, lanes)
    if first_shard is None:
        is0, is1 = row == 0, row == 1
    else:
        is0, is1 = (row == 0) & first_shard, (row == 1) & first_shard
    return jnp.where(
        is0,
        jnp.zeros((), old.dtype),
        jnp.where(
            is1,
            -optimal[None, :, :, None, None],
            sampled,
        ),
    )


class PallasSampler:
    """Fused sampling + rollout backend for mppi.Planner: owns the noise
    representation in the Pallas kernel's (G, S, 12, SUB, LANES) lane
    layout, so sampling, elite assembly, the kernel's control stream and
    the weighting contraction all run in one layout with zero relayout
    passes (the host-side transpose/pad/copy chain fed ~10% of the solve
    on v5e — PERF.md).

    Planner protocol (mppi.Planner detects these attributes):
    - init_noise(dtype) -> repr
    - sample_and_rollout(key, keep_mask, shift_by, do_shift, old_repr,
      optimal, optimal_shifted, x0, time, ctx) -> ((R, 2) costs, repr)
    - weighted_noise_sum(repr, (R,) weights) -> (S, dof)

    Diagonal covariance only (the robot default, base.hpp:79-94).

    ``fused_assembly`` moves the noise assembly INTO the rollout kernel
    (_fused_sample_rollout_kernel): old + fresh noise stream in, assembled
    noise streams out, and the controls tensor never touches HBM. The
    kernel pipelines 3 horizon-sized VMEM blocks per grid program instead
    of 1 (~29.5 MB at 16 sublanes), which fits the round-5 default 40 MB
    scoped budget — at the full 16-sublane tile it measured **+5% over
    the two-pass path** in repeated interleaved A/Bs
    (scripts/ab_fused_assembly.py with PALLAS_VMEM_MB>=40; PERF.md
    round-5 note) and is the serving default for single-scenario configs
    (parallel/flagship.build_flagship). Bitwise-equal noise to the
    two-pass assembly (tested). Scenario ensembles must use the two-pass
    sampler — the fused kernel cannot re-score its controls per
    scenario.

    ``shards``/``mesh``: the rollout batch partitions into ``shards``
    contiguous blocks of ``rollout_count // shards`` rollouts, each tiled
    and padded INDEPENDENTLY (per-device tiles) — the TPU analog of the
    reference's per-thread block partition (mppi.cpp:277-302). Fresh noise
    for shard i is drawn from ``fold_in(key, i)``, so the bits depend only
    on (key, shard), never on placement: running the shards as a host loop
    (mesh=None) and running them one-per-device under shard_map (mesh
    given) produce identical noise. With a mesh the per-shard computation
    is placed with shard_map over ``rollout_axis`` (GSPMD cannot partition
    an opaque pallas_call); the weighted-noise contraction psums over the
    mesh axis, and a scenario-ensemble ctx sharded over ``scenario_axis``
    (2-D mesh, BASELINE config 5) psums its risk-neutral scenario mean.
    shards=1, mesh=None is the single-chip serving path, unchanged."""

    def __init__(
        self,
        model: RobotModel,
        objective_cfg: ObjectiveConfiguration,
        robot_cfg: fr.Configuration,
        rollout_count: int,
        steps: int,
        dt: float,
        diag_scale: np.ndarray,  # (dof,) noise standard deviations
        discount: float = 1.0,
        sublanes: int = 16,
        interpret: Optional[bool] = None,
        fused_assembly: bool = False,
        shards: int = 1,
        mesh=None,
        rollout_axis: str = "rollouts",
        scenario_axis: Optional[str] = None,
        inkernel_rng: bool = False,
        emit_states: bool = False,
    ):
        """``emit_states``: stream the zero-noise rollout's per-step (q, v)
        out of the kernel (a ~25 KB side output written by grid program 0 of
        the first shard) so the "batch" optimal_rollout_mode publishes real
        optimal_rollout states (VERDICT r4 #4). sample_and_rollout then
        returns a third element, the (S, 31) states."""
        _, kp, kd = robot_cfg.resolve()
        if inkernel_rng:
            fused_assembly = True  # the RNG lives in the fused kernel
        # (The former hard fused_assembly clamp to 8 sublanes is subsumed
        # by max_sublanes_for_vmem below: at the default 24 MB budget the
        # 3-stream fused kernel still derives 8 at S=50, and raising
        # PALLAS_VMEM_MB unlocks wider tiles for A/Bs.)
        # Long horizons: the per-program horizon block grows linearly with
        # S. The two-pass path CHUNKS the horizon over a second grid
        # dimension instead of narrowing the tile (state persists in
        # scratch across chunks; ~20 us/step at any S), because narrow
        # tiles measured 35-71 us/step (PERF.md horizon table). The fused
        # kernels (which stream 2-3 horizon blocks and own the noise
        # output layout) still narrow the tile.
        horizon_blocks = 3 if fused_assembly else 1
        if inkernel_rng:
            horizon_blocks = 2
        self._chunk_steps = None
        chunk_env = _os.environ.get("PALLAS_CHUNK_STEPS")
        if horizon_blocks == 1:
            if chunk_env is not None and int(chunk_env) > 0:
                self._chunk_steps = int(chunk_env)  # test/tuning override
            else:
                capped = max_sublanes_for_vmem(steps, 1, sublanes)
                if capped < min(sublanes, 8):
                    self._chunk_steps = 64
                else:
                    sublanes = capped
        else:
            sublanes = max_sublanes_for_vmem(steps, horizon_blocks, sublanes)
        if mesh is not None:
            shards = int(mesh.shape[rollout_axis])
        if rollout_count % shards:
            raise ValueError(
                f"rollout count {rollout_count} not divisible into "
                f"{shards} shards"
            )
        if fused_assembly and scenario_axis is not None:
            raise ValueError(
                "fused_assembly computes costs inside the sampling kernel "
                "and cannot re-score a scenario ensemble; use the two-pass "
                "sampler (fused_assembly=False) with scenarios"
            )
        tile = sublanes * LANES
        self.rollouts = rollout_count
        self.steps = steps
        self.dof = 12
        self.shards = shards
        self.local_rollouts = rollout_count // shards
        self.local_grid = -(-self.local_rollouts // tile)
        self.grid = shards * self.local_grid
        self.sublanes = sublanes
        self._mesh = mesh
        self._rollout_axis = rollout_axis
        self._scenario_axis = scenario_axis
        self._diag_scale = np.asarray(diag_scale, np.float64)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if inkernel_rng and interpret:
            raise ValueError(
                "inkernel_rng uses the TPU per-core PRNG (pltpu.prng_seed) "
                "which has no interpret-mode lowering; TPU only"
            )
        self._interpret = interpret
        self._fused_assembly = fused_assembly
        self._inkernel_rng = inkernel_rng
        self._emit_states = emit_states
        statics = dict(
            model=model,
            objective_cfg=objective_cfg,
            kp=kp,
            kd=kd,
            steps=steps,
            dt=dt,
            sublanes=sublanes,
            emit_states=emit_states,
            gated_states=not interpret,
        )
        rollout_statics = dict(statics)
        if self._chunk_steps is not None:
            rollout_statics.update(steps=self._chunk_steps, chunked=True)
        self._kernel = functools.partial(_rollout_kernel, **rollout_statics)
        self._fused_kernel = functools.partial(
            _fused_sample_rollout_kernel, **statics
        )
        self._inkernel_kernel = functools.partial(
            _inkernel_rng_sample_rollout_kernel, **statics
        )
        self._objective_cfg = objective_cfg
        self._discount = discount
        self._dt = dt

    def init_noise(self, dtype):
        return jnp.zeros(
            (self.grid, self.steps, self.dof, self.sublanes, LANES),
            dtype=dtype,
        )

    def _scalar_tables(self, dtype, x0, time, ctx):
        """The SMEM operand tuple shared by both kernel variants."""
        steps = self.steps
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
            traj = trajectory_step_data(
                self._objective_cfg, ctx, time, steps, self._dt
            )
        discounts = (
            self._discount ** jnp.arange(steps, dtype=dtype)
        ).reshape(steps, 1)
        x0 = x0.astype(dtype)
        return (
            x0[fr.POSITION].reshape(12, 1),
            x0[fr.VELOCITY].reshape(12, 1),
            x0[fr.ENERGY].reshape(1, 1),
            traj.target.astype(dtype),
            traj.inv_norm2.reshape(steps, 1).astype(dtype),
            traj.position_cost.reshape(steps, 1).astype(dtype),
            traj.velocity_target.reshape(steps, 1).astype(dtype),
            discounts,
        )

    def _states_out_spec(self):
        """(out_spec, out_shape) for the lane-0 states side output: one
        (S, 24, 1, LANES) block with a constant index map (resident across
        grid steps, written by program 0 only)."""
        return (
            pl.BlockSpec(
                (self.steps, 24, 1, LANES),
                lambda g: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            jax.ShapeDtypeStruct((self.steps, 24, 1, LANES), jnp.float32),
        )

    def _assemble_states(self, states_out, x0):
        """(S, 24, 1, LANES) kernel output -> (S, 31) rollout-0 states."""
        qv0 = states_out[:, :, 0, 0]
        tail = jnp.broadcast_to(
            x0.astype(states_out.dtype)[24:], (self.steps, x0.shape[0] - 24)
        )
        return jnp.concatenate([qv0, tail], axis=-1)

    def _costs_padded(self, controls, x0, time, ctx):
        """Kernel invocation on one shard's (G_local, S, 12, SUB, LANES)
        control tiles -> (G_local * tile, 2) cost channels, pad rows
        included (plus the (S, 24, 1, LANES) lane-0 states output when
        ``emit_states``)."""
        if self._chunk_steps is not None:
            return self._costs_padded_chunked(controls, x0, time, ctx)
        dtype = controls.dtype
        steps = self.steps
        grid = controls.shape[0]
        tables = self._scalar_tables(dtype, x0, time, ctx)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
        cost_spec = pl.BlockSpec(
            (None, 2, self.sublanes, LANES),
            lambda g: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        cost_shape = jax.ShapeDtypeStruct(
            (grid, 2, self.sublanes, LANES), dtype
        )
        if self._emit_states:
            states_spec, states_shape = self._states_out_spec()
            out_specs = [cost_spec, states_spec]
            out_shape = [cost_shape, states_shape]
        else:
            out_specs, out_shape = cost_spec, cost_shape
        out = pl.pallas_call(
            self._kernel,
            grid=(grid,),
            in_specs=_standard_table_specs(
                steps, _use_vmem_tables(steps, grid)
            ) + [
                pl.BlockSpec(
                    (None, steps, 12, self.sublanes, LANES),
                    lambda g: (g, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((12, self.sublanes, LANES), dtype),
                pltpu.VMEM((12, self.sublanes, LANES), dtype),
            ],
            interpret=self._interpret,
            compiler_params=_compiler_params(),
        )(*tables, controls)
        if self._emit_states:
            out, states_out = out
            costs = out.transpose(0, 2, 3, 1).reshape(-1, 2)
            return costs, states_out
        # (G, 2, SUB, LANES) -> (G * tile, 2).
        return out.transpose(0, 2, 3, 1).reshape(-1, 2)

    def _costs_padded_chunked(self, controls, x0, time, ctx):
        """The long-horizon variant: grid = (G, C) with the horizon split
        into ``_chunk_steps``-step chunks streamed along the second grid
        dimension (c fastest), so the tile keeps its full width at any S.
        Rollout state persists in the kernel's VMEM scratch across the c
        sweep; the cost block is per-g and accumulates across chunks; the
        (S, .) tables ride as full-length resident VMEM blocks (global
        step index); the horizon pads to a whole number of chunks with
        zero-discount steps (cost-free; the post-horizon dynamics are
        never read)."""
        dtype = controls.dtype
        steps = self.steps
        chunk = self._chunk_steps
        n_chunks = -(-steps // chunk)
        padded_steps = n_chunks * chunk
        grid = controls.shape[0]
        sub = self.sublanes

        tables = self._scalar_tables(dtype, x0, time, ctx)
        q0, v0, energy, target, inv2, pcost, vtarget, disc = tables
        pad = padded_steps - steps
        if pad:
            target = jnp.pad(target, ((0, pad), (0, 0)))
            inv2 = jnp.pad(inv2, ((0, pad), (0, 0)))
            pcost = jnp.pad(pcost, ((0, pad), (0, 0)))
            vtarget = jnp.pad(vtarget, ((0, pad), (0, 0)))
            disc = jnp.pad(disc, ((0, pad), (0, 0)))  # zero discount
            controls = jnp.pad(
                controls, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0))
            )
        controls = controls.reshape(grid, n_chunks, chunk, 12, sub, LANES)

        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
        in_specs = [
            smem(), smem(), smem(),  # q0, v0, energy
            _table_spec((padded_steps, 3), True),
            _table_spec((padded_steps, 1), True),
            _table_spec((padded_steps, 1), True),
            _table_spec((padded_steps, 1), True),
            _table_spec((padded_steps, 1), True),
            pl.BlockSpec(
                (None, None, chunk, 12, sub, LANES),
                lambda g, c: (g, c, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        cost_spec = pl.BlockSpec(
            (None, 2, sub, LANES),
            lambda g, c: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        cost_shape = jax.ShapeDtypeStruct((grid, 2, sub, LANES), dtype)
        if self._emit_states:
            states_spec = pl.BlockSpec(
                (chunk, 24, 1, LANES),
                lambda g, c: (c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            states_shape = jax.ShapeDtypeStruct(
                (padded_steps, 24, 1, LANES), jnp.float32
            )
            out_specs = [cost_spec, states_spec]
            out_shape = [cost_shape, states_shape]
        else:
            out_specs, out_shape = cost_spec, cost_shape
        out = pl.pallas_call(
            self._kernel,
            grid=(grid, n_chunks),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((12, sub, LANES), dtype),
                pltpu.VMEM((12, sub, LANES), dtype),
            ],
            interpret=self._interpret,
            compiler_params=_compiler_params(),
        )(q0, v0, energy, target, inv2, pcost, vtarget, disc, controls)
        if self._emit_states:
            out, states_out = out
            costs = out.transpose(0, 2, 3, 1).reshape(-1, 2)
            return costs, states_out[: steps]
        return out.transpose(0, 2, 3, 1).reshape(-1, 2)

    def _costs(self, controls, x0, time, ctx):
        out = self._costs_padded(controls, x0, time, ctx)
        if self._emit_states:
            return out[0][: self.rollouts]
        return out[: self.rollouts]

    def _scenario_costs_padded(self, controls, x0, time, ctx, sharded):
        """Cost channels for one shard's controls, averaging over a
        scenario-ensemble ctx (3-D wrench_horizon) when present — the
        risk-neutral scenario mean of forecast/scenarios.py, computed
        in-layout. Under a scenario-sharded mesh the mean psums over
        ``scenario_axis``."""
        if ctx is None or ctx.wrench_horizon.ndim == 2:
            return self._costs_padded(controls, x0, time, ctx)

        def one(horizon):
            return self._costs_padded(
                controls, x0, time, ctx._replace(wrench_horizon=horizon)
            )

        out = jax.lax.map(one, ctx.wrench_horizon)  # (C_local, N, 2)
        states_out = None
        if self._emit_states:
            costs, stacked_states = out
            # Scenario-independent (the forecast only enters the cost).
            states_out = jax.tree.map(lambda a: a[0], stacked_states)
        else:
            costs = out
        if sharded and self._scenario_axis is not None:
            total = costs.shape[0] * self._mesh.shape[self._scenario_axis]
            reduced = (
                jax.lax.psum(jnp.sum(costs, axis=0), self._scenario_axis)
                / total
            )
        else:
            reduced = jnp.mean(costs, axis=0)
        if self._emit_states:
            return reduced, states_out
        return reduced

    def _fused_sample_costs(
        self, old, fresh, keep_mask, shift_by, do_shift, first_shard,
        optimal, optimal_shifted, x0, time, ctx,
    ):
        """One shard through the fused sample+rollout kernel. ``old``/
        ``fresh`` are (G_local, S, 12, SUB, LANES); ``keep_mask`` is the
        shard's (R_local,) slice."""
        if ctx is not None and ctx.wrench_horizon.ndim == 3:
            raise ValueError(
                "fused_assembly cannot score a scenario-ensemble ctx; "
                "use the two-pass sampler (fused_assembly=False)"
            )
        dtype = old.dtype
        steps = self.steps
        sub = self.sublanes
        grid = old.shape[0]
        tables = self._scalar_tables(dtype, x0, time, ctx)
        pad = grid * sub * LANES - keep_mask.shape[0]
        if pad:
            keep_mask = jnp.concatenate(
                [keep_mask, jnp.zeros((pad,), dtype=bool)]
            )
        keep_lanes = keep_mask.reshape(grid, sub, LANES).astype(dtype)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
        out_specs = [
            pl.BlockSpec(
                (None, steps, 12, sub, LANES),
                lambda g: (g, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # assembled noise
            pl.BlockSpec(
                (None, 2, sub, LANES),
                lambda g: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # cost channels
        ]
        out_shape = [
            jax.ShapeDtypeStruct((grid, steps, 12, sub, LANES), dtype),
            jax.ShapeDtypeStruct((grid, 2, sub, LANES), dtype),
        ]
        if self._emit_states:
            states_spec, states_shape = self._states_out_spec()
            out_specs.append(states_spec)
            out_shape.append(states_shape)
        vmem_tables = _use_vmem_tables(steps, grid)
        outs = pl.pallas_call(
            self._fused_kernel,
            grid=(grid,),
            in_specs=_standard_table_specs(steps, vmem_tables) + [
                smem(),  # shift_by
                smem(),  # do_shift
                smem(),  # first_shard
                _table_spec((steps, 12), vmem_tables),  # optimal (pre-shift)
                _table_spec((steps, 12), vmem_tables),  # optimal_shifted
                pl.BlockSpec(
                    (None, steps, 12, sub, LANES),
                    lambda g: (g, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),  # old noise
                pl.BlockSpec(
                    (None, steps, 12, sub, LANES),
                    lambda g: (g, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),  # fresh draws
                pl.BlockSpec(
                    (None, sub, LANES),
                    lambda g: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),  # keep mask
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((12, sub, LANES), dtype),
                pltpu.VMEM((12, sub, LANES), dtype),
            ],
            interpret=self._interpret,
            compiler_params=_compiler_params(),
        )(
            *tables,
            shift_by.astype(jnp.int32).reshape(1, 1),
            do_shift.astype(jnp.int32).reshape(1, 1),
            first_shard.astype(jnp.int32).reshape(1, 1),
            optimal.astype(dtype),
            optimal_shifted.astype(dtype),
            old,
            fresh,
            keep_lanes,
        )
        noise, out = outs[0], outs[1]
        costs = out.transpose(0, 2, 3, 1).reshape(-1, 2)
        if self._emit_states:
            return costs, noise, outs[2]
        return costs, noise

    def _inkernel_sample_costs(
        self, key, old, keep_mask, shift_by, do_shift, first_shard,
        optimal, optimal_shifted, x0, time, ctx,
    ):
        """One shard through the in-kernel-PRNG fused kernel: fresh noise
        is generated on the core (seeded from ``key``), never exists in
        HBM."""
        if ctx is not None and ctx.wrench_horizon.ndim == 3:
            raise ValueError(
                "inkernel_rng cannot score a scenario-ensemble ctx"
            )
        dtype = old.dtype
        steps = self.steps
        sub = self.sublanes
        grid = old.shape[0]
        tables = self._scalar_tables(dtype, x0, time, ctx)
        pad = grid * sub * LANES - keep_mask.shape[0]
        if pad:
            keep_mask = jnp.concatenate(
                [keep_mask, jnp.zeros((pad,), dtype=bool)]
            )
        keep_lanes = keep_mask.reshape(grid, sub, LANES).astype(dtype)
        seed_words = jax.lax.bitcast_convert_type(
            jax.random.bits(key, (2,), jnp.uint32), jnp.int32
        ).reshape(2, 1)
        scale = jnp.asarray(self._diag_scale, dtype=jnp.float32).reshape(
            12, 1
        )
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
        out_specs_ik = [
            pl.BlockSpec(
                (None, steps, 12, sub, LANES),
                lambda g: (g, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # assembled noise
            pl.BlockSpec(
                (None, 2, sub, LANES),
                lambda g: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # cost channels
        ]
        out_shape_ik = [
            jax.ShapeDtypeStruct((grid, steps, 12, sub, LANES), dtype),
            jax.ShapeDtypeStruct((grid, 2, sub, LANES), dtype),
        ]
        if self._emit_states:
            states_spec, states_shape = self._states_out_spec()
            out_specs_ik.append(states_spec)
            out_shape_ik.append(states_shape)
        vmem_tables = _use_vmem_tables(steps, grid)
        outs = pl.pallas_call(
            self._inkernel_kernel,
            grid=(grid,),
            in_specs=_standard_table_specs(steps, vmem_tables) + [
                smem(),  # shift_by
                smem(),  # do_shift
                smem(),  # first_shard
                smem(),  # seed words
                smem(),  # noise scale
                _table_spec((steps, 12), vmem_tables),  # optimal (pre-shift)
                _table_spec((steps, 12), vmem_tables),  # optimal_shifted
                pl.BlockSpec(
                    (None, steps, 12, sub, LANES),
                    lambda g: (g, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),  # old noise
                pl.BlockSpec(
                    (None, sub, LANES),
                    lambda g: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),  # keep mask
            ],
            out_specs=out_specs_ik,
            out_shape=out_shape_ik,
            scratch_shapes=[
                pltpu.VMEM((12, sub, LANES), dtype),
                pltpu.VMEM((12, sub, LANES), dtype),
            ],
            interpret=self._interpret,
            compiler_params=_compiler_params(),
        )(
            *tables,
            shift_by.astype(jnp.int32).reshape(1, 1),
            do_shift.astype(jnp.int32).reshape(1, 1),
            first_shard.astype(jnp.int32).reshape(1, 1),
            seed_words,
            scale,
            optimal.astype(dtype),
            optimal_shifted.astype(dtype),
            old,
            keep_lanes,
        )
        noise, out = outs[0], outs[1]
        costs = out.transpose(0, 2, 3, 1).reshape(-1, 2)
        if self._emit_states:
            return costs, noise, outs[2]
        return costs, noise

    def _shard_sample(
        self, key, keep_local, shift_by, do_shift, old_local, optimal,
        optimal_shifted, x0, time, ctx, shard_index, sharded,
    ):
        """Sample + rollout ONE shard: draws the shard's fresh noise from
        ``fold_in(key, shard)`` (placement-invariant bits), assembles in
        lane layout, scores through the kernel. Returns ((R_local, 2)
        costs, (G_local, S, 12, SUB, LANES) noise) — plus the (S, 31)
        rollout-0 states when ``emit_states`` (meaningful on the first
        shard only; other shards return their own lane-0 trajectory,
        discarded by the caller)."""
        dtype = old_local.dtype
        first = shard_index == 0
        if self._inkernel_rng:
            out = self._inkernel_sample_costs(
                jax.random.fold_in(key, shard_index), old_local, keep_local,
                shift_by, do_shift, first, optimal, optimal_shifted, x0,
                time, ctx,
            )
        else:
            scale = jnp.asarray(self._diag_scale, dtype=dtype)
            fresh = (
                jax.random.normal(
                    jax.random.fold_in(key, shard_index), old_local.shape,
                    dtype,
                )
                * scale[None, None, :, None, None]
            )
            if self._fused_assembly:
                out = self._fused_sample_costs(
                    old_local, fresh, keep_local, shift_by, do_shift, first,
                    optimal, optimal_shifted, x0, time, ctx,
                )
            else:
                noise = lane_noise_assemble(
                    old_local, fresh, keep_local, shift_by, do_shift,
                    optimal.astype(dtype), first_shard=first,
                )
                controls = (
                    noise
                    + optimal_shifted.astype(dtype)[None, :, :, None, None]
                )
                scored = self._scenario_costs_padded(
                    controls, x0, time, ctx, sharded
                )
                if self._emit_states:
                    out = (scored[0], noise, scored[1])
                else:
                    out = (scored, noise)
        if self._emit_states:
            costs, noise, states_out = out
            return (
                costs[: self.local_rollouts],
                noise,
                self._assemble_states(states_out, x0),
            )
        costs, noise = out
        return costs[: self.local_rollouts], noise

    def sample_and_rollout(
        self, key, keep_mask, shift_by, do_shift, old, optimal,
        optimal_shifted, x0, time, ctx,
    ):
        if self._mesh is not None:
            return self._sharded_sample_and_rollout(
                key, keep_mask, shift_by, do_shift, old, optimal,
                optimal_shifted, x0, time, ctx,
            )
        outs = []
        for s in range(self.shards):
            outs.append(
                self._shard_sample(
                    key,
                    keep_mask[
                        s
                        * self.local_rollouts : (s + 1)
                        * self.local_rollouts
                    ],
                    shift_by,
                    do_shift,
                    old[s * self.local_grid : (s + 1) * self.local_grid],
                    optimal,
                    optimal_shifted,
                    x0,
                    time,
                    ctx,
                    jnp.asarray(s, jnp.int32),
                    sharded=False,
                )
            )
        if self.shards == 1:
            return outs[0]
        costs = jnp.concatenate([o[0] for o in outs], axis=0)
        noise = jnp.concatenate([o[1] for o in outs], axis=0)
        if self._emit_states:
            # Rollout 0 lives in shard 0.
            return costs, noise, outs[0][2]
        return costs, noise

    def _sharded_sample_and_rollout(
        self, key, keep_mask, shift_by, do_shift, old, optimal,
        optimal_shifted, x0, time, ctx,
    ):
        """The per-shard sampler placed one-shard-per-device with shard_map
        (GSPMD cannot partition an opaque pallas_call). Identical math to
        the host-loop path: fold_in(key, axis_index) reproduces the same
        per-shard bits, and cost rows come back already sliced to R_local
        so out_specs=P(rollout_axis) concatenates them to (R, 2)."""
        from jax.sharding import PartitionSpec as P

        axis = self._rollout_axis
        impl = jax.random.key_impl(key)
        keydata = jax.random.key_data(key)

        ctx_spec = P()
        if (
            ctx is not None
            and ctx.wrench_horizon.ndim == 3
            and self._scenario_axis is not None
        ):
            from ..objectives.assisted_manipulation import ForecastContext

            ctx_spec = ForecastContext(
                wrench_horizon=P(self._scenario_axis),
                start_time=P(),
                time_step=P(),
                horizon=P(),
            )

        def local(
            keydata, keep_local, shift_by, do_shift, old_local, optimal,
            optimal_shifted, x0, time, ctx,
        ):
            key = jax.random.wrap_key_data(keydata, impl=impl)
            shard = jax.lax.axis_index(axis)
            out = self._shard_sample(
                key, keep_local, shift_by, do_shift, old_local, optimal,
                optimal_shifted, x0, time, ctx, shard, sharded=True,
            )
            if not self._emit_states:
                return out
            costs, noise, states = out
            # Rollout 0 lives on the first rollout shard; broadcast its
            # states to every device (a 6 KB psum over the rollout axis —
            # identical across scenario rows by construction).
            states = jax.lax.psum(
                jnp.where(shard == 0, states, jnp.zeros_like(states)), axis
            )
            return costs, noise, states

        out_specs = (
            (P(axis), P(axis), P())
            if self._emit_states
            else (P(axis), P(axis))
        )
        return jax.shard_map(
            local,
            mesh=self._mesh,
            in_specs=(
                P(), P(axis), P(), P(), P(axis), P(), P(), P(), P(),
                ctx_spec,
            ),
            out_specs=out_specs,
            check_vma=False,
        )(
            keydata, keep_mask, shift_by, do_shift, old, optimal,
            optimal_shifted, x0, time, ctx,
        )

    def _local_weighted_sum(self, noise_local, w_local):
        """(G_local, S, 12, SUB, LANES) x (R_local,) -> (S, 12): pad the
        weights to the shard's tile count and contract in lane layout."""
        pad = (
            noise_local.shape[0] * noise_local.shape[3]
            * noise_local.shape[4]
            - w_local.shape[0]
        )
        if pad:
            w_local = jnp.concatenate(
                [w_local, jnp.zeros((pad,), w_local.dtype)]
            )
        w = w_local.reshape(
            noise_local.shape[0], noise_local.shape[3], noise_local.shape[4]
        )
        return jnp.einsum("gsdab,gab->sd", noise_local, w)

    def weighted_noise_sum(self, noise, weights):
        if self._mesh is not None:
            from jax.sharding import PartitionSpec as P

            axis = self._rollout_axis

            def local(noise_local, w_local):
                return jax.lax.psum(
                    self._local_weighted_sum(noise_local, w_local), axis
                )

            return jax.shard_map(
                local,
                mesh=self._mesh,
                in_specs=(P(axis), P(axis)),
                out_specs=P(),
                check_vma=False,
            )(noise, weights)
        if self.shards == 1:
            return self._local_weighted_sum(noise, weights)
        # Host-loop layout: per-shard padded weights, one full contraction.
        tile = self.sublanes * LANES
        w = jnp.zeros((self.shards, self.local_grid * tile), weights.dtype)
        w = w.at[:, : self.local_rollouts].set(
            weights.reshape(self.shards, self.local_rollouts)
        )
        w = w.reshape(self.grid, self.sublanes, LANES)
        return jnp.einsum("gsdab,gab->sd", noise, w)


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
    fused_sampling: bool = False,
    fused_assembly: bool = False,
    mesh=None,
    rollout_axis: str = "rollouts",
    scenario_axis: Optional[str] = None,
    sampler_shards: int = 1,
    inkernel_rng: bool = False,
):
    """Planner with the assisted-manipulation objective on the fused Pallas
    rollout kernel (cost channels identical to the lanes / vmap paths).

    ``filter_fn`` forwards to Planner (the QP safety filter,
    safety.make_safety_filter). ``rollout_fn_wrapper`` post-processes the
    rollout evaluator — e.g. parallel.sharding.shard_rollout_fn to place the
    kernel per-device over a mesh (GSPMD cannot partition a pallas_call);
    only meaningful on the non-fused path (fused_sampling owns its own
    shard_map placement via ``mesh``).

    ``fused_sampling`` hands noise sampling/assembly to PallasSampler: the
    noise tensor lives in the kernel's lane layout end to end (no relayout
    pass, ~10% of the solve on v5e — PERF.md). Requires a diagonal MPPI
    covariance. With ``mesh`` the sampler partitions the rollout batch into
    one shard per device on ``rollout_axis`` (scenario ensembles over
    ``scenario_axis`` on a 2-D mesh); ``sampler_shards`` forces the same
    per-shard layout WITHOUT a mesh — the single-device twin of an n-way
    sharded run, bit-identical noise (used by dryrun cross-checks).

    ``fused_assembly`` sublanes derive from the scoped VMEM budget
    (max_sublanes_for_vmem with 3 horizon streams): 16 at the default
    40 MB budget and S=50 — the serving default via build_flagship;
    compare A/B configs at equal effective sublanes."""
    from .. import mppi as mppi_module
    from ..models.model_data import frankaridgeback_model
    from ..objectives.assisted_manipulation import AssistedManipulation

    model = frankaridgeback_model()
    objective_cfg = objective_cfg or ObjectiveConfiguration()
    robot_cfg = robot_cfg or fr.Configuration()
    objective = AssistedManipulation(objective_cfg)
    plant = fr.make_plant(objective, robot_cfg, model)
    if fused_sampling:
        if rollout_fn_wrapper is not None:
            raise ValueError(
                "fused_sampling owns the rollout; it cannot compose with a "
                "rollout_fn_wrapper (pass mesh= for sharded placement)"
            )
        covariance = np.asarray(mppi_configuration.covariance, np.float64)
        if covariance.ndim == 1:
            covariance = np.diag(covariance)
        if np.count_nonzero(covariance - np.diag(np.diag(covariance))):
            raise ValueError("fused_sampling requires a diagonal covariance")
        sampler = PallasSampler(
            model,
            objective_cfg,
            robot_cfg,
            mppi_configuration.rollout_count,
            mppi_configuration.step_count,
            mppi_configuration.time_step,
            diag_scale=np.sqrt(np.diag(covariance)),
            discount=mppi_configuration.cost_discount_factor,
            sublanes=sublanes,
            interpret=interpret,
            fused_assembly=fused_assembly,
            shards=sampler_shards,
            mesh=mesh,
            rollout_axis=rollout_axis,
            scenario_axis=scenario_axis,
            inkernel_rng=inkernel_rng,
            # Stream rollout 0's states only when "batch" mode consumes
            # them for optimal_rollout observability; resimulate mode
            # keeps the kernels byte-identical to round 4.
            emit_states=(
                mppi_configuration.optimal_rollout_mode == "batch"
                and filter_fn is None
            ),
        )
        return mppi_module.Planner(
            mppi_configuration, plant, sampler=sampler, filter_fn=filter_fn
        )
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
