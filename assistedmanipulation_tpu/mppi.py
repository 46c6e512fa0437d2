"""Generic MPPI trajectory optimizer as a single jitted program.

Re-designs the reference's sampled-control MPC loop
(src/controller/mppi.cpp:154-479) TPU-first:

- the per-update pipeline (shift -> sample -> rollout -> weight -> smooth ->
  clip -> re-rollout) is one pure function of an explicit ``PlannerState``
  pytree, jitted once and replayed every control tick;
- rollouts are a batched ``lax.scan`` over the horizon ``vmap``-ed over the
  rollout axis (the reference block-partitioned rollouts over a 36-thread
  pool with per-thread dynamics copies, mppi.cpp:272-307; here the rollout
  axis is data-parallel on the VPU/MXU and shards over a device mesh);
- the softmax weighting reductions (min/max/likelihood-sum/weighted noise sum,
  mppi.cpp:346-418) are jnp reductions XLA lowers to on-chip collectives when
  the rollout axis is sharded;
- Gaussian sampling uses counter-based threefry RNG (one key per update)
  instead of the serial mt19937 column draws (mppi.cpp:250-261); parity with
  the reference is at the distribution level;
- NaN cost poisoning, elite reuse, the always-kept zero and negative-optimal
  static rollouts, min/max-normalized softmax weighting, the degenerate-spread
  early-out, Savitzky-Golay smoothing and bound clipping all follow the
  reference semantics exactly (see inline citations).

Dynamics/cost are supplied as pure functions (see ``Plant`` protocol), not
subclasses; there is nothing to copy per thread because nothing mutates.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .config import from_json
from .ops.costs import MAXIMUM_COST_DEFAULT
from .ops.gaussian import covariance_transform
from .ops.sg_filter import SGSmoother, sg_smooth

# Static rollouts: index 0 carries zero noise, index 1 carries the negated
# previous optimal control (mppi.cpp:264-269, mppi.hpp s_static_rollouts).
STATIC_ROLLOUTS = 2

# Composition scale for the two-channel (saturations, smooth) cost
# accumulation — equals the barriers' maximum_cost so the composed scalar
# matches the reference's float64 totals (see ops/costs.py docstring).
BARRIER_SCALE = MAXIMUM_COST_DEFAULT


def as_cost_channels(cost):
    """Normalize a plant cost to the (saturations, smooth) channel pair.

    Scalar costs are pure smooth; a shape-(2,) cost is already channelized
    (robot objectives return barrier saturation counts separately so float32
    accumulation keeps the smooth signal — ops/costs.py docstring)."""
    cost = jnp.asarray(cost)
    if cost.ndim == 0:
        return jnp.stack([jnp.zeros_like(cost), cost])
    return cost


def compose_cost(channels):
    """Composed scalar cost = saturations * BARRIER_SCALE + smooth — the
    float64 value the reference would have accumulated (lossy in f32; used
    for logging/sorting display only, never for weighting)."""
    return channels[..., 0] * BARRIER_SCALE + channels[..., 1]


@dataclasses.dataclass
class Smoothing:
    window: int = 10
    order: int = 1


@dataclasses.dataclass
class Configuration:
    """Mirror of mppi::Configuration (reference mppi.hpp:242-248 and the
    defaults at src/test/case/base.hpp:69-101)."""

    rollouts: int = 50
    keep_best_rollouts: int = 20
    time_step: float = 0.01
    horizon: float = 0.3
    gradient_step: float = 2.0
    cost_scale: float = 10.0
    cost_discount_factor: float = 1.0
    covariance: Optional[np.ndarray] = None
    control_bound: bool = True
    control_min: Optional[np.ndarray] = None
    control_max: Optional[np.ndarray] = None
    control_default: Optional[np.ndarray] = None
    initial_state: Optional[np.ndarray] = None
    smoothing: Optional[Smoothing] = None
    # TPU-specific additions (no reference equivalent):
    dtype: str = "float32"
    # PRNG implementation for the rollout noise. "threefry2x32" (default)
    # is counter-based and bit-identical under any sharding/partitioning —
    # the right tool for cross-placement equality tests. "rbg" lowers to
    # the TPU's hardware RngBitGenerator: ~7x cheaper per update at 10k x
    # 50 x 12 draws (the threefry+transform fusion was 22% of the solve on
    # v5e), same N(0, covariance) distribution — reference parity is at the
    # distribution level anyway (mppi.cpp:250-261 uses serial mt19937).
    rng_impl: str = "threefry2x32"
    # 36-thread block partitioning (mppi.cpp:277) has no TPU analog; the
    # rollout axis shards over the mesh axis named here instead.
    rollout_axis: str = "rollouts"
    # Elite selection strategy. Only the keep_best BOUNDARY is semantically
    # load-bearing (mppi.cpp:219-231 — ordering below it is never
    # observable), so:
    # - "lexsort": full lexicographic sort over (V, S, index) — the round-4
    #   implementation, exact and simple (28 us of a 950 us solve).
    # - "threshold": two-stage counting-threshold select (top_k on V, then
    #   top_k on S within the V-boundary tie set, index tiebreak) — the
    #   SAME keep set bit-for-bit, no total order. A/B'd on chip (PERF.md).
    elite_select: str = "lexsort"
    # How the published optimal trajectory's cost/states are obtained:
    # - "resimulate": re-rollout the post-update optimal sequence
    #   (mppi::Trajectory::filter, mppi.cpp:450-479 — reference parity).
    #   One serial 50-step trajectory: the Amdahl tail of the solve,
    #   measured at ~60% of a 10k-rollout update on TPU v5e.
    # - "batch": read the zero-noise static rollout's cost AND per-step
    #   states from the batch (rollout 0 IS the shifted optimal evaluated at
    #   the current state), skipping the re-rollout entirely. The logged
    #   optimal cost and optimal_rollout states lag one update (they
    #   describe the pre-update shifted optimal, not the just-published
    #   sequence) but are REAL: every backend streams rollout 0's per-step
    #   states out of the batch, so optimal_rollout.csv stays populated
    #   (mppi.cpp:450-479 / logging/mppi.cpp:23-72 observability at serving
    #   speed). Ignored when a safety filter is attached (the filter needs
    #   the re-rollout to write filtered controls back).
    optimal_rollout_mode: str = "resimulate"

    @property
    def step_count(self) -> int:
        return int(math.ceil(self.horizon / self.time_step))

    @property
    def rollout_count(self) -> int:
        return self.rollouts + STATIC_ROLLOUTS


class Plant(NamedTuple):
    """Pure-function dynamics + cost bundle.

    The reference splits this across mppi::Dynamics / mppi::Cost subclasses
    with mutable per-thread copies (mppi.hpp:30-145). Here:

    - ``derive(x, t, ctx) -> aux``: derived quantities of the state (FK,
      Jacobians, mass matrix, end-effector state, ...) — the analog of
      RaisimDynamics::calculate (raisim_dynamics.cpp:150-204). ``aux`` is any
      pytree; it is computed once per step and shared by cost and integrate.
    - ``cost(x, u, aux, t, ctx) -> scalar``: step cost, the analog of
      Cost::get_cost. NaN poisons the rollout (mppi.cpp:331-334).
    - ``integrate(x, u, aux, t, dt, ctx) -> x_next``: step the dynamics, the
      analog of Dynamics::step (raisim_dynamics.cpp:255-264).

    ``ctx`` is an arbitrary per-update pytree passed through
    ``Planner.update`` — the analog of the DynamicsForecast handle the
    reference threads into its rollout dynamics (dynamics.hpp:133-171): the
    cached wrench / end-effector forecast horizon the objective reads.

    All three must be jit-traceable and are vmapped over the rollout axis.
    """

    derive: Callable[..., Any]
    cost: Callable[..., jax.Array]
    integrate: Callable[..., jax.Array]
    state_dof: int
    control_dof: int


class PlannerState(NamedTuple):
    """Everything the controller carries between updates (the reference's
    mutable Trajectory members, mppi.hpp:600-650)."""

    optimal_control: jax.Array  # (steps, dof) published control sequence
    noise: jax.Array  # (R, steps, dof) rollout noise (for elite reuse)
    costs: jax.Array  # (R, 2) rollout cost channels from the last update
    last_shift_time: jax.Array  # scalar: time the horizon was last aligned to
    last_update_time: jax.Array  # scalar: time of the last publish
    sg_buffer: jax.Array  # (dof, L) smoothing history ((0,0) if disabled)
    sg_time: jax.Array  # time sg_buffer was last filled (NaN before first)
    rng: jax.Array  # threefry key
    update_count: jax.Array  # int32
    optimal_cost: jax.Array  # scalar: cost of the optimal rollout (logging)
    update_duration: jax.Array  # seconds, host-measured (logging)


class UpdateInfo(NamedTuple):
    """Per-update observability outputs (consumed by logging; the analog of
    logger::MPPI's costs/weights/gradient CSVs, src/logging/mppi.cpp:23-72)."""

    costs: jax.Array  # (R,)
    weights: jax.Array  # (R,)
    gradient: jax.Array  # (steps, dof)
    optimal_rollout_states: jax.Array  # (steps, state_dof)
    optimal_cost: jax.Array
    degenerate: jax.Array  # True when max-min < 1e-6 (update skipped)


def _shift_columns(array: jax.Array, shift: jax.Array, axis: int = 0) -> jax.Array:
    """Shift ``array`` left along ``axis`` by a traced ``shift``, replicating
    the final entry (mppi.cpp:204-206 semantics)."""
    length = array.shape[axis]
    index = jnp.minimum(jnp.arange(length) + shift, length - 1)
    return jnp.take(array, index, axis=axis)


class Planner:
    """Factory wiring a Plant to the jitted update/get functions.

    Construction validates the configuration like mppi::Trajectory::create
    (mppi.cpp:11-77) but raises instead of returning nullptr.
    """

    def __init__(
        self,
        configuration: Configuration,
        plant: Plant,
        rollout_fn=None,
        filter_fn=None,
        filter_rollout_fn=None,
        sampler=None,
    ):
        """``rollout_fn(noise, optimal_shifted, x0, time, ctx) -> (R, 2)``
        — or ``((R, 2), (steps, state_dof))`` with the zero-noise rollout's
        per-step pre-step states as the second element (all in-tree
        backends do; the states feed optimal_rollout_mode="batch"'s
        observability) — optionally replaces the generic vmap rollout with
        a fused batch evaluator (e.g. the batch-minor lanes path or a
        Pallas kernel, kernels/lane_rollout.py) — semantics must match
        _rollout_batch.

        ``filter_rollout_fn(optimal, x0, time, ctx) -> ((2,) cost channels,
        (steps, state_dof) states)`` optionally replaces the vmap optimal
        re-rollout (the serial Amdahl tail of the solve) with a fused
        evaluator; only used when no ``filter_fn`` is attached.

        ``filter_fn(x, u, t) -> u_safe`` is the per-step trajectory filter
        (mppi::Filter, mppi.hpp:150-176) applied during the optimal
        re-rollout; filtered controls write back into the published sequence
        exactly like the reference's Eigen block mutation (mppi.cpp:460-466).
        See safety.make_safety_filter for the QP-backed implementation.

        ``sampler`` optionally replaces BOTH the noise sampling/assembly and
        the batch rollout with a backend that owns the noise representation
        (e.g. kernels/pallas_rollout.PallasSampler: noise lives in the
        kernel's lane layout, so no relayout pass feeds the kernel). The
        protocol: ``init_noise(dtype)``, ``sample_and_rollout(key,
        keep_mask, shift_by, do_shift, old_noise, optimal, optimal_shifted,
        x0, time, ctx) -> (costs (R, 2), noise_repr[, (steps, state_dof)
        rollout-0 states — consumed by optimal_rollout_mode="batch"])``,
        ``weighted_noise_sum(noise_repr, weights (R,)) -> (steps, dof)``.
        Mutually exclusive with ``rollout_fn`` and with the
        ``noise_override`` parity hook."""
        cfg = configuration
        dof = plant.control_dof
        if cfg.covariance is None:
            raise ValueError("mppi configuration requires a covariance")
        covariance = np.asarray(cfg.covariance, dtype=np.float64)
        if covariance.ndim == 1:
            covariance = np.diag(covariance)
        if covariance.shape != (dof, dof):
            raise ValueError(
                f"covariance shape {covariance.shape} != control dof {dof}"
            )
        if cfg.rollouts < 1:
            raise ValueError("rollouts must be greater than zero")
        if cfg.keep_best_rollouts < 0:
            raise ValueError("keep_best_rollouts cannot be negative")
        if cfg.control_min is None or cfg.control_max is None:
            raise ValueError("control bounds are required")
        if (
            len(np.asarray(cfg.control_min)) != dof
            or len(np.asarray(cfg.control_max)) != dof
        ):
            raise ValueError(f"control bounds must have length {dof}")

        self.configuration = cfg
        self.plant = plant
        self.rollout_fn = rollout_fn
        self.filter_fn = filter_fn
        self.filter_rollout_fn = filter_rollout_fn
        if sampler is not None and rollout_fn is not None:
            raise ValueError("sampler and rollout_fn are mutually exclusive")
        self.sampler = sampler
        self.dtype = jnp.dtype(cfg.dtype)
        self.steps = cfg.step_count
        self.rollout_count = cfg.rollout_count
        self.keep_best = min(cfg.keep_best_rollouts, cfg.rollouts)

        self._transform = jnp.asarray(
            covariance_transform(covariance), dtype=self.dtype
        )
        # Diagonal covariances (the robot default, base.hpp:79-94) need no
        # matmul: scale the standard normals elementwise. Saves the
        # (R*steps, dof) x (dof, dof) dot that XLA otherwise fuses into the
        # sampling hot path.
        if np.count_nonzero(covariance - np.diag(np.diag(covariance))) == 0:
            self._diag_scale = jnp.asarray(
                np.sqrt(np.diag(covariance)), dtype=self.dtype
            )
        else:
            self._diag_scale = None
        self._rng_impl = cfg.rng_impl
        self._control_min = jnp.asarray(cfg.control_min, dtype=self.dtype)
        self._control_max = jnp.asarray(cfg.control_max, dtype=self.dtype)
        self._control_default = (
            jnp.asarray(cfg.control_default, dtype=self.dtype)
            if cfg.control_default is not None
            else None
        )
        self._discount = float(cfg.cost_discount_factor)

        if cfg.smoothing is not None:
            self._smoother = SGSmoother(
                steps=self.steps,
                window=int(cfg.smoothing.window),
                order=int(cfg.smoothing.order),
            )
        else:
            self._smoother = None

        self._update = jax.jit(self._update_impl, donate_argnums=0)
        self._get = jax.jit(self._get_impl)

    # -- state ---------------------------------------------------------------

    def init(self, seed: int = 0) -> PlannerState:
        steps, dof = self.steps, self.plant.control_dof
        smoother = self._smoother
        sg_buffer = (
            smoother.init_buffer(dof, self.dtype)
            if smoother is not None
            else jnp.zeros((0, 0), dtype=self.dtype)
        )
        if self.sampler is not None:
            noise0 = self.sampler.init_noise(self.dtype)
        else:
            noise0 = jnp.zeros(
                (self.rollout_count, steps, dof), dtype=self.dtype
            )
        return PlannerState(
            optimal_control=jnp.zeros((steps, dof), dtype=self.dtype),
            noise=noise0,
            costs=jnp.zeros((self.rollout_count, 2), dtype=self.dtype),
            last_shift_time=jnp.asarray(0.0, dtype=self.dtype),
            last_update_time=jnp.asarray(0.0, dtype=self.dtype),
            sg_buffer=sg_buffer,
            sg_time=jnp.asarray(jnp.nan, dtype=self.dtype),
            # Stored as raw key data (uint32) so the state stays a plain
            # array pytree (checkpoint.py serializes with np.asarray);
            # wrapped back to a typed key at use (_sample).
            rng=jax.random.key_data(
                jax.random.key(seed, impl=self._rng_impl)
            ),
            update_count=jnp.asarray(0, dtype=jnp.int32),
            optimal_cost=jnp.asarray(0.0, dtype=self.dtype),
            update_duration=jnp.asarray(0.0, dtype=self.dtype),
        )

    # -- public API ----------------------------------------------------------

    def update(
        self, state: PlannerState, x, time, ctx=None, noise_override=None
    ) -> tuple[PlannerState, UpdateInfo]:
        """One MPPI update at plant state ``x`` and time ``time``
        (mppi::Trajectory::update, mppi.cpp:154-187). ``ctx`` is forwarded to
        the plant functions (e.g. the forecast horizon cache).

        ``noise_override`` (parity-test hook): a (rollouts, steps, dof) array
        replacing the sampled rollout noise — used by the reference-pipeline
        replayer (parity.py) to feed the engine the exact noise the
        reference's serial mt19937 sampling produced (mppi.cpp:250-261), so
        the BASELINE "control-seq max error" metric is measurable. The two
        static rollouts (zero, negated optimal) are still built from the
        engine's own state."""
        if noise_override is not None:
            noise_override = jnp.asarray(noise_override, dtype=self.dtype)
        return self._update(
            state,
            jnp.asarray(x, dtype=self.dtype),
            jnp.asarray(time, dtype=self.dtype),
            ctx,
            noise_override,
        )

    def get(self, state: PlannerState, time) -> jax.Array:
        """Query the published control at ``time`` by linear interpolation
        (mppi::Trajectory::get, mppi.cpp:481-512)."""
        return self._get(state, jnp.asarray(time, dtype=self.dtype))

    # -- implementation ------------------------------------------------------

    def _sample_meta(self, state: PlannerState, time: jax.Array):
        """The sampling decisions shared by both noise paths: horizon shift,
        elite keep mask, RNG split (mppi.cpp:189-231)."""
        cfg = self.configuration
        steps = self.steps
        R = self.rollout_count
        dt = cfg.time_step

        shift_by = jnp.clip(
            ((time - state.last_shift_time) / dt).astype(jnp.int32), 0, steps
        )
        do_shift = shift_by > 0
        last_shift_time = jnp.where(do_shift, time, state.last_shift_time)

        optimal_shifted = jnp.where(
            do_shift,
            _shift_columns(state.optimal_control, shift_by, axis=0),
            state.optimal_control,
        )

        # Elite ordering of the sampled rollouts by last update's cost
        # (mppi.cpp:219-231): lexicographic over (saturations, smooth) so the
        # ordering matches the reference's float64 composed costs. NaN costs
        # sort last (NaN-as-infinity is the intended comparator behavior).
        # The sort runs over the FULL batch (static rollouts pushed behind
        # every sampled rollout by the index tiebreak key) so the keep mask,
        # the where-selects and the fresh draw below all stay full-width —
        # no (R-2)-row slices + concatenates on the 24 MB noise tensor.
        row = jnp.arange(R)
        is_static = row < STATIC_ROLLOUTS
        V = jnp.where(
            jnp.isnan(state.costs[:, 0]) | is_static, jnp.inf, state.costs[:, 0]
        )
        S = jnp.where(
            jnp.isnan(state.costs[:, 1]) | is_static, jnp.inf, state.costs[:, 1]
        )
        if self.configuration.elite_select == "threshold" and self.keep_best > 0:
            # Counting-threshold select: only the keep_best boundary is
            # needed, not a total order. Stage 1: the K-th smallest V.
            # Stage 2: among V == kthV, the (K - #{V < kthV})-th smallest
            # S. Ties on (V, S) at the boundary break by index (sampled
            # rollouts only), matching the lexsort's stable tiebreak
            # bit-for-bit.
            K = self.keep_best
            kth_v = -jax.lax.top_k(-V, K)[0][-1]
            less_v = V < kth_v
            eq_v = V == kth_v
            s_in_tie = jnp.where(eq_v, S, jnp.inf)
            neg_sorted_s = jax.lax.top_k(-s_in_tie, K)[0]  # ascending in S
            kth_s = -neg_sorted_s[
                jnp.clip(K - jnp.sum(less_v) - 1, 0, K - 1)
            ]
            lex_less = less_v | (eq_v & (S < kth_s))
            boundary = eq_v & (S == kth_s) & ~is_static
            boundary_rank = jnp.cumsum(boundary.astype(jnp.int32)) - 1
            remaining = K - jnp.sum(lex_less)
            keep_mask = (
                lex_less | (boundary & (boundary_rank < remaining))
            ) & ~is_static
        else:
            # Tiebreak: sampled rollouts in index order first, statics
            # last — identical ranks to sorting costs[2:] alone.
            tiebreak = jnp.where(is_static, R + row, row)
            order = jnp.lexsort((tiebreak, S, V))
            rank = jnp.argsort(order, stable=True)  # position of rollout i
            keep_mask = rank < self.keep_best  # (R,); never True for statics

        rng_typed, key = jax.random.split(
            jax.random.wrap_key_data(state.rng, impl=self._rng_impl)
        )
        rng = jax.random.key_data(rng_typed)
        return (
            optimal_shifted, shift_by, do_shift, last_shift_time,
            keep_mask, key, rng,
        )

    def _sample(self, state: PlannerState, time: jax.Array, noise_override=None):
        """Shift + resample rollout noise (mppi.cpp:189-270), logical
        (R, steps, dof) layout."""
        steps, dof = self.steps, self.plant.control_dof
        R = self.rollout_count
        (
            optimal_shifted, shift_by, do_shift, last_shift_time,
            keep_mask, key, rng,
        ) = self._sample_meta(state, time)
        row = jnp.arange(R)

        fresh = jax.random.normal(key, (R, steps, dof), self.dtype)
        if self._diag_scale is not None:
            fresh = fresh * self._diag_scale
        else:
            fresh = fresh @ self._transform.T

        # Kept rollouts: shift noise left, fresh tail (mppi.cpp:242-253).
        col = jnp.arange(steps)
        shifted_old = jnp.take(
            state.noise, jnp.minimum(col + shift_by, steps - 1), axis=1
        )
        kept = jnp.where(
            (col < steps - shift_by)[None, :, None], shifted_old, fresh
        )
        kept = jnp.where(do_shift, kept, state.noise)
        sampled_noise = jnp.where(keep_mask[:, None, None], kept, fresh)
        if noise_override is not None:
            # Parity-test hook (see Planner.update): recorded noise replaces
            # the engine's sampling; elite keep/shift already happened on the
            # recorder's side.
            sampled_noise = jnp.concatenate(
                [sampled_noise[:STATIC_ROLLOUTS], noise_override], axis=0
            )

        # Static rollouts: zero noise, and the negated previous optimal
        # (pre-shift, mppi.cpp:264-269) — selected in place so the whole
        # noise assembly is one fused elementwise pass over the batch.
        noise = jnp.where(
            (row == 0)[:, None, None],
            jnp.zeros((), self.dtype),
            jnp.where(
                (row == 1)[:, None, None],
                -state.optimal_control[None],
                sampled_noise,
            ),
        )
        return noise, optimal_shifted, shift_by, last_shift_time, rng

    def _rollout_batch(self, noise, optimal_shifted, x0, time, ctx):
        """Batched rollouts (mppi.cpp:272-342): a horizon scan over the
        vmapped batch step, accumulating discounted cost with NaN poisoning.

        Returns ``((R, 2) cost channels, (steps, state_dof) rollout-0
        states)``: the zero-noise static rollout's pre-step state is sliced
        out of the batch each step (one tiny gather — it feeds the "batch"
        optimal_rollout_mode's observability for free; XLA drops the output
        when unused). A ``rollout_fn`` backend may return just the costs or
        the same (costs, states) pair."""
        if self.rollout_fn is not None:
            out = self.rollout_fn(noise, optimal_shifted, x0, time, ctx)
            if isinstance(out, tuple):
                return out
            return out, None
        dt = self.configuration.time_step
        plant = self.plant
        discount = self._discount
        R = noise.shape[0]

        derive_b = jax.vmap(lambda x, t: plant.derive(x, t, ctx))
        cost_b = jax.vmap(
            lambda x, u, aux, t: as_cost_channels(
                plant.cost(x, u, aux, t, ctx)
            )
        )
        integrate_b = jax.vmap(
            lambda x, u, aux, t: plant.integrate(x, u, aux, t, dt, ctx)
        )

        def body(carry, inputs):
            x, total = carry  # (R, state_dof), (R, 2)
            u_opt, noise_s, step = inputs  # (dof,), (R, dof), scalar
            t = time + step * dt
            tb = jnp.broadcast_to(t, (R,))
            u = u_opt[None] + noise_s
            aux = derive_b(x, tb)
            step_cost = cost_b(x, u, aux, tb).astype(total.dtype)
            total = total + step_cost * discount**step  # NaN = poisoning
            x0_pre = x[0]  # rollout 0's pre-step state (zero-noise static)
            x = integrate_b(x, u, aux, tb)
            return (x, total), x0_pre

        steps = jnp.arange(self.steps, dtype=self.dtype)
        x_init = jnp.broadcast_to(x0, (R,) + x0.shape)
        (_, total), states0 = jax.lax.scan(
            body,
            (x_init, jnp.zeros((R, 2), dtype=self.dtype)),
            (optimal_shifted, jnp.swapaxes(noise, 0, 1), steps),
        )
        return total, states0

    def _sg_trim_offset(self, state: PlannerState, time: jax.Array):
        """The smoothing window's trim offset, time-based like
        MovingExtendedWindow::trim (filter.cpp:47-60): the number of horizon
        slots whose fill time (sg_time + i*dt) precedes the current update
        time. NOT the same as shift_by — the reference's truncating
        ``(int)((time - last_shift)/dt)`` (mppi.cpp:194) and its time-search
        trim disagree by one slot when float representation bites (e.g. at
        the default rates (0.2-0.15)/0.01 truncates to 4 while the slot-time
        search advances 5); reproduced faithfully so the control sequence
        matches the reference pipeline (see parity.py / scripts/
        parity_replay.py)."""
        dt = self.configuration.time_step
        slot_times = state.sg_time + jnp.arange(self.steps, dtype=self.dtype) * dt
        return jnp.where(
            jnp.isnan(state.sg_time),
            0,
            jnp.sum((slot_times < time).astype(jnp.int32)),
        )

    def _optimise(self, costs, noise, optimal_shifted, sg_buffer, sg_shift):
        """Weight, step, smooth, clip (mppi.cpp:344-448).

        costs: (R, 2) channels (saturations V, smooth S). The min/max
        normalization and softmax run on the lexicographic composition
        (V - Vmin) * BARRIER_SCALE + (S - Sref), which equals the reference's
        float64 (cost - minimum) without float32 cancellation loss."""
        cfg = self.configuration
        V, S = costs[..., 0], costs[..., 1]
        valid = ~(jnp.isnan(V) | jnp.isnan(S))
        big = jnp.asarray(jnp.inf, dtype=S.dtype)

        v_min = jnp.min(jnp.where(valid, V, big))
        s_at_vmin = jnp.min(jnp.where(valid & (V == v_min), S, big))
        v_max = jnp.max(jnp.where(valid, V, -big))
        s_at_vmax = jnp.max(jnp.where(valid & (V == v_max), S, -big))

        difference = (v_max - v_min) * BARRIER_SCALE + (s_at_vmax - s_at_vmin)
        # Degenerate spread: skip the update entirely (mppi.cpp:373-375);
        # also covers the all-NaN case (the reference throws there).
        degenerate = ~(difference >= 1e-6)

        relative = (V - v_min) * BARRIER_SCALE + (S - s_at_vmin)
        likelihood = jnp.where(
            valid,
            jnp.exp(
                -cfg.cost_scale
                * relative
                / jnp.where(difference > 0, difference, 1.0)
            ),
            0.0,
        )
        total = jnp.sum(likelihood)
        weights = likelihood / jnp.where(total > 0, total, 1.0)

        # Weighted noise sum = gradient estimate (mppi.cpp:413-418). This is
        # a (R) x (R, steps*dof) contraction -> MXU matmul. A sampler owns
        # the contraction in its own noise layout.
        if self.sampler is not None:
            gradient = self.sampler.weighted_noise_sum(noise, weights)
        else:
            gradient = jnp.einsum("r,rsd->sd", weights, noise)

        updated = optimal_shifted + cfg.gradient_step * gradient

        if self._smoother is not None:
            smoothed, new_buffer = sg_smooth(
                self._smoother, sg_buffer, updated, sg_shift
            )
            updated = smoothed
            sg_buffer = jnp.where(degenerate, sg_buffer, new_buffer)

        if cfg.control_bound:
            updated = jnp.clip(updated, self._control_min, self._control_max)

        optimal = jnp.where(degenerate, optimal_shifted, updated)
        return optimal, weights, gradient, sg_buffer, degenerate

    def _filter_rollout(self, optimal, x0, time, ctx):
        """Re-rollout the optimal sequence for its cost and states, applying
        the optional per-step safety filter and writing the filtered controls
        back into the published sequence (mppi::Trajectory::filter,
        mppi.cpp:450-479; the Eigen column reference at :462 makes the
        reference's filter mutate m_optimal_control_shifted in place)."""
        if self.filter_rollout_fn is not None and self.filter_fn is None:
            cost, states = self.filter_rollout_fn(optimal, x0, time, ctx)
            return compose_cost(cost), states, optimal
        dt = self.configuration.time_step
        plant = self.plant
        discount = self._discount
        filter_fn = self.filter_fn

        def body(carry, inputs):
            x, total = carry
            u, step = inputs
            t = time + step * dt
            if filter_fn is not None:
                u = filter_fn(x, u, t).astype(u.dtype)
            aux = plant.derive(x, t, ctx)
            step_cost = as_cost_channels(plant.cost(x, u, aux, t, ctx))
            step_cost = step_cost.astype(total.dtype)
            total = total + step_cost * discount**step
            x_next = plant.integrate(x, u, aux, t, dt, ctx)
            return (x_next, total), (x, u)

        steps = jnp.arange(self.steps, dtype=self.dtype)
        (_, cost), (states, filtered) = jax.lax.scan(
            body, (x0, jnp.zeros(2, dtype=self.dtype)), (optimal, steps)
        )
        if filter_fn is not None:
            optimal = filtered
        return compose_cost(cost), states, optimal

    def _update_impl(self, state: PlannerState, x0, time, ctx=None,
                     noise_override=None):
        if self.sampler is not None:
            if noise_override is not None:
                raise ValueError(
                    "noise_override (the parity replay hook) requires the "
                    "logical noise layout; build the Planner without a "
                    "sampler for replays"
                )
            (
                optimal_shifted, shift_by, do_shift, last_shift_time,
                keep_mask, key, rng,
            ) = self._sample_meta(state, time)
            out = self.sampler.sample_and_rollout(
                key, keep_mask, shift_by, do_shift, state.noise,
                state.optimal_control, optimal_shifted, x0, time, ctx,
            )
            costs, noise = out[0], out[1]
            states0 = out[2] if len(out) > 2 else None
        else:
            noise, optimal_shifted, shift_by, last_shift_time, rng = (
                self._sample(state, time, noise_override)
            )
            costs, states0 = self._rollout_batch(
                noise, optimal_shifted, x0, time, ctx
            )
        optimal, weights, gradient, sg_buffer, degenerate = self._optimise(
            costs,
            noise,
            optimal_shifted,
            state.sg_buffer,
            self._sg_trim_offset(state, time),
        )
        sg_time = jnp.where(degenerate, state.sg_time, time)
        if (
            self.configuration.optimal_rollout_mode == "batch"
            and self.filter_fn is None
        ):
            # Zero-noise rollout 0 = the shifted optimal at the current
            # state; its cost AND per-step states come from the batch, one
            # update early (see Configuration.optimal_rollout_mode).
            optimal_cost = compose_cost(costs[0])
            if states0 is not None:
                optimal_states = states0
            else:
                optimal_states = jnp.zeros(
                    (self.steps, self.plant.state_dof), dtype=self.dtype
                )
        else:
            optimal_cost, optimal_states, optimal = self._filter_rollout(
                optimal, x0, time, ctx
            )

        new_state = PlannerState(
            optimal_control=optimal,
            noise=noise,
            costs=costs,
            last_shift_time=last_shift_time,
            last_update_time=time,
            sg_buffer=sg_buffer,
            sg_time=sg_time,
            rng=rng,
            update_count=state.update_count + 1,
            optimal_cost=optimal_cost,
            update_duration=state.update_duration,
        )
        info = UpdateInfo(
            costs=compose_cost(costs),
            weights=weights,
            gradient=gradient,
            optimal_rollout_states=optimal_states,
            optimal_cost=optimal_cost,
            degenerate=degenerate,
        )
        return new_state, info

    def _get_impl(self, state: PlannerState, time):
        cfg = self.configuration
        t = (time - state.last_update_time) / cfg.time_step
        lower = jnp.clip(t.astype(jnp.int32), 0, self.steps - 1)
        upper = jnp.minimum(lower + 1, self.steps - 1)
        frac = jnp.clip(t - lower, 0.0, 1.0)
        interpolated = (
            (1.0 - frac) * state.optimal_control[lower]
            + frac * state.optimal_control[upper]
        )
        past_end = lower + 1 >= self.steps
        if self._control_default is not None:
            fallback = self._control_default
        else:
            fallback = state.optimal_control[-1]
        return jnp.where(past_end, fallback, interpolated)


def configuration_from_json(tree: dict) -> Configuration:
    return from_json(Configuration, tree)
