"""Pallas fused rollout kernel vs the pure-XLA lanes backend.

Runs the kernel in interpreter mode on CPU (sublanes=1 keeps the tile small)
and checks the cost channels match the lanes path bit-for-bit-ish — both are
the same scalar graph, so agreement should be tight f32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from assistedmanipulation_tpu.kernels.lane_rollout import (
    make_lanes_rollout_fn,
)
from assistedmanipulation_tpu.kernels.pallas_rollout import (
    make_pallas_rollout_fn,
)
from assistedmanipulation_tpu.models import frankaridgeback as fr
from assistedmanipulation_tpu.models.model_data import frankaridgeback_model
from assistedmanipulation_tpu.objectives.assisted_manipulation import (
    Configuration as ObjectiveConfiguration,
    ForecastContext,
)

STEPS = 4
DT = 0.01


def _make_fns():
    model = frankaridgeback_model()
    objective_cfg = ObjectiveConfiguration()
    robot_cfg = fr.Configuration()
    lanes = make_lanes_rollout_fn(model, objective_cfg, robot_cfg, STEPS, DT)
    pallas = make_pallas_rollout_fn(
        model,
        objective_cfg,
        robot_cfg,
        STEPS,
        DT,
        sublanes=1,
        interpret=True,
    )
    return lanes, pallas


def _make_ctx():
    wrench = jnp.zeros((STEPS + 1, 6), dtype=jnp.float32).at[:, 0].set(25.0)
    return ForecastContext(
        wrench_horizon=wrench,
        start_time=jnp.asarray(0.0, dtype=jnp.float32),
        time_step=DT,
        horizon=STEPS * DT,
    )


@pytest.mark.parametrize("with_ctx", [True, False])
def test_pallas_matches_lanes(rng, with_ctx):
    lanes_fn, pallas_fn = _make_fns()
    R = 7  # deliberately not a multiple of the tile: exercises padding
    noise = jnp.asarray(
        rng.normal(scale=0.3, size=(R, STEPS, 12)), dtype=jnp.float32
    )
    optimal = jnp.asarray(
        rng.normal(scale=0.1, size=(STEPS, 12)), dtype=jnp.float32
    )
    x0 = jnp.asarray(fr.make_state("huddled"), dtype=jnp.float32)
    time = jnp.asarray(0.0, dtype=jnp.float32)
    ctx = _make_ctx() if with_ctx else None

    expected, expected_states = lanes_fn(noise, optimal, x0, time, ctx)
    got, got_states = pallas_fn(noise, optimal, x0, time, ctx)
    expected, got = np.asarray(expected), np.asarray(got)

    assert got.shape == (R, 2)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)
    # Rollout-0 states streamed out of the kernel match the lanes path
    # (both are the zero-noise static rollout's pre-step trajectory).
    assert np.asarray(got_states).shape == (STEPS, 31)
    np.testing.assert_allclose(
        np.asarray(got_states), np.asarray(expected_states),
        rtol=2e-5, atol=2e-5,
    )


def test_pallas_planner_update_runs(rng):
    """End-to-end planner update on the Pallas backend (interpreted)."""
    from assistedmanipulation_tpu import mppi
    from assistedmanipulation_tpu.kernels.pallas_rollout import (
        make_pallas_planner,
    )

    configuration = mppi.Configuration(
        rollouts=6,
        keep_best_rollouts=2,
        time_step=DT,
        horizon=STEPS * DT,
        covariance=fr.DEFAULT_COVARIANCE,
        control_min=fr.DEFAULT_CONTROL_MIN,
        control_max=fr.DEFAULT_CONTROL_MAX,
        control_default=np.zeros(12),
        smoothing=mppi.Smoothing(window=10, order=1),
        dtype="float32",
    )
    planner = make_pallas_planner(configuration, sublanes=1, interpret=True)
    state = planner.init(seed=0)
    x0 = jnp.asarray(fr.make_state("huddled"), dtype=jnp.float32)
    state, info = planner.update(state, x0, 0.0, _make_ctx())
    assert np.isfinite(np.asarray(state.optimal_control)).all()
    assert np.isfinite(np.asarray(info.weights)).all()


# --- fused lane-layout sampling (PallasSampler) ------------------------------


def _lane_to_logical(noise_lane, rollouts):
    """(G, S, 12, sub, LANES) -> (R, S, 12): rollout r = (g*sub + a)*128 + b,
    the exact relayout make_pallas_rollout_fn performs on its input."""
    G, S, D, sub, lanes = noise_lane.shape
    return (
        np.asarray(noise_lane)
        .transpose(0, 3, 4, 1, 2)
        .reshape(G * sub * lanes, S, D)[:rollouts]
    )


def test_lane_noise_assemble_matches_logical_assembly(rng):
    """The sampler's one piece of unique logic — the elite/static/fresh
    noise assembly in lane layout — must equal the planner's logical-layout
    assembly (mppi.Planner._sample semantics) given the SAME fresh draws."""
    from assistedmanipulation_tpu.kernels.pallas_rollout import (
        lane_noise_assemble,
    )

    G, S, D, sub, lanes = 2, 5, 12, 1, 128
    R = 200  # < G*sub*lanes: exercises the pad rows
    old_lane = jnp.asarray(
        rng.standard_normal((G, S, D, sub, lanes)), jnp.float32
    )
    fresh_lane = jnp.asarray(
        rng.standard_normal((G, S, D, sub, lanes)), jnp.float32
    )
    keep = jnp.asarray(rng.random(R) < 0.4)
    keep = keep.at[0].set(False).at[1].set(False)  # statics never kept
    optimal = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)

    for shift, do_shift in ((2, True), (0, False)):
        got = lane_noise_assemble(
            old_lane,
            fresh_lane,
            keep,
            jnp.asarray(shift, jnp.int32),
            jnp.asarray(do_shift),
            optimal,
        )
        got_logical = _lane_to_logical(got, R)

        # Reference: the same assembly in logical layout.
        old = _lane_to_logical(old_lane, R)
        fresh = _lane_to_logical(fresh_lane, R)
        col = np.arange(S)
        shifted_old = old[:, np.minimum(col + shift, S - 1)]
        kept = np.where(
            (col < S - shift)[None, :, None], shifted_old, fresh
        )
        kept = kept if do_shift else old
        sampled = np.where(np.asarray(keep)[:, None, None], kept, fresh)
        expected = sampled.copy()
        expected[0] = 0.0
        expected[1] = -np.asarray(optimal)
        np.testing.assert_array_equal(got_logical, expected)

        # first_shard=False (a non-first shard of a partitioned batch):
        # identical assembly but NO static rollouts written.
        got_tail = lane_noise_assemble(
            old_lane,
            fresh_lane,
            keep,
            jnp.asarray(shift, jnp.int32),
            jnp.asarray(do_shift),
            optimal,
            first_shard=jnp.asarray(False),
        )
        np.testing.assert_array_equal(
            _lane_to_logical(got_tail, R), sampled
        )


def test_multi_shard_sampler_statics_and_layout(rng):
    """A shards=2 sampler (the single-device twin of a 2-device mesh
    placement): statics land at GLOBAL rollouts 0/1 only, each shard pads
    independently, and per-shard fold_in keying gives shard-distinct
    noise."""
    from assistedmanipulation_tpu.kernels.pallas_rollout import PallasSampler

    model = frankaridgeback_model()
    R = 12  # 6 per shard, padded to 128 each
    sampler = PallasSampler(
        model,
        ObjectiveConfiguration(),
        fr.Configuration(),
        rollout_count=R,
        steps=STEPS,
        dt=DT,
        diag_scale=np.sqrt(np.asarray(fr.DEFAULT_COVARIANCE)),
        sublanes=1,
        interpret=True,
        shards=2,
    )
    assert sampler.local_rollouts == 6
    assert sampler.grid == 2 and sampler.local_grid == 1
    old = sampler.init_noise(jnp.float32)
    optimal = jnp.asarray(0.1 * rng.standard_normal((STEPS, 12)), jnp.float32)
    x0 = jnp.asarray(fr.make_state("huddled"), jnp.float32)
    keep = jnp.zeros((R,), bool)
    costs, noise = sampler.sample_and_rollout(
        jax.random.key(3),
        keep,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        old,
        optimal,
        optimal,
        x0,
        jnp.asarray(0.0, jnp.float32),
        _make_ctx(),
    )
    assert costs.shape == (R, 2)
    assert noise.shape == (2, STEPS, 12, 1, 128)
    logical0 = _lane_to_logical(noise[:1], 128)  # shard 0 incl. pad rows
    logical1 = _lane_to_logical(noise[1:], 128)  # shard 1
    # Statics only in shard 0.
    np.testing.assert_array_equal(logical0[0], 0.0)
    np.testing.assert_array_equal(logical0[1], -np.asarray(optimal))
    # Shard 1's rows 0/1 are plain draws, not statics (gripper dofs have
    # zero covariance, so compare against the static patterns, not zero).
    assert np.abs(logical1[0]).max() > 0.0
    assert not np.array_equal(logical1[1], -np.asarray(optimal))
    # fold_in(key, shard) keying: the two shards draw different noise.
    assert not np.array_equal(logical0[2:6], logical1[:4])


def test_pallas_sampler_costs_match_rollout_fn(rng):
    """Same controls through the sampler's kernel invocation and through
    make_pallas_rollout_fn must give identical cost channels (it is the
    same kernel; only the input layout differs)."""
    from assistedmanipulation_tpu.kernels.pallas_rollout import PallasSampler

    model = frankaridgeback_model()
    objective_cfg = ObjectiveConfiguration()
    robot_cfg = fr.Configuration()
    R = 7
    sampler = PallasSampler(
        model,
        objective_cfg,
        robot_cfg,
        rollout_count=R,
        steps=STEPS,
        dt=DT,
        diag_scale=np.sqrt(np.asarray(fr.DEFAULT_COVARIANCE)),
        sublanes=1,
        interpret=True,
    )
    _, rollout_fn = _make_fns()
    ctx = _make_ctx()
    x0 = jnp.asarray(fr.make_state("huddled"), jnp.float32)
    t = jnp.asarray(0.0, jnp.float32)
    optimal_shifted = jnp.asarray(
        0.1 * rng.standard_normal((STEPS, 12)), jnp.float32
    )

    noise_lane = jnp.asarray(
        rng.standard_normal(
            (sampler.grid, STEPS, 12, sampler.sublanes, 128)
        ),
        jnp.float32,
    )
    controls_lane = noise_lane + optimal_shifted[None, :, :, None, None]
    got = sampler._costs(controls_lane, x0, t, ctx)

    noise_logical = jnp.asarray(_lane_to_logical(noise_lane, R))
    expected, _ = rollout_fn(noise_logical, optimal_shifted, x0, t, ctx)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=1e-6, atol=1e-6
    )


def test_fused_sampling_planner_integration():
    """A fused-sampling flagship planner (interpret mode) runs two updates:
    finite bounded optimal control, non-degenerate weighting, and the
    lane-layout noise state threads through elite reuse."""
    from assistedmanipulation_tpu.parallel.flagship import build_flagship

    flagship = build_flagship(
        rollouts=126,
        steps=3,
        backend="pallas",
        sublanes=1,
        interpret=True,
        rng_impl="threefry2x32",  # rbg is TPU-shaped; tests run on CPU
    )
    planner = flagship.planner
    assert planner.sampler is not None
    state = flagship.init(seed=0)
    assert state.noise.ndim == 5  # lane layout
    ctx = flagship.make_ctx()
    state, info = flagship.update(state, flagship.x0, 0.0, ctx)
    state, info = flagship.update(state, flagship.x0, 0.01, ctx)
    optimal = np.asarray(state.optimal_control)
    assert np.isfinite(optimal).all()
    assert (optimal >= np.asarray(fr.DEFAULT_CONTROL_MIN) - 1e-6).all()
    assert (optimal <= np.asarray(fr.DEFAULT_CONTROL_MAX) + 1e-6).all()
    assert not bool(info.degenerate)
    assert np.isfinite(np.asarray(info.costs)).all()


def test_fused_sampling_rejects_noise_override():
    from assistedmanipulation_tpu.parallel.flagship import build_flagship

    flagship = build_flagship(
        rollouts=126, steps=3, backend="pallas", sublanes=1, interpret=True,
        rng_impl="threefry2x32",
    )
    state = flagship.init(seed=0)
    with pytest.raises(ValueError, match="noise_override"):
        flagship.planner.update(
            state, flagship.x0, 0.0, None,
            noise_override=np.zeros((124, 3, 12), np.float32),
        )


@pytest.mark.parametrize("shift,do_shift", [(2, True), (0, False)])
def test_fused_assembly_matches_two_pass_sampler(rng, shift, do_shift):
    """The fused sample+rollout kernel (_fused_sample_rollout_kernel) must
    equal the two-pass path (lane_noise_assemble + _costs) BITWISE: both
    run the same elementwise select chain and the same rollout graph, only
    the memory plan differs (the assembly runs in-register and the controls
    tensor never exists)."""
    from assistedmanipulation_tpu.kernels.pallas_rollout import PallasSampler

    model = frankaridgeback_model()
    objective_cfg = ObjectiveConfiguration()
    robot_cfg = fr.Configuration()
    R = 200
    kw = dict(
        rollout_count=R,
        steps=STEPS,
        dt=DT,
        diag_scale=np.sqrt(np.asarray(fr.DEFAULT_COVARIANCE)),
        sublanes=1,
        interpret=True,
    )
    fused = PallasSampler(
        model, objective_cfg, robot_cfg, fused_assembly=True, **kw
    )
    twopass = PallasSampler(
        model, objective_cfg, robot_cfg, fused_assembly=False, **kw
    )
    assert fused.grid == twopass.grid

    old = jnp.asarray(
        0.3 * rng.standard_normal((fused.grid, STEPS, 12, 1, 128)),
        jnp.float32,
    )
    keep = jnp.asarray(rng.random(R) < 0.4)
    keep = keep.at[0].set(False).at[1].set(False)
    optimal = jnp.asarray(
        0.1 * rng.standard_normal((STEPS, 12)), jnp.float32
    )
    optimal_shifted = jnp.asarray(
        0.1 * rng.standard_normal((STEPS, 12)), jnp.float32
    )
    x0 = jnp.asarray(fr.make_state("huddled"), jnp.float32)
    t = jnp.asarray(0.0, jnp.float32)
    key = jax.random.key(7)
    args = (
        key,
        keep,
        jnp.asarray(shift, jnp.int32),
        jnp.asarray(do_shift),
        old,
        optimal,
        optimal_shifted,
        x0,
        t,
    )
    for ctx in (None, _make_ctx()):
        costs_f, noise_f = fused.sample_and_rollout(*args, ctx)
        costs_t, noise_t = twopass.sample_and_rollout(*args, ctx)
        np.testing.assert_array_equal(
            np.asarray(noise_f), np.asarray(noise_t)
        )
        np.testing.assert_array_equal(
            np.asarray(costs_f), np.asarray(costs_t)
        )


@pytest.mark.parametrize("fused_assembly,shards", [
    (True, 1), (False, 1), (False, 2),
])
def test_sampler_emit_states_matches_lanes(rng, fused_assembly, shards):
    """``emit_states=True`` streams the zero-noise rollout's per-step
    states out of the kernel (the "batch" optimal_rollout_mode's
    observability). They must equal the lanes rollout_fn's rollout-0
    states on the SAME assembled noise — including under shards=2, where
    rollout 0 lives in shard 0 only."""
    from assistedmanipulation_tpu.kernels.lane_rollout import (
        make_lanes_rollout_fn,
    )
    from assistedmanipulation_tpu.kernels.pallas_rollout import PallasSampler

    model = frankaridgeback_model()
    objective_cfg = ObjectiveConfiguration()
    robot_cfg = fr.Configuration()
    R = 256
    sampler = PallasSampler(
        model,
        objective_cfg,
        robot_cfg,
        rollout_count=R,
        steps=STEPS,
        dt=DT,
        diag_scale=np.sqrt(np.asarray(fr.DEFAULT_COVARIANCE)),
        sublanes=1,
        interpret=True,
        fused_assembly=fused_assembly,
        shards=shards,
        emit_states=True,
    )
    old = sampler.init_noise(jnp.float32)
    keep = jnp.zeros((R,), bool)
    optimal = jnp.asarray(0.1 * rng.standard_normal((STEPS, 12)), jnp.float32)
    optimal_shifted = jnp.asarray(
        0.1 * rng.standard_normal((STEPS, 12)), jnp.float32
    )
    x0 = jnp.asarray(fr.make_state("huddled"), jnp.float32)
    t = jnp.asarray(0.0, jnp.float32)
    ctx = _make_ctx()
    costs, noise, states = sampler.sample_and_rollout(
        jax.random.key(11), keep, jnp.asarray(0, jnp.int32),
        jnp.asarray(False), old, optimal, optimal_shifted, x0, t, ctx,
    )
    assert costs.shape == (R, 2) and states.shape == (STEPS, 31)

    lanes_fn = make_lanes_rollout_fn(
        model, objective_cfg, robot_cfg, STEPS, DT
    )
    noise_logical = jnp.asarray(
        np.concatenate(
            [
                _lane_to_logical(
                    noise[s * sampler.local_grid : (s + 1) * sampler.local_grid],
                    sampler.local_rollouts,
                )
                for s in range(shards)
            ]
        )
    )
    lanes_costs, lanes_states = lanes_fn(
        noise_logical, optimal_shifted, x0, t, ctx
    )
    np.testing.assert_allclose(
        np.asarray(states), np.asarray(lanes_states), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(costs), np.asarray(lanes_costs), rtol=2e-5, atol=2e-5
    )


def test_vmem_tables_match_smem_tables(rng, monkeypatch):
    """The long-horizon VMEM table placement (one resident block instead
    of per-grid-step SMEM windows — the S=500 'Ran out of memory in
    memory space smem' fix) is value-identical to the SMEM path: same
    refs, different BlockSpecs."""
    lanes_fn, pallas_fn = _make_fns()
    R = 300  # > 2 tiles at sublanes=1: exercises grid-step revisiting
    noise = jnp.asarray(
        rng.normal(scale=0.3, size=(R, STEPS, 12)), dtype=jnp.float32
    )
    optimal = jnp.asarray(
        rng.normal(scale=0.1, size=(STEPS, 12)), dtype=jnp.float32
    )
    x0 = jnp.asarray(fr.make_state("huddled"), dtype=jnp.float32)
    t = jnp.asarray(0.0, jnp.float32)
    ctx = _make_ctx()

    monkeypatch.setenv("PALLAS_VMEM_TABLES", "0")
    smem_costs, smem_states = pallas_fn(noise, optimal, x0, t, ctx)
    monkeypatch.setenv("PALLAS_VMEM_TABLES", "1")
    vmem_costs, vmem_states = pallas_fn(noise, optimal, x0, t, ctx)
    np.testing.assert_array_equal(
        np.asarray(smem_costs), np.asarray(vmem_costs)
    )
    np.testing.assert_array_equal(
        np.asarray(smem_states), np.asarray(vmem_states)
    )


def test_chunked_horizon_matches_unchunked(rng, monkeypatch):
    """Horizon chunking (grid = (G, C), rollout state persisting in
    scratch across the chunk sweep — the long-horizon wide-tile path)
    must be value-identical to the single-chunk kernel: same per-step
    arithmetic, same accumulation order, the chunk boundary is purely a
    memory plan. Exercised with a chunk that does NOT divide the horizon
    (zero-discount padding) and with emit_states on."""
    from assistedmanipulation_tpu.kernels.pallas_rollout import PallasSampler

    model = frankaridgeback_model()
    kw = dict(
        rollout_count=300,  # > 2 tiles at sublanes=1
        steps=STEPS,  # 4 steps; chunk=3 -> 2 chunks with 2 padded steps
        dt=DT,
        diag_scale=np.sqrt(np.asarray(fr.DEFAULT_COVARIANCE)),
        sublanes=1,
        interpret=True,
        emit_states=True,
    )
    plain = PallasSampler(
        model, ObjectiveConfiguration(), fr.Configuration(), **kw
    )
    monkeypatch.setenv("PALLAS_CHUNK_STEPS", "3")
    chunked = PallasSampler(
        model, ObjectiveConfiguration(), fr.Configuration(), **kw
    )
    assert chunked._chunk_steps == 3 and plain._chunk_steps is None

    controls = jnp.asarray(
        0.2 * rng.standard_normal((plain.grid, STEPS, 12, 1, 128)),
        jnp.float32,
    )
    x0 = jnp.asarray(fr.make_state("huddled"), jnp.float32)
    t = jnp.asarray(0.0, jnp.float32)
    ctx = _make_ctx()
    costs_a, states_a = plain._costs_padded(controls, x0, t, ctx)
    costs_b, states_b = chunked._costs_padded(controls, x0, t, ctx)
    np.testing.assert_array_equal(np.asarray(costs_a), np.asarray(costs_b))
    np.testing.assert_array_equal(
        np.asarray(states_a[:, :, 0, 0]), np.asarray(states_b[:, :, 0, 0])
    )


def test_vmem_sublane_derivation_long_horizons():
    """SURVEY §7 / VERDICT r4 #6: the tile height must shrink with the
    horizon so the per-program (S, 12, sub, 128) VMEM blocks keep fitting
    the 24 MB scoped budget — S=500 at 16 sublanes would need ~49 MB and
    fail to compile. S=50 behavior is unchanged (16 two-pass / 8 fused)."""
    from assistedmanipulation_tpu.kernels.pallas_rollout import (
        PallasSampler,
        max_sublanes_for_vmem,
    )

    # Expectations at the round-5 default 40 MB scoped budget.
    assert max_sublanes_for_vmem(50, 1) == 16
    assert max_sublanes_for_vmem(50, 3, 16) == 16  # fused serving default
    assert max_sublanes_for_vmem(50, 3, 8) == 8
    assert max_sublanes_for_vmem(100, 1) == 16
    assert max_sublanes_for_vmem(200, 1) == 8
    assert max_sublanes_for_vmem(500, 1) == 4
    assert max_sublanes_for_vmem(500, 3, 8) == 2

    # The two-pass sampler CHUNKS the horizon rather than narrowing the
    # tile when the cap would drop below 8 sublanes (narrow tiles
    # measured 35-71 us/step — PERF.md): sublanes stay at the request
    # and the kernel runs 64-step chunks over a second grid dimension.
    sampler = PallasSampler(
        frankaridgeback_model(),
        ObjectiveConfiguration(),
        fr.Configuration(),
        rollout_count=2048,
        steps=500,
        dt=0.01,
        diag_scale=np.sqrt(np.asarray(fr.DEFAULT_COVARIANCE)),
        sublanes=16,
        interpret=True,
    )
    assert sampler.sublanes == 16
    assert sampler._chunk_steps == 64
    # The fused-assembly sampler (3 horizon streams, noise layout owned
    # by the kernel) still narrows the tile.
    fused = PallasSampler(
        frankaridgeback_model(),
        ObjectiveConfiguration(),
        fr.Configuration(),
        rollout_count=512,
        steps=500,
        dt=0.01,
        diag_scale=np.sqrt(np.asarray(fr.DEFAULT_COVARIANCE)),
        sublanes=8,
        interpret=True,
        fused_assembly=True,
    )
    assert fused.sublanes == 2 and fused._chunk_steps is None


def test_inkernel_rng_is_tpu_only():
    """The in-kernel PRNG sampler (Box-Muller on pltpu.prng_random_bits)
    has no interpret-mode lowering; constructing it for CPU must fail
    loudly rather than crash at trace time. The on-hardware distribution
    gate lives in scripts/tpu_crosscheck.py (PERF.md round-4 section)."""
    from assistedmanipulation_tpu.kernels.pallas_rollout import PallasSampler

    with pytest.raises(ValueError, match="interpret"):
        PallasSampler(
            frankaridgeback_model(),
            ObjectiveConfiguration(),
            fr.Configuration(),
            rollout_count=8,
            steps=2,
            dt=0.01,
            diag_scale=np.sqrt(np.asarray(fr.DEFAULT_COVARIANCE)),
            sublanes=1,
            interpret=True,
            inkernel_rng=True,
        )
