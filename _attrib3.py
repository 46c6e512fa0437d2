"""Ablation attribution: full update with stages knocked out, one jit each."""
import os, time, json
import jax, jax.numpy as jnp

from assistedmanipulation_tpu.cache import enable_compilation_cache
enable_compilation_cache()
from assistedmanipulation_tpu.parallel.flagship import build_flagship
from assistedmanipulation_tpu import mppi as M

rollouts = 10_000 - 2
steps = 50
iters = 60

flagship = build_flagship(rollouts=rollouts, steps=steps, backend="pallas",
                          optimal_rollout_mode="batch")
p = flagship.planner
ctx = flagship.make_ctx()
x0 = flagship.x0
state0 = flagship.init(seed=0)
state0, _ = flagship.update(state0, x0, jnp.asarray(0.005, jnp.float32), ctx)
jax.block_until_ready(state0.optimal_control)
times = [jnp.asarray(0.01 * (i + 1), jnp.float32) for i in range(iters + 2)]


def run_variant(update_impl):
    fn = jax.jit(update_impl)
    s = state0
    s2, _ = fn(s, x0, times[-1], ctx)
    jax.block_until_ready(s2.optimal_control)
    t0 = time.perf_counter()
    for i in range(iters):
        s, _ = fn(s, x0, times[i], ctx)
    jax.block_until_ready(s.optimal_control)
    return (time.perf_counter() - t0) / iters * 1e3


full = run_variant(lambda s, x, t, c: p._update_impl(s, x, t, c))


# variant: skip rollout kernel (costs = cheap hash of noise)
def no_rollout(s, x, t, c):
    noise, optimal_shifted, shift_by, last_shift_time, rng = p._sample(s, t)
    costs = jnp.stack([jnp.zeros((noise.shape[0],), noise.dtype),
                       jnp.sum(noise[:, 0, :], axis=-1) ** 2], axis=-1)
    optimal, weights, gradient, sg_buffer, degenerate = p._optimise(
        costs, noise, optimal_shifted, s.sg_buffer, p._sg_trim_offset(s, t))
    sg_time = jnp.where(degenerate, s.sg_time, t)
    new_state = M.PlannerState(
        optimal_control=optimal, noise=noise, costs=costs,
        last_shift_time=last_shift_time, last_update_time=t,
        sg_buffer=sg_buffer, sg_time=sg_time, rng=rng,
        update_count=s.update_count + 1,
        optimal_cost=M.compose_cost(costs[0]),
        update_duration=s.update_duration)
    return new_state, None


no_roll = run_variant(no_rollout)


def make_patched(patch):
    """Run _update_impl with a method temporarily swapped."""
    def impl(s, x, t, c):
        return p._update_impl(s, x, t, c)
    return impl


# variant: no lexsort (keep_mask = first K)
orig_sample = p._sample


def sample_nosort(s, t, noise_override=None):
    cfg = p.configuration
    stepsN, dof = p.steps, p.plant.control_dof
    R = p.rollout_count
    dt = cfg.time_step
    shift_by = jnp.clip(((t - s.last_shift_time) / dt).astype(jnp.int32), 0, stepsN)
    do_shift = shift_by > 0
    last_shift_time = jnp.where(do_shift, t, s.last_shift_time)
    optimal_shifted = jnp.where(
        do_shift, M._shift_columns(s.optimal_control, shift_by, axis=0),
        s.optimal_control)
    keep_mask = jnp.arange(R - 2) < p.keep_best  # <-- no sort
    rng, key = jax.random.split(s.rng)
    fresh = (jax.random.normal(key, (R - 2, stepsN, dof), p.dtype)
             @ p._transform.T)
    old = s.noise[2:]
    col = jnp.arange(stepsN)
    shifted_old = jnp.take(old, jnp.minimum(col + shift_by, stepsN - 1), axis=1)
    kept = jnp.where((col < stepsN - shift_by)[None, :, None], shifted_old, fresh)
    kept = jnp.where(do_shift, kept, old)
    sampled_noise = jnp.where(keep_mask[:, None, None], kept, fresh)
    noise = jnp.concatenate(
        [jnp.zeros((1, stepsN, dof), p.dtype), -s.optimal_control[None],
         sampled_noise], axis=0)
    return noise, optimal_shifted, shift_by, last_shift_time, rng


p._sample = sample_nosort
no_sort = run_variant(lambda s, x, t, c: p._update_impl(s, x, t, c))
p._sample = orig_sample


# variant: no rng (noise = old noise), still sort
def sample_norng(s, t, noise_override=None):
    noise, optimal_shifted, shift_by, last_shift_time, rng = orig_sample(s, t)
    return s.noise, optimal_shifted, shift_by, last_shift_time, rng


# variant: no rng AND reuse: fresh = slice of old
def sample_cheaprng(s, t, noise_override=None):
    cfg = p.configuration
    stepsN, dof = p.steps, p.plant.control_dof
    R = p.rollout_count
    dt = cfg.time_step
    shift_by = jnp.clip(((t - s.last_shift_time) / dt).astype(jnp.int32), 0, stepsN)
    do_shift = shift_by > 0
    last_shift_time = jnp.where(do_shift, t, s.last_shift_time)
    optimal_shifted = jnp.where(
        do_shift, M._shift_columns(s.optimal_control, shift_by, axis=0),
        s.optimal_control)
    sampled = s.costs[2:]
    V = jnp.where(jnp.isnan(sampled[:, 0]), jnp.inf, sampled[:, 0])
    S = jnp.where(jnp.isnan(sampled[:, 1]), jnp.inf, sampled[:, 1])
    order = jnp.lexsort((S, V))
    rank = jnp.argsort(order, stable=True)
    keep_mask = rank < p.keep_best
    rng, key = jax.random.split(s.rng)
    fresh = s.noise[2:] * 1.0001  # stand-in for rng+transform
    old = s.noise[2:]
    col = jnp.arange(stepsN)
    shifted_old = jnp.take(old, jnp.minimum(col + shift_by, stepsN - 1), axis=1)
    kept = jnp.where((col < stepsN - shift_by)[None, :, None], shifted_old, fresh)
    kept = jnp.where(do_shift, kept, old)
    sampled_noise = jnp.where(keep_mask[:, None, None], kept, fresh)
    noise = jnp.concatenate(
        [jnp.zeros((1, stepsN, dof), p.dtype), -s.optimal_control[None],
         sampled_noise], axis=0)
    return noise, optimal_shifted, shift_by, last_shift_time, rng


p._sample = sample_cheaprng
no_rng = run_variant(lambda s, x, t, c: p._update_impl(s, x, t, c))
p._sample = orig_sample


# variant: no einsum/SG (optimal = shifted)
orig_opt = p._optimise


def opt_cheap(costs, noise, optimal_shifted, sg_buffer, sg_shift):
    degenerate = jnp.asarray(False)
    weights = jnp.ones((costs.shape[0],), costs.dtype)
    gradient = jnp.zeros_like(optimal_shifted) + costs[0, 1] * 1e-9
    return optimal_shifted + gradient, weights, gradient, sg_buffer, degenerate


p._optimise = opt_cheap
no_opt = run_variant(lambda s, x, t, c: p._update_impl(s, x, t, c))
p._optimise = orig_opt

print(json.dumps({
    "full_ms": round(full, 3),
    "no_rollout_ms": round(no_roll, 3),
    "no_sort_ms": round(no_sort, 3),
    "no_rng_ms": round(no_rng, 3),
    "no_optimise_ms": round(no_opt, 3),
    "rollout_share_ms": round(full - no_roll, 3),
    "sort_share_ms": round(full - no_sort, 3),
    "rng_share_ms": round(full - no_rng, 3),
    "optimise_share_ms": round(full - no_opt, 3),
}))
