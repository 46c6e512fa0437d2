"""Quantify the host-float-time penalty in the bench loop + optimise breakdown."""
import os, time, json
import jax, jax.numpy as jnp

from assistedmanipulation_tpu.cache import enable_compilation_cache
enable_compilation_cache()
from assistedmanipulation_tpu.parallel.flagship import build_flagship

rollouts = 10_000 - 2
steps = 50
iters = 50

flagship = build_flagship(rollouts=rollouts, steps=steps, backend="pallas",
                          optimal_rollout_mode="batch")
p = flagship.planner
ctx = flagship.make_ctx()
x0 = flagship.x0

# A: bench.py style — python float t each iteration, donated state
state = flagship.init(seed=0)
state, _ = flagship.update(state, x0, 0.0, ctx)
jax.block_until_ready(state.optimal_control)
t0 = time.perf_counter(); t = 0.0
for _ in range(iters):
    t += 0.01
    state, _ = flagship.update(state, x0, t, ctx)
jax.block_until_ready(state.optimal_control)
host_float = (time.perf_counter() - t0) / iters * 1e3

# B: device-resident times, still through planner.update (donated)
state = flagship.init(seed=0)
times = [jnp.asarray(0.01 * (i + 1), jnp.float32) for i in range(iters + 1)]
state, _ = flagship.update(state, x0, times[-1], ctx)
jax.block_until_ready(state.optimal_control)
t0 = time.perf_counter()
for i in range(iters):
    state, _ = flagship.update(state, x0, times[i], ctx)
jax.block_until_ready(state.optimal_control)
dev_time = (time.perf_counter() - t0) / iters * 1e3

# C: optimise sub-parts
state2 = flagship.init(seed=1)
state2, _ = flagship.update(state2, x0, times[0], ctx)
noise, optimal_shifted, *_ = jax.jit(lambda s, t: p._sample(s, t))(state2, times[1])
costs = jax.jit(lambda n, o, x, t: p._rollout_batch(n, o, x, t, ctx))(
    noise, optimal_shifted, x0, times[1])
jax.block_until_ready(costs)


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    return (time.perf_counter() - t0) / iters * 1e3


einsum_ms = timeit(jax.jit(
    lambda w, n: jnp.einsum("r,rsd->sd", w, n)),
    jnp.ones((rollouts + 2,), jnp.float32) / rollouts, noise)

red_ms = timeit(jax.jit(lambda c: (
    jnp.min(jnp.where(jnp.isnan(c[:, 0]), jnp.inf, c[:, 0])),
    jnp.max(jnp.where(jnp.isnan(c[:, 1]), -jnp.inf, c[:, 1])))), costs)

# RNG comparisons
key_tf = jax.random.PRNGKey(3)
rng_tf = timeit(jax.jit(lambda k: jax.random.normal(
    k, (rollouts, steps, 12), jnp.float32)), key_tf)
key_rbg = jax.random.key(3, impl="rbg")
rng_rbg = timeit(jax.jit(lambda k: jax.random.normal(
    k, (rollouts, steps, 12), jnp.float32)), key_rbg)

# diagonal transform vs matmul
tr = p._transform
mat_ms = timeit(jax.jit(lambda n: n @ tr.T),
                jnp.ones((rollouts, steps, 12), jnp.float32))
diag = jnp.diagonal(tr)
el_ms = timeit(jax.jit(lambda n: n * diag),
               jnp.ones((rollouts, steps, 12), jnp.float32))
import numpy as np
is_diag = bool(np.allclose(np.asarray(tr), np.diag(np.diagonal(np.asarray(tr)))))

print(json.dumps({
    "bench_style_hostfloat_ms": round(host_float, 3),
    "device_time_ms": round(dev_time, 3),
    "einsum_ms": round(einsum_ms, 3),
    "reductions_ms": round(red_ms, 3),
    "rng_threefry_ms": round(rng_tf, 3),
    "rng_rbg_ms": round(rng_rbg, 3),
    "transform_matmul_ms": round(mat_ms, 3),
    "transform_diag_ms": round(el_ms, 3),
    "transform_is_diagonal": is_diag,
}))
