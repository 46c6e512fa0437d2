"""Unrolled dense linear algebra for small static-size systems.

TPU has no native small-matrix factorization: ``jnp.linalg.cholesky`` /
``cho_solve`` on a (12, 12) system lower to per-call LAPACK-style
custom-calls that cost more in dispatch than the arithmetic (profiled at
~half the MPPI solve when sitting inside the 50-step optimal re-rollout
scan). For a static size known at trace time, a fully unrolled Cholesky is
~n^3/3 fused scalar ops the compiler vectorizes over any leading batch
dims — no custom call, no layout change.

Used by the safety filter and the ADMM QP, where one factor is reused
across many solves. NOT used in the single-trajectory optimal re-rollout
(models/dynamics.forward_dynamics): there the factorization is fresh every
scan step and the unrolled scalar graph benched slower than the custom-call
path (187→142 solves/s) — the custom call amortizes when it's one of many
ops per step, the scalar soup doesn't vectorize without a batch dim. The
same unrolled pattern over explicit lane vectors lives in
kernels/lanes.lane_cholesky_solve for the scalar-graph backends.
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_factor(A: jnp.ndarray):
    """Lower-triangular factor of a PSD matrix with static trailing size
    (..., n, n), unrolled at trace time. Returns L as a nested list of
    (...,)-shaped entries (a trace-time structure, not an array)."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        acc = A[..., j, j]
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        diag = jnp.sqrt(acc)
        inv = 1.0 / diag
        L[j][j] = diag
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    return L


def solve_factored(L, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L L^T x = b for b (..., n) given ``cholesky_factor`` output."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def cholesky_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x = A^{-1} b for PSD A (..., n, n), b (..., n), unrolled."""
    return solve_factored(cholesky_factor(A), b)


def solve_matrix(L, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L L^T X = B for matrix rhs B (..., n, m) column by column."""
    columns = [solve_factored(L, B[..., :, j]) for j in range(B.shape[-1])]
    return jnp.stack(columns, axis=-1)
