"""Batched ADMM QP solver (ops/admm_qp.py) against analytic + scipy oracles.

The reference's QP layer was an unimplemented OSQP wrapper (qp.cpp:100-103);
these are the golden tests it never had.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import minimize

from assistedmanipulation_tpu.ops.admm_qp import project_box_affine, solve_qp


def test_box_projection_is_clip(rng):
    """P = I, A = I: the QP is exactly clip(target, l, u)."""
    target = jnp.asarray(rng.normal(size=8) * 3.0)
    l = jnp.asarray(rng.uniform(-1.0, 0.0, size=8))
    u = jnp.asarray(rng.uniform(0.5, 1.5, size=8))
    solution = project_box_affine(target, jnp.eye(8), l, u, iterations=200)
    np.testing.assert_allclose(
        np.asarray(solution.x), np.clip(target, l, u), atol=1e-6
    )


def test_matches_scipy_on_random_qps(rng):
    """General dense QPs vs scipy SLSQP."""
    n, m = 6, 10
    for trial in range(5):
        W = rng.normal(size=(n, n))
        P = W @ W.T + np.eye(n)
        q = rng.normal(size=n)
        A = rng.normal(size=(m, n))
        center = A @ rng.normal(size=n)
        l = center - rng.uniform(0.1, 1.0, size=m)
        u = center + rng.uniform(0.1, 1.0, size=m)

        got = solve_qp(
            jnp.asarray(P),
            jnp.asarray(q),
            jnp.asarray(A),
            jnp.asarray(l),
            jnp.asarray(u),
            iterations=400,
        )

        res = minimize(
            lambda x: 0.5 * x @ P @ x + q @ x,
            np.zeros(n),
            jac=lambda x: P @ x + q,
            constraints=[
                {"type": "ineq", "fun": lambda x: A @ x - l},
                {"type": "ineq", "fun": lambda x: u - A @ x},
            ],
            method="SLSQP",
        )
        assert res.success
        np.testing.assert_allclose(np.asarray(got.x), res.x, atol=2e-3)
        assert float(got.primal_residual) < 1e-3


def test_equality_rows(rng):
    """Rows with l == u are equality constraints: minimize ||x||^2 s.t.
    sum(x) == 1 has the analytic solution x = 1/n."""
    n = 5
    A = jnp.ones((1, n))
    one = jnp.asarray([1.0])
    solution = solve_qp(
        jnp.eye(n), jnp.zeros(n), A, one, one, iterations=300
    )
    np.testing.assert_allclose(np.asarray(solution.x), np.full(n, 0.2), atol=1e-5)


def test_vmap_batching(rng):
    """vmap over a batch of projections matches per-instance solves."""
    B, n = 4, 6
    targets = jnp.asarray(rng.normal(size=(B, n)) * 2.0)
    l = jnp.full((n,), -0.5)
    u = jnp.full((n,), 0.5)
    A = jnp.eye(n)

    batched = jax.vmap(
        lambda t: project_box_affine(t, A, l, u, iterations=150).x
    )(targets)
    for b in range(B):
        single = project_box_affine(targets[b], A, l, u, iterations=150).x
        np.testing.assert_allclose(
            np.asarray(batched[b]), np.asarray(single), atol=1e-6
        )
