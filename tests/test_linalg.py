"""Unrolled static-size Cholesky (ops/linalg.py) vs jnp.linalg oracles."""

import numpy as np
import jax.numpy as jnp

from assistedmanipulation_tpu.ops import linalg


def _spd(rng, n, batch=()):
    W = rng.normal(size=batch + (n, n))
    return W @ np.swapaxes(W, -1, -2) + n * np.eye(n)


def test_cholesky_solve_matches_numpy(rng):
    A = _spd(rng, 12)
    b = rng.normal(size=12)
    got = np.asarray(linalg.cholesky_solve(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(got, np.linalg.solve(A, b), rtol=1e-9)


def test_batched(rng):
    A = _spd(rng, 7, batch=(4,))
    b = rng.normal(size=(4, 7))
    got = np.asarray(linalg.cholesky_solve(jnp.asarray(A), jnp.asarray(b)))
    expected = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_solve_matrix(rng):
    A = _spd(rng, 6)
    B = rng.normal(size=(6, 3))
    L = linalg.cholesky_factor(jnp.asarray(A))
    got = np.asarray(linalg.solve_matrix(L, jnp.asarray(B)))
    np.testing.assert_allclose(got, np.linalg.solve(A, B), rtol=1e-9)
