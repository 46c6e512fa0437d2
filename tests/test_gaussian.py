"""Multivariate Gaussian sampler (ops/gaussian.py) vs the reference's
factorization semantics (gaussian.hpp:48-75)."""

import numpy as np
import jax
import jax.numpy as jnp

from assistedmanipulation_tpu.ops.gaussian import (
    covariance_transform,
    sample_noise,
)


def test_transform_reproduces_covariance(rng):
    W = rng.normal(size=(5, 5))
    covariance = W @ W.T + 0.1 * np.eye(5)
    T = covariance_transform(covariance)
    np.testing.assert_allclose(T @ T.T, covariance, rtol=1e-10, atol=1e-12)


def test_diagonal_covariance_vector_form():
    """A 1-D covariance is treated as the diagonal (the reference builds
    diag covariances from per-joint variances, base.hpp:78-92)."""
    variances = np.array([0.1, 0.2, 7.5])
    T = covariance_transform(variances)
    np.testing.assert_allclose(T @ T.T, np.diag(variances), atol=1e-12)


def test_negative_eigenvalues_clamped():
    """Indefinite input clamps negative eigenvalues to zero
    (gaussian.hpp:52 cwiseMax(0))."""
    covariance = np.array([[1.0, 2.0], [2.0, 1.0]])  # eigenvalues 3, -1
    T = covariance_transform(covariance)
    got = T @ T.T
    eigenvalues = np.linalg.eigvalsh(got)
    assert (eigenvalues >= -1e-12).all()
    np.testing.assert_allclose(max(eigenvalues), 3.0, rtol=1e-10)


def test_sample_statistics():
    """Empirical covariance of drawn noise matches the configured one."""
    covariance = np.array([[2.0, 0.8], [0.8, 1.0]])
    T = jnp.asarray(covariance_transform(covariance))
    z = sample_noise(jax.random.PRNGKey(0), T, (200_000,), dtype=jnp.float32)
    sample = np.asarray(z, dtype=np.float64)
    np.testing.assert_allclose(sample.mean(axis=0), 0.0, atol=2e-2)
    np.testing.assert_allclose(np.cov(sample.T), covariance, rtol=3e-2)
