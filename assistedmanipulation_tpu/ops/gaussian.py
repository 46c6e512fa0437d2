"""Multivariate Gaussian sampling for MPPI control perturbations.

The reference factorizes the (static, per-config) covariance with a
self-adjoint eigendecomposition and draws noise = mean + (V*sqrt(L)) z with
serial std::mt19937 normals (reference: src/controller/gaussian.hpp:48-75).

TPU-native version: the factorization happens once on the host at trace time
(the covariance is part of the configuration, never traced), and sampling is a
single batched matmul over counter-based threefry normals — every rollout and
step draws independently with no serial RNG state.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def covariance_transform(covariance: np.ndarray) -> np.ndarray:
    """Host-side eigendecomposition of the sampling covariance.

    Returns T such that samples = z @ T.T with z ~ N(0, I) have covariance
    ``covariance``; T = V * sqrt(clamp(L, 0)) as in gaussian.hpp:48-55.
    """
    covariance = np.asarray(covariance, dtype=np.float64)
    if covariance.ndim == 1:
        covariance = np.diag(covariance)
    eigenvalues, eigenvectors = np.linalg.eigh(covariance)
    scale = np.sqrt(np.maximum(eigenvalues, 0.0))
    return eigenvectors * scale[None, :]


def sample_noise(key: jax.Array, transform: jax.Array, shape: tuple, dtype=jnp.float32):
    """Draw correlated Gaussian noise of shape (*shape, dof).

    transform: (dof, dof) from :func:`covariance_transform`.
    """
    dof = transform.shape[0]
    z = jax.random.normal(key, (*shape, dof), dtype=dtype)
    return z @ transform.T.astype(dtype)
