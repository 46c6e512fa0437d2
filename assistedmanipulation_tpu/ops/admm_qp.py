"""Batched on-device ADMM solver for small dense QPs.

The reference vendored OSQP behind a ``QuadraticProgram`` wrapper whose
``solve()`` was never implemented and which was excluded from the build
(src/controller/qp.hpp:9-142, qp.cpp:100-103, CMakeLists.txt:41,111). This
module is the TPU-native replacement: the OSQP ADMM iteration specialized to
small dense problems, fully jit/vmap-compatible, so thousands of QPs solve in
one fused device program (per-step safety-filter projections, batched over
the horizon and over rollouts).

Problem form (same as OSQP):

    minimize    1/2 x^T P x + q^T x
    subject to  l <= A x <= u

Algorithm (OSQP, Stellato et al. 2020, fixed step):

    K = P + sigma I + rho A^T A              (factorized once per problem)
    x~ = K^{-1} (sigma x - q + A^T (rho z - y))
    z~ = A x~
    x+ = alpha x~ + (1 - alpha) x
    zh = alpha z~ + (1 - alpha) z
    z+ = clip(zh + y / rho, l, u)
    y+ = y + rho (zh - z+)

Fixed iteration count (static for jit) instead of residual-based stopping —
every lane runs the same program; the returned residuals let callers check
convergence. Equality constraints are rows with l == u.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .linalg import cholesky_factor, solve_factored


class QPSolution(NamedTuple):
    x: jax.Array  # (n,) primal solution
    z: jax.Array  # (m,) constraint values (projected)
    y: jax.Array  # (m,) dual solution
    primal_residual: jax.Array  # scalar: max |A x - z|
    dual_residual: jax.Array  # scalar: max |P x + q + A^T y|


def solve_qp(
    P: jax.Array,
    q: jax.Array,
    A: jax.Array,
    l: jax.Array,
    u: jax.Array,
    iterations: int = 50,
    rho: float = 1.0,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    x0: jax.Array | None = None,
    adaptive_blocks: int = 4,
) -> QPSolution:
    """Solve one dense QP. ``P``: (n, n) PSD, ``q``: (n,), ``A``: (m, n),
    ``l``/``u``: (m,). vmap over leading axes for batches.

    Runs ``adaptive_blocks`` blocks of ``iterations`` ADMM steps; between
    blocks rho is rescaled by the OSQP residual-balancing rule
    rho *= sqrt(r_primal_rel / r_dual_rel) (Stellato et al. 2020, §5.2) and
    K is refactorized — a fixed rho stalls by orders of magnitude when the
    projection target sits far outside the feasible set."""
    n = q.shape[-1]
    dtype = q.dtype

    # Row equilibration (diagonal Ruiz scaling of the constraints): without
    # it a uniform rho stalls on rows whose norms differ by orders of
    # magnitude (e.g. the safety filter's gripper coupling rows vs velocity
    # rows). Same feasible set; only the duals are rescaled.
    row_norm = jnp.max(jnp.abs(A), axis=-1)
    scale = 1.0 / jnp.maximum(row_norm, 1e-8)
    A = A * scale[:, None]
    l = l * scale
    u = u * scale

    sigma_eye = sigma * jnp.eye(n, dtype=dtype)

    x = jnp.zeros(n, dtype=dtype) if x0 is None else x0
    z = jnp.clip(A @ x, l, u)
    y = jnp.zeros_like(z)
    rho_k = jnp.asarray(rho, dtype=dtype)

    def run_block(carry, _):
        x, z, y, rho = carry
        K = P + sigma_eye + rho * (A.T @ A)
        chol = cholesky_factor(K)

        def body(_, carry):
            x, z, y = carry
            rhs = sigma * x - q + A.T @ (rho * z - y)
            x_tilde = solve_factored(chol, rhs)
            z_tilde = A @ x_tilde
            x_next = alpha * x_tilde + (1.0 - alpha) * x
            z_hat = alpha * z_tilde + (1.0 - alpha) * z
            z_next = jnp.clip(z_hat + y / rho, l, u)
            y_next = y + rho * (z_hat - z_next)
            return x_next, z_next, y_next

        x, z, y = jax.lax.fori_loop(0, iterations, body, (x, z, y))

        # Residual-balanced rho update on relative residuals (OSQP eq. 28).
        r_prim = jnp.max(jnp.abs(A @ x - z))
        r_dual = jnp.max(jnp.abs(P @ x + q + A.T @ y))
        prim_ref = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(A @ x)), jnp.max(jnp.abs(z))), 1e-12
        )
        dual_ref = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(P @ x)), jnp.max(jnp.abs(q))), 1e-12
        )
        ratio = jnp.sqrt(
            (r_prim / prim_ref) / jnp.maximum(r_dual / dual_ref, 1e-12)
        )
        rho = jnp.clip(rho * jnp.clip(ratio, 1e-3, 1e3), 1e-6, 1e6)
        return (x, z, y, rho), None

    (x, z, y, rho_k), _ = jax.lax.scan(
        run_block, (x, z, y, rho_k), None, length=max(1, int(adaptive_blocks))
    )

    primal = jnp.max(jnp.abs(A @ x - z)) if A.shape[0] else jnp.zeros((), dtype)
    dual = jnp.max(jnp.abs(P @ x + q + A.T @ y))
    # Report z / y in the caller's (unscaled) constraint coordinates.
    return QPSolution(
        x=x,
        z=z / scale,
        y=y * scale,
        primal_residual=primal,
        dual_residual=dual,
    )


def project_box_affine(
    u_target: jax.Array,
    A: jax.Array,
    l: jax.Array,
    u: jax.Array,
    weights: jax.Array | None = None,
    iterations: int = 50,
    rho: float = 1.0,
    adaptive_blocks: int = 4,
) -> QPSolution:
    """Least-change projection: min ||W^(1/2) (x - u_target)||^2 s.t.
    l <= A x <= u — the safety-filter QP (P = W diagonal, q = -W u_target)."""
    n = u_target.shape[-1]
    dtype = u_target.dtype
    w = jnp.ones(n, dtype=dtype) if weights is None else weights
    P = jnp.diag(w)
    q = -w * u_target
    return solve_qp(
        P,
        q,
        A,
        l,
        u,
        iterations=iterations,
        rho=rho,
        x0=u_target,
        adaptive_blocks=adaptive_blocks,
    )
