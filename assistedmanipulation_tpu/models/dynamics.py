"""Batched rigid-body dynamics: CRBA mass matrix + RNEA, common-origin
spatial algebra, fixed topology unrolled at trace time.

Replaces the reference's per-thread RaiSim worlds (raisim_dynamics.cpp) and
the Pinocchio ABA path (pinocchio_dynamics.cpp:153-260) with vectorized jnp:

- The mass matrix comes from the composite-rigid-body identity expressed at a
  single common origin (the world origin): with per-joint motion subspaces
  S_i = [a; o x a] (revolute) / [0; a] (prismatic) and per-body 6x6 spatial
  inertias I_k about the origin, M = sum_k S~_k I_k S~_k^T where S~_k masks
  columns by ancestry. No frame transforms, just batched small matmuls.
- Nonlinear effects h(q, v) (gravity + Coriolis) come from an RNEA pass in
  the same coordinates. The reference's actuation feeds getNonlinearities
  back as feedforward (raisim_dynamics.cpp:220-224), so h cancels exactly in
  the rollout dynamics and is only needed for joint-power logging
  (raisim_dynamics.cpp:176-179) — it stays out of the MPPI hot path.
- Forward dynamics uses RaiSim-style *implicitly damped* PD: solving
  (M + dt*Kd) qdd = kp (q* - q) + kd (v* - v) + tau_ff + J^T f keeps the
  stiff base (kd=1000) and gripper (kp=100, kd=50 on 0.1 kg fingers) gains
  stable at dt = 0.005-0.01 s, matching RaiSim's stable PD integrator.

Spatial vector convention: [angular; linear] measured at the world origin.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from .kinematics import FK, com_positions, f32_matmuls
from .model_data import PRISMATIC, RobotModel


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix (..., 3, 3) of vectors (..., 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        axis=-2,
    )


def motion_subspaces(model: RobotModel, fk: FK) -> jnp.ndarray:
    """Per-joint spatial motion subspace S (..., J, 6) at the world origin."""
    dtype = fk.origin.dtype
    is_prismatic = jnp.asarray(model.joint_type == PRISMATIC, dtype=dtype)[:, None]
    angular = fk.axis_world * (1.0 - is_prismatic)
    linear = (
        jnp.cross(fk.origin, fk.axis_world) * (1.0 - is_prismatic)
        + fk.axis_world * is_prismatic
    )
    return jnp.concatenate([angular, linear], axis=-1)


@f32_matmuls
def spatial_inertias(model: RobotModel, fk: FK) -> jnp.ndarray:
    """Per-body 6x6 spatial inertia about the world origin (..., J, 6, 6)."""
    dtype = fk.origin.dtype
    mass = jnp.asarray(model.mass, dtype=dtype)  # (J,)
    inertia_local = jnp.asarray(model.inertia, dtype=dtype)  # (J, 3, 3)

    com_world = com_positions(model, fk)  # (..., J, 3)
    R = fk.rotation
    I_com = R @ inertia_local @ jnp.swapaxes(R, -1, -2)
    cx = _skew(com_world)
    m = mass[:, None, None]
    eye = jnp.eye(3, dtype=dtype)
    upper_left = I_com + m * (cx @ jnp.swapaxes(cx, -1, -2))
    upper_right = m * cx
    lower_left = m * jnp.swapaxes(cx, -1, -2)
    lower_right = jnp.broadcast_to(m * eye, upper_left.shape)
    top = jnp.concatenate([upper_left, upper_right], axis=-1)
    bottom = jnp.concatenate([lower_left, lower_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


@f32_matmuls
def mass_matrix(model: RobotModel, fk: FK) -> jnp.ndarray:
    """Joint-space mass matrix M(q) (..., J, J) via common-origin CRBA."""
    S = motion_subspaces(model, fk)  # (..., J, 6)
    I = spatial_inertias(model, fk)  # (..., J, 6, 6)
    mask = jnp.asarray(model.ancestor, dtype=S.dtype)  # (J joints, J bodies)
    # S~[k, i, :] = ancestor[i, k] * S[i] : masked subspaces per body k.
    S_masked = mask.T[..., :, :, None] * S[..., None, :, :]  # (..., K, J, 6)
    # M = sum_k S~_k I_k S~_k^T
    IS = jnp.einsum("...kab,...kjb->...kja", I, S_masked)
    return jnp.einsum("...kia,...kja->...ij", S_masked, IS)


def _crm(v: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross-product matrix (..., 6, 6) for v = [w; p]."""
    w, p = v[..., :3], v[..., 3:]
    wx, px = _skew(w), _skew(p)
    zero = jnp.zeros_like(wx)
    top = jnp.concatenate([wx, zero], axis=-1)
    bottom = jnp.concatenate([px, wx], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


@f32_matmuls
def rnea(
    model: RobotModel,
    fk: FK,
    qd: jnp.ndarray,
    qdd: jnp.ndarray,
    gravity,
) -> jnp.ndarray:
    """Inverse dynamics tau = M qdd + C(q, qd) qd + g(q) (..., J).

    Common-origin recursive Newton-Euler; the gravity vector is the
    acceleration applied to free bodies (the reference configures
    (0, 0, 9.81), simulator.hpp DEFAULT_CONFIGURATION — sign kept
    configurable since the feedforward cancellation makes it moot in the
    rollout path)."""
    dtype = fk.origin.dtype
    S = motion_subspaces(model, fk)  # (..., J, 6)
    I = spatial_inertias(model, fk)  # (..., J, 6, 6)
    gravity = jnp.asarray(gravity, dtype=dtype)
    batch = fk.origin.shape[:-2]

    a_base = jnp.broadcast_to(
        jnp.concatenate([jnp.zeros(3, dtype=dtype), -gravity]), batch + (6,)
    )

    velocities = []
    accelerations = []
    forces = []
    for i in range(model.n_joints):
        parent = int(model.parent[i])
        v_parent = (
            velocities[parent]
            if parent >= 0
            else jnp.zeros(batch + (6,), dtype=dtype)
        )
        a_parent = accelerations[parent] if parent >= 0 else a_base
        Si = S[..., i, :]
        vi = v_parent + Si * qd[..., i, None]
        ai = (
            a_parent
            + Si * qdd[..., i, None]
            + (_crm(vi) @ Si[..., None])[..., 0] * qd[..., i, None]
        )
        Ii = I[..., i, :, :]
        momentum = (Ii @ vi[..., None])[..., 0]
        fi = (Ii @ ai[..., None])[..., 0] + (
            -_crm(vi).swapaxes(-1, -2) @ momentum[..., None]
        )[..., 0]
        velocities.append(vi)
        accelerations.append(ai)
        forces.append(fi)

    force_stack = jnp.stack(forces, axis=-2)  # (..., J, 6)
    mask = jnp.asarray(model.ancestor, dtype=dtype)  # (J, K)
    subtree_force = jnp.einsum("ik,...ka->...ia", mask, force_stack)
    return jnp.einsum("...ia,...ia->...i", S, subtree_force)


@f32_matmuls
def nonlinear_effects(model: RobotModel, fk: FK, qd: jnp.ndarray, gravity):
    """h(q, qd) = C qd + g — raisim getNonlinearities
    (raisim_dynamics.cpp:220)."""
    return rnea(model, fk, qd, jnp.zeros_like(qd), gravity)


@f32_matmuls
def kinetic_energy(model: RobotModel, fk: FK, qd: jnp.ndarray) -> jnp.ndarray:
    """1/2 qd^T M qd (validation helper)."""
    M = mass_matrix(model, fk)
    return 0.5 * jnp.einsum("...i,...ij,...j->...", qd, M, qd)


# Velocity regularization of the Coulomb joint friction model. RaiSim
# enforces URDF <dynamics friction> as a dry-friction constraint (exact
# stiction); the TPU plant uses the standard implicit regularization
# tau_f = -c(v) v_next with c(v) = f / (|v| + eps), which reaches the
# kinetic value f sign(v) within 1% for |v| >= 0.1 and limits stiction
# creep to |v| <= eps F / (f - F) under constant applied force F < f.
# Entering the implicit (M + dt C) solve keeps the near-rest stiffness
# c ~ f/eps unconditionally stable.
FRICTION_EPS = 1e-3


def friction_coefficients(model: RobotModel, v: jnp.ndarray) -> jnp.ndarray:
    """Implicit Coulomb friction damping c(v) = f/(|v|+eps) (..., J).

    Models the URDF joint friction (robot.urdf:41-75: 10 on the base
    x/y/pivot joints) that RaiSim's solver applies and the reference plant
    therefore exhibits (raisim_dynamics.cpp world built from the same URDF).
    Returns zeros when the model declares no friction."""
    f = jnp.asarray(model.friction, dtype=v.dtype)
    damping = jnp.asarray(model.damping, dtype=v.dtype)
    return f / (jnp.abs(v) + FRICTION_EPS) + damping


@f32_matmuls
def forward_dynamics(
    M: jnp.ndarray,
    tau: jnp.ndarray,
    kd: jnp.ndarray,
    dt: float,
) -> jnp.ndarray:
    """qdd = (M + dt*diag(kd))^{-1} tau — implicitly damped forward dynamics
    (RaiSim-style stable PD; see module docstring)."""
    A = M + dt * jnp.eye(M.shape[-1], dtype=M.dtype) * kd
    chol = jnp.linalg.cholesky(A)
    y = solve_triangular(chol, tau[..., None], lower=True)
    return solve_triangular(
        jnp.swapaxes(chol, -1, -2), y, lower=False
    )[..., 0]
