"""Alternative dynamics backend: autodiff Lagrangian mechanics.

The reference ships a second, selectable dynamics implementation next to
RaiSim (SimulatorDynamics::create -> RAISIM | PINOCCHIO,
simulation/frankaridgeback/actor_dynamics.cpp:46-86) — but its Pinocchio
path is self-documented broken ("doesn't given the same results",
pinocchio_dynamics.hpp:26-29). This module is the TPU rebuild's working
equivalent of that second backend: the same plant quantities derived by a
completely different algorithm —

- kinetic energy T(q, v) from per-body world COM velocities and angular
  velocities obtained with one jvp through the forward kinematics (no
  motion subspaces, no spatial algebra);
- M(q) = ∂²T/∂v² by jax.hessian (T is exactly quadratic in v, so this is
  exact, not an approximation);
- h(q, v) = ∂p/∂q · v − ∂T/∂q + ∂U/∂q from the Euler-Lagrange equations,
  with the generalized momentum p = ∂T/∂v and gravitational potential
  U = Σ m_k a_g·c_k for base acceleration a_g = −gravity (the same
  convention as models/dynamics.rnea).

Everything is pure jnp + jax transforms, so the backend runs on device and
batches under vmap like the analytic one. It is slower than the
common-origin CRBA/RNEA pair (autodiff through the 12-link FK does more
work than the hand-derived recursions), so the analytic backend remains the
MPPI hot-path default; this one exists as the selectable alternative
(models/factory.py) and as an on-device analytic-vs-analytic cross-check of
the plant (tests/test_lagrangian.py), independent of the finite-difference
URDF oracle (tests/test_dynamics_oracle.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import kinematics as kin
from .kinematics import f32_matmuls
from .model_data import RobotModel


def _body_states(model: RobotModel, q: jnp.ndarray):
    """(world COM positions (J, 3), world rotations (J, 3, 3))."""
    fk = kin.forward_kinematics(model, q)
    return kin.com_positions(model, fk), fk.rotation


@f32_matmuls
def kinetic_energy(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray):
    """T(q, v) = 1/2 Σ_k [ m_k |ċ_k|² + ω_k · (R_k I_k R_kᵀ) ω_k ]."""
    dtype = q.dtype
    (coms, R), (dcoms, dR) = jax.jvp(
        lambda q: _body_states(model, q), (q,), (v,)
    )
    # ω from the rotation derivative: skew(ω) = Ṙ Rᵀ.
    W = dR @ jnp.swapaxes(R, -1, -2)
    omega = jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)
    mass = jnp.asarray(model.mass, dtype=dtype)
    inertia = jnp.asarray(model.inertia, dtype=dtype)
    I_world = R @ inertia @ jnp.swapaxes(R, -1, -2)
    translational = jnp.sum(mass * jnp.sum(dcoms * dcoms, axis=-1))
    rotational = jnp.sum(omega * (I_world @ omega[..., None])[..., 0])
    return 0.5 * (translational + rotational)


@f32_matmuls
def potential_energy(model: RobotModel, q: jnp.ndarray, gravity):
    """U(q) = Σ_k m_k a_g · c_k with a_g = −gravity (rnea convention)."""
    dtype = q.dtype
    a_g = -jnp.asarray(gravity, dtype=dtype)
    coms, _ = _body_states(model, q)
    mass = jnp.asarray(model.mass, dtype=dtype)
    return jnp.sum(mass * (coms @ a_g))


@f32_matmuls
def mass_matrix(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """M(q) = ∂²T/∂v² — exact, T being quadratic in v."""
    return jax.hessian(lambda v: kinetic_energy(model, q, v))(
        jnp.zeros_like(q)
    )


@f32_matmuls
def nonlinear_effects(model: RobotModel, q, v, gravity) -> jnp.ndarray:
    """h(q, v) = (∂p/∂q) v − ∂T/∂q + ∂U/∂q, p = ∂T/∂v (Euler-Lagrange)."""
    momentum = lambda q: jax.grad(
        lambda v: kinetic_energy(model, q, v)
    )(v)
    _, dp_dq_v = jax.jvp(momentum, (q,), (v,))
    dT_dq = jax.grad(lambda q: kinetic_energy(model, q, v))(q)
    dU_dq = jax.grad(lambda q: potential_energy(model, q, gravity))(q)
    return dp_dq_v - dT_dq + dU_dq
