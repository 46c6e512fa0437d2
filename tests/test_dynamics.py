"""Rigid-body dynamics validation: the CRBA mass matrix against an
independent Jacobian-based construction, RNEA <-> CRBA consistency, gravity
torques against the potential-energy gradient, and forward-dynamics sanity.
"""

import numpy as np
import jax
import jax.numpy as jnp

from assistedmanipulation_tpu.models import dynamics as dyn
from assistedmanipulation_tpu.models import kinematics as kin
from assistedmanipulation_tpu.models.model_data import frankaridgeback_model


def random_q(rng):
    q = rng.uniform(-1.0, 1.0, size=12)
    q[10:] = rng.uniform(0.0, 0.04, size=2)
    return q


def jacobian_mass_matrix(model, q):
    """Independent M(q) = sum_k m_k Jv_k^T Jv_k + Jw_k^T I_k^W Jw_k, with the
    COM Jacobians from autodiff."""
    q = jnp.asarray(q, dtype=jnp.float64)

    def com_k(k):
        def fn(q_):
            fk = kin.forward_kinematics(model, q_)
            return kin.com_positions(model, fk)[k]

        return fn

    fk = kin.forward_kinematics(model, q)
    M = np.zeros((12, 12))
    for k in range(12):
        Jv = np.asarray(jax.jacfwd(com_k(k))(q))
        Jw = np.asarray(kin.angular_jacobian(model, fk, body=k))
        R = np.asarray(fk.rotation[k])
        I_world = R @ np.asarray(model.inertia[k]) @ R.T
        M += model.mass[k] * Jv.T @ Jv + Jw.T @ I_world @ Jw
    return M


def test_mass_matrix_matches_jacobian_construction(rng):
    model = frankaridgeback_model()
    for _ in range(3):
        q = random_q(rng)
        fk = kin.forward_kinematics(model, jnp.asarray(q, dtype=jnp.float64))
        M = np.asarray(dyn.mass_matrix(model, fk))
        M_ref = jacobian_mass_matrix(model, q)
        np.testing.assert_allclose(M, M_ref, atol=1e-8)
        # SPD check.
        np.testing.assert_allclose(M, M.T, atol=1e-10)
        assert np.linalg.eigvalsh(M).min() > 0


def test_rnea_consistent_with_crba(rng):
    """tau = rnea(qd, qdd, g) must satisfy rnea(0, qdd, 0) = M qdd."""
    model = frankaridgeback_model()
    q = random_q(rng)
    qdd = rng.normal(size=12)
    fk = kin.forward_kinematics(model, jnp.asarray(q, dtype=jnp.float64))
    M = np.asarray(dyn.mass_matrix(model, fk))
    tau = np.asarray(
        dyn.rnea(
            model,
            fk,
            jnp.zeros(12, dtype=jnp.float64),
            jnp.asarray(qdd, dtype=jnp.float64),
            np.zeros(3),
        )
    )
    np.testing.assert_allclose(tau, M @ qdd, atol=1e-8)


def test_gravity_torques_match_potential_gradient(rng):
    """g(q) = dV/dq with V = -sum_k m_k g . c_k(q)."""
    model = frankaridgeback_model()
    q = random_q(rng)
    gravity = np.array([0.0, 0.0, -9.81])

    def potential(q_):
        fk = kin.forward_kinematics(model, q_)
        coms = kin.com_positions(model, fk)
        masses = jnp.asarray(model.mass)
        return -jnp.sum(masses * (coms @ jnp.asarray(gravity)))

    g_expected = np.asarray(jax.grad(potential)(jnp.asarray(q, dtype=jnp.float64)))
    fk = kin.forward_kinematics(model, jnp.asarray(q, dtype=jnp.float64))
    g_rnea = np.asarray(
        dyn.nonlinear_effects(model, fk, jnp.zeros(12, dtype=jnp.float64), gravity)
    )
    np.testing.assert_allclose(g_rnea, g_expected, atol=1e-8)


def test_coriolis_power_balance(rng):
    """Energy rate: d/dt(1/2 qd^T M qd) = qd^T tau for tau = rnea(qd, qdd)
    with g=0 — i.e. (Mdot - 2C) skew property, checked numerically."""
    model = frankaridgeback_model()
    q = random_q(rng)
    qd = rng.normal(size=12) * 0.5
    qdd = rng.normal(size=12)
    q_jax = jnp.asarray(q, dtype=jnp.float64)
    qd_jax = jnp.asarray(qd, dtype=jnp.float64)

    fk = kin.forward_kinematics(model, q_jax)
    tau = np.asarray(dyn.rnea(model, fk, qd_jax, jnp.asarray(qdd), np.zeros(3)))

    def ke(q_, qd_):
        fk_ = kin.forward_kinematics(model, q_)
        return dyn.kinetic_energy(model, fk_, qd_)

    dKE_dq = np.asarray(jax.grad(ke, argnums=0)(q_jax, qd_jax))
    dKE_dqd = np.asarray(jax.grad(ke, argnums=1)(q_jax, qd_jax))
    # dKE/dt = dKE_dq . qd + dKE_dqd . qdd must equal qd . tau
    lhs = dKE_dq @ qd + dKE_dqd @ qdd
    rhs = qd @ tau
    np.testing.assert_allclose(lhs, rhs, rtol=1e-8, atol=1e-8)


def test_forward_dynamics_solves(rng):
    model = frankaridgeback_model()
    q = random_q(rng)
    fk = kin.forward_kinematics(model, jnp.asarray(q, dtype=jnp.float64))
    M = dyn.mass_matrix(model, fk)
    tau = jnp.asarray(rng.normal(size=12))
    kd = jnp.asarray(np.full(12, 2.0))
    qdd = dyn.forward_dynamics(M, tau, kd, dt=0.01)
    residual = np.asarray(
        (M + 0.01 * jnp.eye(12) * kd) @ qdd - tau
    )
    np.testing.assert_allclose(residual, 0.0, atol=1e-8)


def test_batched_dynamics(rng):
    model = frankaridgeback_model()
    q = np.stack([random_q(rng) for _ in range(5)])
    fk = kin.forward_kinematics(model, jnp.asarray(q, dtype=jnp.float64))
    M = dyn.mass_matrix(model, fk)
    assert M.shape == (5, 12, 12)
    fk0 = kin.forward_kinematics(model, jnp.asarray(q[2], dtype=jnp.float64))
    np.testing.assert_allclose(
        np.asarray(M[2]), np.asarray(dyn.mass_matrix(model, fk0)), atol=1e-10
    )
