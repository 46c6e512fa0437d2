"""Lagrangian dynamics backend (models/lagrangian.py) vs the analytic
CRBA/RNEA pair — the TPU rebuild's working version of the reference's
second selectable dynamics model (actor_dynamics.cpp:46-86; the Pinocchio
path it replaces is self-documented broken, pinocchio_dynamics.hpp:26-29).

Two completely different derivations (spatial-algebra recursions vs
autodiff Euler-Lagrange on FK energies) must produce the same M(q) and
h(q, v); also pins the factory seam used by
FrankaRidgeback.Configuration.dynamics_type.
"""

import numpy as np
import jax.numpy as jnp

from assistedmanipulation_tpu.models import dynamics as dyn
from assistedmanipulation_tpu.models import factory
from assistedmanipulation_tpu.models import frankaridgeback as fr
from assistedmanipulation_tpu.models import kinematics as kin
from assistedmanipulation_tpu.models import lagrangian
from assistedmanipulation_tpu.models.model_data import frankaridgeback_model

import pytest

GRAVITY = (0.0, 0.0, 9.81)


def random_state(rng):
    q = rng.uniform(-1.0, 1.0, size=12)
    q[10:] = rng.uniform(0.0, 0.04, size=2)
    v = rng.uniform(-1.0, 1.0, size=12)
    return q, v


def test_mass_matrix_agrees_with_crba(rng):
    model = frankaridgeback_model()
    for _ in range(5):
        q, _ = random_state(rng)
        qj = jnp.asarray(q, dtype=jnp.float64)
        fk = kin.forward_kinematics(model, qj)
        M_analytic = np.asarray(dyn.mass_matrix(model, fk))
        M_lagrangian = np.asarray(lagrangian.mass_matrix(model, qj))
        np.testing.assert_allclose(M_lagrangian, M_analytic, atol=1e-10)


def test_nonlinear_effects_agree_with_rnea(rng):
    model = frankaridgeback_model()
    for _ in range(5):
        q, v = random_state(rng)
        qj = jnp.asarray(q, dtype=jnp.float64)
        vj = jnp.asarray(v, dtype=jnp.float64)
        fk = kin.forward_kinematics(model, qj)
        h_analytic = np.asarray(dyn.nonlinear_effects(model, fk, vj, GRAVITY))
        h_lagrangian = np.asarray(
            lagrangian.nonlinear_effects(model, qj, vj, GRAVITY)
        )
        np.testing.assert_allclose(h_lagrangian, h_analytic, atol=1e-9)


def test_energy_quantities_finite_and_positive(rng):
    model = frankaridgeback_model()
    q, v = random_state(rng)
    qj = jnp.asarray(q, dtype=jnp.float64)
    vj = jnp.asarray(v, dtype=jnp.float64)
    T = float(lagrangian.kinetic_energy(model, qj, vj))
    assert np.isfinite(T) and T > 0.0
    assert float(lagrangian.kinetic_energy(model, qj, jnp.zeros(12))) == 0.0


def test_factory_selects_backends():
    analytic = factory.create("analytic")
    lagr = factory.create("lagrangian")
    assert analytic.name == "analytic" and lagr.name == "lagrangian"
    with pytest.raises(ValueError, match="unknown dynamics model type"):
        factory.create("pinocchio")


def test_factory_backends_agree_through_interface(rng):
    model = frankaridgeback_model()
    q, v = random_state(rng)
    qj = jnp.asarray(q, dtype=jnp.float64)
    vj = jnp.asarray(v, dtype=jnp.float64)
    fk = kin.forward_kinematics(model, qj)
    a = factory.create("analytic")
    b = factory.create("lagrangian")
    np.testing.assert_allclose(
        np.asarray(b.mass_matrix(model, fk, qj)),
        np.asarray(a.mass_matrix(model, fk, qj)),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(b.nonlinear_effects(model, fk, qj, vj, GRAVITY)),
        np.asarray(a.nonlinear_effects(model, fk, qj, vj, GRAVITY)),
        atol=1e-9,
    )


def test_plant_step_with_lagrangian_backend_matches_analytic(rng):
    """One full simulator step through make_plant_step must be
    backend-invariant (the factory seam the reference exposes as
    SimulatorDynamics::Configuration::Type)."""
    step_a = fr.make_plant_step(fr.Configuration(dynamics_type="analytic"))
    step_b = fr.make_plant_step(fr.Configuration(dynamics_type="lagrangian"))
    x = jnp.asarray(fr.make_state("reach"), dtype=jnp.float64)
    u = jnp.asarray(rng.uniform(-1.0, 1.0, size=12), dtype=jnp.float64)
    wrench = jnp.asarray(rng.uniform(-5.0, 5.0, size=6), dtype=jnp.float64)
    xa, auxa = step_a(x, u, wrench, 0.005)
    xb, auxb = step_b(x, u, wrench, 0.005)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(xa), atol=1e-9)
    np.testing.assert_allclose(
        float(auxb.joint_power), float(auxa.joint_power), atol=1e-8
    )
