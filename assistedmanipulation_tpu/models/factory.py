"""Dynamics backend factory (SimulatorDynamics / ActorDynamics analog).

The reference selects the plant implementation at configuration time —
SimulatorDynamics::Configuration::Type::{RAISIM, PINOCCHIO} routed through
ActorDynamics::create (simulation/frankaridgeback/actor_dynamics.cpp:46-86,
simulation/simulator.hpp) — so the simulator and the MPPI rollouts can run
different dynamics models. The TPU rebuild keeps that seam: two working
backends producing the same plant quantities by different algorithms,
selected by ``FrankaRidgeback.Configuration.dynamics_type``:

- ``analytic``: common-origin CRBA mass matrix + RNEA nonlinear effects
  (models/dynamics.py) — the hot-path default;
- ``lagrangian``: autodiff Euler-Lagrange (models/lagrangian.py) — the
  working replacement for the reference's broken Pinocchio alternative
  (pinocchio_dynamics.hpp:26-29).

Both run on device and vmap; cross-agreement is pinned to ~1e-10 f64 in
tests/test_lagrangian.py.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from . import dynamics as dyn
from . import lagrangian


class DynamicsBackend(NamedTuple):
    """Uniform plant-quantity interface over (model, fk, q, v)."""

    name: str
    # (model, fk, q) -> (..., 12, 12)
    mass_matrix: Callable
    # (model, fk, q, v, gravity) -> (..., 12)
    nonlinear_effects: Callable


ANALYTIC = DynamicsBackend(
    name="analytic",
    mass_matrix=lambda model, fk, q: dyn.mass_matrix(model, fk),
    nonlinear_effects=lambda model, fk, q, v, gravity: dyn.nonlinear_effects(
        model, fk, v, gravity
    ),
)

LAGRANGIAN = DynamicsBackend(
    name="lagrangian",
    mass_matrix=lambda model, fk, q: lagrangian.mass_matrix(model, q),
    nonlinear_effects=lambda model, fk, q, v, gravity: (
        lagrangian.nonlinear_effects(model, q, v, gravity)
    ),
)

_BACKENDS = {backend.name: backend for backend in (ANALYTIC, LAGRANGIAN)}


def create(dynamics_type: str) -> DynamicsBackend:
    """Select a dynamics backend by name (ActorDynamics::create,
    actor_dynamics.cpp:46-86 — unknown types are a configuration error)."""
    try:
        return _BACKENDS[dynamics_type]
    except KeyError:
        raise ValueError(
            f"unknown dynamics model type {dynamics_type!r}; "
            f"expected one of {sorted(_BACKENDS)}"
        ) from None
