"""Energy-tank passivity primitive.

Reference: src/controller/energy.hpp:19-42. The tank integrates power, is
clamped non-negative, and exposes a tank "state" x = sqrt(2*E). Here the tank
is a pure function on a scalar energy value carried inside the rollout state
vector (State[30]), so it composes with lax.scan and vmap.
"""

from __future__ import annotations

import jax.numpy as jnp


def energy_tank_step(energy, power, dt):
    """E <- max(0, E + P*dt). Batched over leading dims."""
    return jnp.maximum(0.0, energy + power * dt)


def energy_to_tank_state(energy):
    """x = sqrt(2*E) (reference energy.hpp:21)."""
    return jnp.sqrt(2.0 * jnp.maximum(energy, 0.0))


def tank_state_to_energy(state):
    """E = x^2/2 (reference energy.hpp:40)."""
    return 0.5 * state * state
