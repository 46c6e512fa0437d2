"""Point-mass double-integrator plant (BASELINE config 1).

The minimum end-to-end MPPI slice: state (position, velocity) in N
dimensions, control = acceleration. Used for the NumPy-oracle parity test of
the generic MPPI engine and as the cheapest benchmark plant.

No direct reference equivalent (the reference's simplest plant is the full
RaiSim robot); semantics follow the mppi::Dynamics contract
(reference src/controller/mppi.hpp:30-85): semi-implicit Euler integration.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..mppi import Plant
from ..ops.costs import QuadraticCost


@dataclasses.dataclass
class PointMassConfig:
    dimensions: int = 2
    target: tuple = None  # defaults to ones(dimensions)
    position_cost: float = 100.0
    velocity_cost: float = 1.0
    control_cost: float = 0.01


def make_point_mass_plant(config: PointMassConfig) -> Plant:
    dims = config.dimensions
    target = jnp.asarray(
        config.target if config.target is not None else [1.0] * dims,
        dtype=jnp.float32,
    )

    def derive(x, t, ctx=None):
        return None

    def cost(x, u, aux, t, ctx=None):
        position, velocity = x[:dims], x[dims:]
        return (
            config.position_cost * jnp.sum((position - target) ** 2)
            + config.velocity_cost * jnp.sum(velocity**2)
            + config.control_cost * jnp.sum(u**2)
        )

    def integrate(x, u, aux, t, dt, ctx=None):
        position, velocity = x[:dims], x[dims:]
        velocity = velocity + u * dt
        position = position + velocity * dt
        return jnp.concatenate([position, velocity])

    return Plant(
        derive=derive,
        cost=cost,
        integrate=integrate,
        state_dof=2 * dims,
        control_dof=dims,
    )


@dataclasses.dataclass
class ObstacleField2DConfig:
    """Ridgeback-style planar plant with obstacle log barriers
    (BASELINE config 2): velocity-controlled (x, y, yaw) base."""

    target: tuple = (2.0, 2.0, 0.0)
    obstacles: tuple = ((1.0, 1.0, 0.3),)  # (x, y, radius)
    position_cost: float = 100.0
    obstacle_scale: float = 10.0
    control_cost: float = 0.1
    velocity_time_constant: float = 0.15


def make_base_2d_plant(config: ObstacleField2DConfig) -> Plant:
    """State (x, y, yaw, vx, vy, vyaw); control = commanded velocities.

    Velocity commands track through a first-order lag, mirroring the
    kd-dominated PD base actuation of the full robot (reference
    raisim_dynamics.cpp:206-224 with kp=0, kd=1000)."""
    target = jnp.asarray(config.target, dtype=jnp.float32)
    obstacles = jnp.asarray(config.obstacles, dtype=jnp.float32)

    def derive(x, t, ctx=None):
        return None

    def cost(x, u, aux, t, ctx=None):
        position = x[:3]
        error = position - target
        c = config.position_cost * jnp.sum(error**2)
        c = c + config.control_cost * jnp.sum(u**2)
        # Log barrier around each obstacle disc.
        distance = jnp.linalg.norm(position[None, :2] - obstacles[:, :2], axis=-1)
        gap = distance - obstacles[:, 2]
        barrier = jnp.where(
            gap <= 0.0,
            1e10,
            jnp.minimum(config.obstacle_scale * -jnp.log10(jnp.where(gap > 0, gap, 1.0)), 1e10),
        )
        return c + jnp.sum(jnp.maximum(barrier, 0.0))

    def integrate(x, u, aux, t, dt, ctx=None):
        position, velocity = x[:3], x[3:]
        alpha = dt / (config.velocity_time_constant + dt)
        velocity = velocity + alpha * (u - velocity)
        position = position + velocity * dt
        return jnp.concatenate([position, velocity])

    return Plant(
        derive=derive, cost=cost, integrate=integrate, state_dof=6, control_dof=3
    )
