"""AssistedManipulation objective: 7 independently-toggled cost terms.

Vectorized re-implementation of the reference objective
(src/frankaridgeback/objective/assisted_manipulation.cpp:37-319) with the
exact default gain table (assisted_manipulation.hpp:133-206). Each term is a
pure function of (state, control, RobotAux, t, ForecastContext); the total is
their sum. Per-term values are exposed for observability (the reference
accumulates them across an update for logging,
assisted_manipulation.cpp:24-35 + logging/assisted_manipulation.cpp).

All barrier evaluations are branch-free jnp; NaN state still poisons the
cost (the rollout weighting relies on it, mppi.cpp:331-334).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..models.frankaridgeback import POSITION, VELOCITY, ENERGY, RobotAux
from ..ops.costs import (
    LeftInverseBarrier,
    QuadraticCost,
    RightInverseBarrier,
)

# Self-collision pair table (assisted_manipulation.cpp:92-125), as indices
# into RobotAux.collision_link_positions = [pivot, panda_link1..7]. The radii
# table indexes the same way (link enum - 3, assisted_manipulation.cpp:144).
COLLISION_PAIRS = np.array(
    [(0, j) for j in (3, 4, 5, 6, 7)]
    + [(1, j) for j in (3, 4, 5, 6, 7)]
    + [(2, j) for j in (4, 5, 6, 7)]
    + [(3, j) for j in (5, 6, 7)]
    + [(4, j) for j in (6, 7)]
    + [(5, 7)],
    dtype=np.int32,
)


def _compose(channels):
    violations, smooth = channels
    return violations * 1e10 + smooth


class ForecastContext(NamedTuple):
    """Per-update forecast cache threaded into the objective as ctx — the
    analog of the DynamicsForecast handle (frankaridgeback/dynamics.hpp:
    133-171, 275-278): the cached end-effector wrench over the horizon.

    wrench(t) is linearly interpolated between cached steps and zero beyond
    the horizon (KalmanForecast::forecast semantics, forecast.cpp:342-367).
    """

    wrench_horizon: jnp.ndarray  # (steps + 1, 6)
    start_time: jnp.ndarray  # scalar
    time_step: float
    horizon: float

    def wrench(self, t):
        horizon = self.wrench_horizon
        if horizon.ndim == 3:
            # Scenario-batched ctx (forecast/scenarios.py): pointwise reads
            # (objective cost, optimal re-rollout) use the nominal scenario;
            # the ensemble axis is consumed by make_scenario_rollout_fn.
            horizon = horizon[0]
        rel = (t - self.start_time) / self.time_step
        steps = horizon.shape[0] - 1
        lower = jnp.clip(rel.astype(jnp.int32), 0, steps - 1)
        frac = jnp.clip(rel - lower, 0.0, 1.0)
        value = (
            (1.0 - frac) * horizon[lower]
            + frac * horizon[lower + 1]
        )
        beyond = (t - self.start_time) > self.horizon
        return jnp.where(beyond, jnp.zeros_like(value), value)


@dataclasses.dataclass
class Configuration:
    """Defaults = assisted_manipulation.hpp:133-206 verbatim."""

    enable_joint_limit: bool = True
    enable_self_collision_limit: bool = True
    enable_workspace_limit: bool = True
    enable_energy_limit: bool = False
    enable_velocity_cost: bool = True
    enable_trajectory_cost: bool = True
    enable_manipulability_cost: bool = True

    # (bound, scale) per joint.
    lower_joint_limit: tuple = (
        (-2.0, 0.0), (-2.0, 0.0), (-6.28, 0.0),
        (-2.8, 10.0), (-1.745, 10.0), (-2.8, 10.0), (-3.0718, 10.0),
        (-2.7925, 10.0), (0.349, 10.0), (-2.967, 10.0),
        (0.0, 0.0), (0.0, 0.0),
    )
    upper_joint_limit: tuple = (
        (2.0, 0.0), (2.0, 0.0), (6.28, 0.0),
        (2.8, 10.0), (1.745, 10.0), (2.8, 10.0), (0.0, 10.0),
        (2.7925, 10.0), (4.53785, 10.0), (2.967, 10.0),
        (0.5, 0.0), (0.5, 0.0),
    )
    self_collision_limit: tuple = (0.0, 1.0)  # (lower_bound, scale)
    self_collision_radii: tuple = (0.75, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1)
    workspace_limit_above: tuple = (0.0, 1.0)
    workspace_limit_infront: tuple = (0.0, 1.0)
    workspace_limit_reach: tuple = (1.0, 1.0)  # (upper_bound, scale)
    workspace_cost_yaw: float = 400.0  # quadratic
    energy_limit_below: tuple = (0.0, 10.0)
    energy_limit_above: tuple = (20.0, 10.0)
    velocity_cost: tuple = (
        1000.0, 1000.0, 100.0, 0.5, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 0.0, 0.0
    )
    trajectory_target_scale: float = 1e-2
    trajectory_target_maximum: float = 1.0
    trajectory_position_constant: float = 100.0
    trajectory_position_quadratic: float = 500.0
    trajectory_position_threshold: float = 0.0
    trajectory_velocity_quadratic: float = 500.0
    trajectory_velocity_minimum: float = 0.1
    trajectory_velocity_maximum: float = 5.0
    trajectory_velocity_dropoff: float = 2.0
    manipulability_quadratic: float = 10.0


class AssistedManipulation:
    """Callable objective with per-term breakdown."""

    TERM_NAMES = (
        "joint_limit",
        "self_collision",
        "workspace",
        "energy",
        "velocity",
        "trajectory",
        "manipulability",
    )

    def __init__(self, configuration: Configuration = None):
        self.configuration = configuration or Configuration()
        c = self.configuration
        # Array-parameterized barriers: all 12 joints evaluate in one
        # vectorized decomposed() call (the bounds/scales broadcast).
        lower = np.asarray(c.lower_joint_limit)
        upper = np.asarray(c.upper_joint_limit)
        self._lower = LeftInverseBarrier(lower[:, 0], lower[:, 1])
        self._upper = RightInverseBarrier(upper[:, 0], upper[:, 1])
        self._collision = LeftInverseBarrier(*c.self_collision_limit)
        self._above = LeftInverseBarrier(*c.workspace_limit_above)
        self._infront = LeftInverseBarrier(*c.workspace_limit_infront)
        self._reach = RightInverseBarrier(*c.workspace_limit_reach)
        self._yaw = QuadraticCost(quadratic_cost=c.workspace_cost_yaw)
        self._energy_below = LeftInverseBarrier(*c.energy_limit_below)
        self._energy_above = RightInverseBarrier(*c.energy_limit_above)
        self._trajectory_position = QuadraticCost(
            constant_cost=c.trajectory_position_constant,
            quadratic_cost=c.trajectory_position_quadratic,
        )
        self._trajectory_velocity = QuadraticCost(
            quadratic_cost=c.trajectory_velocity_quadratic
        )
        self._manipulability = QuadraticCost(
            quadratic_cost=c.manipulability_quadratic
        )
        radii = np.asarray(c.self_collision_radii)
        self._pair_radii = (
            radii[COLLISION_PAIRS[:, 0]] + radii[COLLISION_PAIRS[:, 1]]
        )

    # -- terms (assisted_manipulation.cpp:74-319) ----------------------------
    # Each *_channels method returns (saturations, smooth) — see
    # ops/costs.py two-channel decomposition. The *_cost wrappers compose a
    # scalar for logging/tests.

    def joint_limit_channels(self, q):
        vl, sl = self._lower.decomposed(q)
        vu, su = self._upper.decomposed(q)
        return jnp.sum(vl + vu), jnp.sum(sl + su)

    def joint_limit_cost(self, q):
        return _compose(self.joint_limit_channels(q))

    def self_collision_channels(self, aux: RobotAux):
        positions = aux.collision_link_positions  # (8, 3)
        first = positions[COLLISION_PAIRS[:, 0]]
        second = positions[COLLISION_PAIRS[:, 1]]
        distance = jnp.linalg.norm(first - second, axis=-1)
        # collision = distance - radii (assisted_manipulation.cpp:149)
        gap = distance - jnp.asarray(self._pair_radii, dtype=distance.dtype)
        v, s = self._collision.decomposed(gap)
        return jnp.sum(v), jnp.sum(s)

    def self_collision_cost(self, aux: RobotAux):
        return _compose(self.self_collision_channels(aux))

    def workspace_channels(self, x, aux: RobotAux):
        yaw = x[POSITION][2]
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        forward = jnp.stack([c, s, jnp.zeros_like(c)])
        offset = jnp.stack([0.1 * c - 0.0 * s, 0.1 * s, jnp.full_like(c, 0.15)])
        robot = aux.arm_mount_position + offset
        to_ee = aux.ee_position - robot

        projection = to_ee @ forward / (forward @ forward)
        v_in, s_in = self._infront.decomposed(projection)

        reach = jnp.linalg.norm(to_ee)
        v_re, s_re = self._reach.decomposed(reach)

        v1 = to_ee[:2]
        v2 = forward[:2]
        denom = jnp.linalg.norm(v1) * jnp.linalg.norm(v2)
        cos_angle = v1 @ v2 / jnp.where(denom > 0, denom, 1.0)
        angle = jnp.arccos(jnp.clip(cos_angle, -1.0, 1.0))
        yaw_cost = self._yaw(jnp.abs(angle))
        # The reference skips NaN yaw (assisted_manipulation.cpp:199-201).
        yaw_cost = jnp.where(denom > 0, yaw_cost, 0.0)

        height = aux.ee_position[2] - robot[2]
        v_ab, s_ab = self._above.decomposed(height)
        return v_in + v_re + v_ab, s_in + s_re + s_ab + yaw_cost

    def workspace_cost(self, x, aux: RobotAux):
        return _compose(self.workspace_channels(x, aux))

    def energy_channels(self, x):
        energy = x[ENERGY]
        vb, sb = self._energy_below.decomposed(energy)
        va, sa = self._energy_above.decomposed(energy)
        return vb + va, sb + sa

    def energy_cost(self, x):
        return _compose(self.energy_channels(x))

    def velocity_cost(self, x):
        v = x[VELOCITY]
        gains = jnp.asarray(self.configuration.velocity_cost, dtype=v.dtype)
        return jnp.sum(gains * v * v)

    def trajectory_cost(self, aux: RobotAux, t, ctx: Optional[ForecastContext]):
        if ctx is None:
            return jnp.asarray(0.0)
        c = self.configuration
        force = ctx.wrench(t)[:3]
        target = jnp.clip(
            c.trajectory_target_scale * force,
            -c.trajectory_target_maximum,
            c.trajectory_target_maximum,
        )
        distance = jnp.linalg.norm(target)

        position_cost = self._trajectory_position(distance)

        denom = target @ target
        safe_denom = jnp.where(denom > 0, denom, 1.0)
        projection = aux.ee_linear_velocity @ target / safe_denom
        projection = jnp.sign(projection) * jnp.linalg.norm(target * projection)

        velocity_target = jnp.clip(
            jnp.exp(c.trajectory_velocity_dropoff * distance) - 1.0,
            c.trajectory_velocity_minimum,
            c.trajectory_velocity_maximum,
        )
        velocity_error = jnp.abs(velocity_target - projection)
        velocity_cost = self._trajectory_velocity(velocity_error)

        active = distance > c.trajectory_position_threshold
        return jnp.where(active, position_cost + velocity_cost, 0.0)

    def manipulability_cost(self, aux: RobotAux):
        # jacobian.rightCols(9).topLeftCorner(3, 7) = linear rows, arm columns
        # (assisted_manipulation.cpp:296-298).
        J_arm = aux.ee_jacobian[0:3, 3:10]
        m = J_arm @ J_arm.T
        volume = jnp.sqrt(jnp.linalg.det(m))
        volume = jnp.where(jnp.isnan(volume), 1e-5, jnp.clip(volume, 1e-5, 1e5))
        return self._manipulability(1.0 / volume)

    # -- aggregation ---------------------------------------------------------

    def channel_terms(self, x, u, aux: RobotAux, t, ctx=None):
        """Per-term (saturations, smooth) channel pairs."""
        c = self.configuration
        zero = (jnp.asarray(0.0, dtype=x.dtype), jnp.asarray(0.0, dtype=x.dtype))

        def smooth_only(value):
            return (jnp.zeros_like(value), value)

        return {
            "joint_limit": (
                self.joint_limit_channels(x[POSITION])
                if c.enable_joint_limit
                else zero
            ),
            "self_collision": (
                self.self_collision_channels(aux)
                if c.enable_self_collision_limit
                else zero
            ),
            "workspace": (
                self.workspace_channels(x, aux)
                if c.enable_workspace_limit
                else zero
            ),
            "energy": (self.energy_channels(x) if c.enable_energy_limit else zero),
            "velocity": (
                smooth_only(self.velocity_cost(x))
                if c.enable_velocity_cost
                else zero
            ),
            "trajectory": (
                smooth_only(self.trajectory_cost(aux, t, ctx))
                if c.enable_trajectory_cost
                else zero
            ),
            "manipulability": (
                smooth_only(self.manipulability_cost(aux))
                if c.enable_manipulability_cost
                else zero
            ),
        }

    def terms(self, x, u, aux: RobotAux, t, ctx=None):
        """Composed per-term scalars for observability (the reference's
        per-term accumulators, assisted_manipulation.cpp:24-35)."""
        return {
            name: _compose(channels)
            for name, channels in self.channel_terms(x, u, aux, t, ctx).items()
        }

    def __call__(self, x, u, aux, t, ctx=None):
        """Returns the (saturations, smooth) channel pair as a (2,) array —
        the MPPI engine accumulates the channels separately (mppi.py
        as_cost_channels)."""
        violations, smooth = 0.0, 0.0
        for v, s in self.channel_terms(x, u, aux, t, ctx).values():
            violations = violations + v
            smooth = smooth + s
        return jnp.stack([violations, smooth])
