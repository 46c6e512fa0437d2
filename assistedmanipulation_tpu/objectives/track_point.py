"""TrackPoint objective: reach a fixed point with the end effector.

Re-implementation of src/frankaridgeback/objective/track_point.cpp:
- 100 * d^2 to the target point (track_point.cpp:36-43);
- hard-coded quadratic joint-limit penalties (1000 + 1e5 * excess^2 over the
  first 10 joints, track_point.cpp:45-79);
- the same self-collision sphere table. NOTE a documented divergence: the
  reference computes collision = radii - distance (track_point.cpp:137),
  which puts every NON-colliding pair in the barrier's out-of-bound branch
  (~1e10 each, ~1.9e11 constant per step). In double precision that constant
  cancels in MPPI's min/max normalization; in float32 it swamps the actual
  position cost entirely. We implement the intended gap = distance - radii
  (matching assisted_manipulation.cpp:149), which preserves the barrier's
  meaning and is f32-safe;
- reach barrier from the arm-mount plane with a (0.3, 0, 0.15) offset
  (track_point.cpp:150-174).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..models.frankaridgeback import POSITION, RobotAux
from ..ops.costs import LeftInverseBarrier, RightInverseBarrier
from .assisted_manipulation import COLLISION_PAIRS

LOWER_LIMIT = np.array(
    [-2.0, -2.0, -6.28, -2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175, -2.8973]
)
UPPER_LIMIT = np.array(
    [2.0, 2.0, 6.28, 2.8973, 1.7628, 2.8973, 0.0698, 2.8973, 3.7525, 2.8973]
)


@dataclasses.dataclass
class Configuration:
    point: tuple = (1.0, 1.0, 1.0)
    enable_joint_limits: bool = True
    enable_self_collision_avoidance: bool = True
    enable_reach_limits: bool = True
    self_collision_limit: tuple = (0.0, 1.0)  # LeftInverseBarrier (bound, scale)
    self_collision_radii: tuple = (0.75, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1)
    maximum_reach_limit: tuple = (1.0, 1.0)  # RightInverseBarrier


class TrackPoint:
    def __init__(self, configuration: Configuration = None):
        self.configuration = configuration or Configuration()
        c = self.configuration
        self._collision = LeftInverseBarrier(*c.self_collision_limit)
        self._reach = RightInverseBarrier(*c.maximum_reach_limit)
        radii = np.asarray(c.self_collision_radii)
        self._pair_radii = (
            radii[COLLISION_PAIRS[:, 0]] + radii[COLLISION_PAIRS[:, 1]]
        )
        self._point = np.asarray(c.point, dtype=np.float64)

    def point_cost(self, aux: RobotAux):
        distance = jnp.linalg.norm(
            aux.ee_position - jnp.asarray(self._point, dtype=aux.ee_position.dtype)
        )
        return 100.0 * distance**2

    def joint_limit_cost(self, q):
        lower = jnp.asarray(LOWER_LIMIT, dtype=q.dtype)
        upper = jnp.asarray(UPPER_LIMIT, dtype=q.dtype)
        q10 = q[:10]
        below = jnp.where(
            q10 < lower, 1000.0 + 100000.0 * (lower - q10) ** 2, 0.0
        )
        above = jnp.where(
            q10 > upper, 1000.0 + 100000.0 * (q10 - upper) ** 2, 0.0
        )
        return jnp.sum(below + above)

    def self_collision_channels(self, aux: RobotAux):
        positions = aux.collision_link_positions
        first = positions[COLLISION_PAIRS[:, 0]]
        second = positions[COLLISION_PAIRS[:, 1]]
        distance = jnp.linalg.norm(first - second, axis=-1)
        # Intended-behavior fix of track_point.cpp:137's inverted sign — see
        # the module docstring.
        gap = distance - jnp.asarray(self._pair_radii, dtype=distance.dtype)
        v, s = self._collision.decomposed(gap)
        return jnp.sum(v), jnp.sum(s)

    def self_collision_cost(self, aux: RobotAux):
        v, s = self.self_collision_channels(aux)
        return v * 1e10 + s

    def reach_channels(self, x, aux: RobotAux):
        yaw = x[POSITION][2]
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        offset = jnp.stack([0.3 * c, 0.3 * s, jnp.full_like(c, 0.15)])
        robot = aux.arm_mount_position + offset
        reach = jnp.linalg.norm(aux.ee_position - robot)
        return self._reach.decomposed(reach)

    def reach_cost(self, x, aux: RobotAux):
        v, s = self.reach_channels(x, aux)
        return v * 1e10 + s

    def channel_terms(self, x, u, aux, t, ctx=None):
        c = self.configuration
        zero = (jnp.asarray(0.0, dtype=x.dtype), jnp.asarray(0.0, dtype=x.dtype))

        def smooth_only(value):
            return (jnp.zeros_like(value), value)

        return {
            "point": smooth_only(self.point_cost(aux)),
            "joint_limit": (
                smooth_only(self.joint_limit_cost(x[POSITION]))
                if c.enable_joint_limits
                else zero
            ),
            "self_collision": (
                self.self_collision_channels(aux)
                if c.enable_self_collision_avoidance
                else zero
            ),
            "reach": (
                self.reach_channels(x, aux) if c.enable_reach_limits else zero
            ),
        }

    def terms(self, x, u, aux, t, ctx=None):
        return {
            name: v * 1e10 + s
            for name, (v, s) in self.channel_terms(x, u, aux, t, ctx).items()
        }

    def __call__(self, x, u, aux, t, ctx=None):
        violations, smooth = 0.0, 0.0
        for v, s in self.channel_terms(x, u, aux, t, ctx).values():
            violations = violations + v
            smooth = smooth + s
        return jnp.stack([violations, smooth])
