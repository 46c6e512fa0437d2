"""Reference position / orientation trajectory generators.

Pure functions of time (jit-friendly), re-implementing
src/controller/trajectory.cpp:

- Position: Point (93-107), Circular (108-155), Rectangular (157-218),
  Lissajous (220-246), FigureEight = Lissajous with y_freq = 2 x_freq and
  y_phase = pi (248-267).
- Orientation: AxisAngle (269-291), Slerp with t = (sin(t)+1)/2 (293-325).

Defaults mirror the inline DEFAULT_CONFIGURATION blocks
(trajectory.hpp:102-104, 168-173, 248-255, 353-363, 428-433, 477-480,
552-557).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..ops.rotations import (
    quat_from_axis_angle,
    quat_from_two_vectors,
    quat_multiply,
    quat_slerp,
)


# --- position ----------------------------------------------------------------


@dataclasses.dataclass
class PointConfiguration:
    point: tuple = (1.0, 1.0, 1.0)


class PointTrajectory:
    def __init__(self, configuration: PointConfiguration):
        self._point = jnp.asarray(configuration.point)

    def position(self, time):
        return jnp.broadcast_to(self._point, jnp.shape(time) + (3,))


@dataclasses.dataclass
class CircularConfiguration:
    origin: tuple = (1.0, 1.0, 1.0)
    axis: tuple = (0.0, 0.0, 1.0)
    radius: float = 0.25
    angular_velocity: float = 1.0


class CircularTrajectory:
    """Rotate an initial radius vector about the axis (trajectory.cpp:118-155).

    The initial point projects (axis + offset) onto the rotation plane and
    rescales to the radius (trajectory.cpp:129-146)."""

    def __init__(self, configuration: CircularConfiguration):
        axis = np.asarray(configuration.axis, dtype=np.float64)
        offset = np.array([1.0, 0.0, 0.0])
        if np.allclose(
            np.abs(axis / np.linalg.norm(axis)), np.abs(offset), atol=1e-9
        ):
            offset = np.array([0.0, 1.0, 0.0])
        to_project = axis + offset
        projected = to_project - axis.dot(to_project) / axis.dot(axis) * axis
        self._point = jnp.asarray(
            projected / np.linalg.norm(projected) * configuration.radius
        )
        self._origin = jnp.asarray(configuration.origin)
        self._axis = jnp.asarray(axis)
        self._angular_velocity = configuration.angular_velocity

    def position(self, time):
        angle = jnp.asarray(time) * self._angular_velocity
        q = quat_from_axis_angle(self._axis, angle)
        from ..ops.rotations import quat_rotate

        return self._origin + quat_rotate(q, self._point)


@dataclasses.dataclass
class RectangularConfiguration:
    origin: tuple = (1.0, 1.0, 1.0)
    axis: tuple = (0.0, 0.0, 1.0)
    width: float = 1.0
    height: float = 0.0
    velocity: float = 0.5


class RectangularTrajectory:
    """Perimeter walk under an affine plane transform (trajectory.cpp:170-218)."""

    def __init__(self, configuration: RectangularConfiguration):
        if configuration.velocity < 0:
            raise ValueError("cannot have non-positive velocity")
        c = configuration
        axis = np.asarray(c.axis, dtype=np.float64)
        q = quat_from_two_vectors(
            jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(axis)
        )
        from ..ops.rotations import quat_to_matrix

        rotation = np.asarray(quat_to_matrix(q))
        translation = np.asarray(c.origin) - np.array(
            [c.width / 2, c.height / 2, 0.0]
        )
        self._rotation = jnp.asarray(rotation)
        self._translation = jnp.asarray(translation)
        self._width = c.width
        self._height = c.height
        self._velocity = c.velocity
        self._circumference = 2 * c.width + 2 * c.height

    def position(self, time):
        w, h = self._width, self._height
        d = jnp.mod(jnp.asarray(time) * self._velocity, self._circumference)
        # Four perimeter segments, selected branch-free.
        p0 = jnp.stack([d, jnp.zeros_like(d), jnp.zeros_like(d)], -1)
        d1 = d - w
        p1 = jnp.stack([jnp.full_like(d, w), d1, jnp.zeros_like(d)], -1)
        d2 = d1 - h
        p2 = jnp.stack([w - d2, jnp.full_like(d, h), jnp.zeros_like(d)], -1)
        d3 = d2 - w
        p3 = jnp.stack([jnp.zeros_like(d), h - d3, jnp.zeros_like(d)], -1)
        local = jnp.where(
            (d < w)[..., None],
            p0,
            jnp.where(
                (d1 < h)[..., None], p1, jnp.where((d2 < w)[..., None], p2, p3)
            ),
        )
        return (self._rotation @ local[..., None])[..., 0] + self._translation


@dataclasses.dataclass
class LissajousConfiguration:
    origin: tuple = (1.0, 1.0, 1.0)
    x_amplitude: float = 0.4
    y_amplitude: float = 0.2
    z_amplitude: float = 0.0
    x_frequency: float = 0.5
    y_frequency: float = 1.5
    z_frequency: float = 0.0
    y_phase: float = float(np.pi / 2)
    z_phase: float = 0.0


class LissajousTrajectory:
    def __init__(self, configuration: LissajousConfiguration):
        self.c = configuration

    def position(self, time):
        c = self.c
        t = jnp.asarray(time)
        return jnp.asarray(c.origin) + jnp.stack(
            [
                c.x_amplitude * jnp.sin(c.x_frequency * t),
                c.y_amplitude * jnp.sin(c.y_frequency * t + c.y_phase),
                c.z_amplitude * jnp.sin(c.z_frequency * t + c.z_phase),
            ],
            axis=-1,
        )


@dataclasses.dataclass
class FigureEightConfiguration:
    origin: tuple = (1.0, 1.0, 1.0)
    x_amplitude: float = 0.5
    y_amplitude: float = 0.25
    frequency: float = 1.0


class FigureEightTrajectory(LissajousTrajectory):
    """Lissajous with y_freq = 2 x_freq and y_phase = pi
    (trajectory.cpp:248-267)."""

    def __init__(self, configuration: FigureEightConfiguration):
        c = configuration
        super().__init__(
            LissajousConfiguration(
                origin=c.origin,
                x_amplitude=c.x_amplitude,
                y_amplitude=c.y_amplitude,
                z_amplitude=0.0,
                x_frequency=c.frequency,
                y_frequency=2 * c.frequency,
                z_frequency=0.0,
                y_phase=float(np.pi),
                z_phase=0.0,
            )
        )


# --- orientation -------------------------------------------------------------


@dataclasses.dataclass
class AxisAngleConfiguration:
    axis: tuple = (0.0, 0.0, 1.0)
    angle: float = 0.0


class AxisAngleTrajectory:
    """Static orientation: Rz(angle) * FromTwoVectors(z, axis)
    (trajectory.cpp:277-291)."""

    def __init__(self, configuration: AxisAngleConfiguration):
        qz = quat_from_axis_angle(
            jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(configuration.angle)
        )
        qa = quat_from_two_vectors(
            jnp.asarray([0.0, 0.0, 1.0]),
            jnp.asarray(configuration.axis),
        )
        self._orientation = quat_multiply(qz, qa)

    def orientation(self, time):
        return jnp.broadcast_to(self._orientation, jnp.shape(time) + (4,))


@dataclasses.dataclass
class SlerpConfiguration:
    first_axis: tuple = (0.0, 0.0, 1.0)
    first_angle: float = 0.0
    second_axis: tuple = (1.0, 0.0, 0.0)
    second_angle: float = 0.0
    frequency: float = 0.5


class SlerpTrajectory:
    """Oscillating slerp with t = (sin(time) + 1) / 2 (trajectory.cpp:318-325)."""

    def __init__(self, configuration: SlerpConfiguration):
        c = configuration

        def make(axis, angle):
            qz = quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(angle))
            qa = quat_from_two_vectors(
                jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(axis)
            )
            return quat_multiply(qz, qa)

        self._first = make(c.first_axis, c.first_angle)
        self._second = make(c.second_axis, c.second_angle)

    def orientation(self, time):
        t = (jnp.sin(jnp.asarray(time)) + 1.0) / 2.0
        return quat_slerp(self._first, self._second, t)


# --- factories (trajectory.cpp:23-91) ----------------------------------------


@dataclasses.dataclass
class PositionConfiguration:
    type: str = "circle"
    point: Optional[PointConfiguration] = None
    circle: Optional[CircularConfiguration] = None
    rectangle: Optional[RectangularConfiguration] = None
    lissajous: Optional[LissajousConfiguration] = None
    figure_eight: Optional[FigureEightConfiguration] = None


def create_position(configuration: PositionConfiguration):
    c = configuration
    if c.type == "point":
        return PointTrajectory(c.point or PointConfiguration())
    if c.type == "circle":
        return CircularTrajectory(c.circle or CircularConfiguration())
    if c.type == "rectangle":
        return RectangularTrajectory(c.rectangle or RectangularConfiguration())
    if c.type == "lissajous":
        return LissajousTrajectory(c.lissajous or LissajousConfiguration())
    if c.type == "figure_eight":
        return FigureEightTrajectory(c.figure_eight or FigureEightConfiguration())
    raise ValueError(f"unknown position trajectory type {c.type}")


@dataclasses.dataclass
class OrientationConfiguration:
    type: str = "axis_angle"
    axis_angle: Optional[AxisAngleConfiguration] = None
    slerp: Optional[SlerpConfiguration] = None


def create_orientation(configuration: OrientationConfiguration):
    c = configuration
    if c.type == "axis_angle":
        return AxisAngleTrajectory(c.axis_angle or AxisAngleConfiguration())
    if c.type == "slerp":
        return SlerpTrajectory(c.slerp or SlerpConfiguration())
    raise ValueError(f"unknown orientation trajectory type {c.type}")
