"""Fixed-topology forward kinematics and Jacobians (batched jnp).

Replaces the reference's RaiSim/Pinocchio kinematic queries
(raisim_dynamics.cpp:150-204: frame positions/orientations, dense frame
Jacobians, end-effector state) with straight-line code generated from the
static 12-joint topology: the per-joint loop unrolls at trace time, so XLA
sees a fused elementwise/matmul pipeline it can batch over thousands of
rollouts.

Conventions:
- world transforms per moving link: rotation R (..., J, 3, 3), origin p
  (..., J, 3); the link frame equals its parent joint's frame (URDF child
  frame convention), matching raisim body frames after fixed-joint merging.
- Jacobians map joint velocities to world-frame twists; columns are masked by
  the static ancestor matrix.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.precision import f32_matmuls
from .model_data import PRISMATIC, REVOLUTE, RobotModel


class FK(NamedTuple):
    rotation: jnp.ndarray  # (..., J, 3, 3) world rotation of each link frame
    origin: jnp.ndarray  # (..., J, 3) world origin of each link frame
    axis_world: jnp.ndarray  # (..., J, 3) world joint axis direction


def _axis_rotation(axis: np.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation about a *static* unit axis by a traced angle.

    axis is a host constant (3,), angle has any batch shape."""
    k = np.asarray(axis, dtype=np.float64)
    k = k / np.linalg.norm(k)
    K = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], dtype=np.float64
    )
    K = jnp.asarray(K, dtype=angle.dtype)
    K2 = jnp.asarray(K @ K, dtype=angle.dtype)
    eye = jnp.eye(3, dtype=angle.dtype)
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    return eye + s * K + (1.0 - c) * K2


@f32_matmuls
def forward_kinematics(model: RobotModel, q: jnp.ndarray) -> FK:
    """World transforms of all moving link frames for joint positions q
    (..., J). The joint loop unrolls at trace time (static topology)."""
    dtype = q.dtype
    batch = q.shape[:-1]

    rotations = []
    origins = []
    axes = []
    for i in range(model.n_joints):
        R_off = jnp.asarray(model.rotation[i], dtype=dtype)
        p_off = jnp.asarray(model.translation[i], dtype=dtype)
        parent = int(model.parent[i])
        if parent < 0:
            R_parent = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
            p_parent = jnp.zeros(batch + (3,), dtype=dtype)
        else:
            R_parent, p_parent = rotations[parent], origins[parent]

        # Joint frame (before motion) in world.
        R_joint = R_parent @ R_off
        p_joint = (R_parent @ p_off[..., None])[..., 0] + p_parent

        qi = q[..., i]
        if int(model.joint_type[i]) == REVOLUTE:
            R_motion = _axis_rotation(model.axis[i], qi)
            R_world = R_joint @ R_motion
            p_world = p_joint
        else:  # prismatic
            a = jnp.asarray(
                np.asarray(model.axis[i]) / np.linalg.norm(model.axis[i]),
                dtype=dtype,
            )
            R_world = R_joint
            p_world = p_joint + qi[..., None] * (R_joint @ a)

        a_world = R_joint @ jnp.asarray(
            np.asarray(model.axis[i]) / np.linalg.norm(model.axis[i]), dtype=dtype
        )
        rotations.append(R_world)
        origins.append(p_world)
        axes.append(a_world)

    return FK(
        rotation=jnp.stack(rotations, axis=-3),
        origin=jnp.stack(origins, axis=-2),
        axis_world=jnp.stack(axes, axis=-2),
    )


def frame_transform(model: RobotModel, fk: FK, frame: str):
    """World (R, p) of a named fixed frame (reference Frame enum;
    raisim getFramePosition/getFrameOrientation)."""
    parent, R_fix, p_fix = model.frames[frame]
    return _attached_transform(fk, parent, R_fix, p_fix)


def link_transform(model: RobotModel, fk: FK, link: str):
    """World (R, p) of a named link frame (reference Link enum;
    dynamics->get_link_position, assisted_manipulation.cpp:136-140)."""
    parent, R_fix, p_fix = model.link_frames[link]
    return _attached_transform(fk, parent, R_fix, p_fix)


def _attached_transform(fk: FK, parent: int, R_fix: np.ndarray, p_fix: np.ndarray):
    dtype = fk.origin.dtype
    R_fix = jnp.asarray(R_fix, dtype=dtype)
    p_fix = jnp.asarray(p_fix, dtype=dtype)
    if parent < 0:
        batch = fk.origin.shape[:-2]
        return (
            jnp.broadcast_to(R_fix, batch + (3, 3)),
            jnp.broadcast_to(p_fix, batch + (3,)),
        )
    R_parent = fk.rotation[..., parent, :, :]
    p_parent = fk.origin[..., parent, :]
    return R_parent @ R_fix, (R_parent @ p_fix[..., None])[..., 0] + p_parent


@f32_matmuls
def link_positions(model: RobotModel, fk: FK, links) -> jnp.ndarray:
    """World positions of a list of named links, stacked (..., L, 3)."""
    return jnp.stack([link_transform(model, fk, l)[1] for l in links], axis=-2)


@f32_matmuls
def point_jacobian(
    model: RobotModel, fk: FK, point: jnp.ndarray, body: int
) -> jnp.ndarray:
    """Linear Jacobian (..., 3, J) of a world ``point`` rigidly attached to
    moving link ``body`` (the corrected version of the reference's linear
    frame Jacobian — raisim_dynamics.cpp:154-158 erroneously filled it from
    the rotational Jacobian; we implement the intended true linear map)."""
    dtype = fk.origin.dtype
    mask = jnp.asarray(model.ancestor[:, body], dtype=dtype)  # (J,)
    is_prismatic = jnp.asarray(model.joint_type == PRISMATIC, dtype=dtype)

    r = point[..., None, :] - fk.origin  # (..., J, 3)
    rotational = jnp.cross(fk.axis_world, r)  # (..., J, 3)
    columns = (
        is_prismatic[:, None] * fk.axis_world
        + (1.0 - is_prismatic)[:, None] * rotational
    )
    columns = columns * mask[:, None]
    return jnp.swapaxes(columns, -1, -2)  # (..., 3, J)


@f32_matmuls
def angular_jacobian(model: RobotModel, fk: FK, body: int) -> jnp.ndarray:
    """Angular Jacobian (..., 3, J) of moving link ``body``."""
    dtype = fk.origin.dtype
    mask = jnp.asarray(model.ancestor[:, body], dtype=dtype)
    is_revolute = jnp.asarray(model.joint_type == REVOLUTE, dtype=dtype)
    columns = fk.axis_world * (mask * is_revolute)[:, None]
    return jnp.swapaxes(columns, -1, -2)


@f32_matmuls
def com_positions(model: RobotModel, fk: FK) -> jnp.ndarray:
    """World COM position of every composite link (..., J, 3)."""
    dtype = fk.origin.dtype
    com = jnp.asarray(model.com, dtype=dtype)  # (J, 3)
    return (fk.rotation @ com[..., None])[..., 0] + fk.origin
