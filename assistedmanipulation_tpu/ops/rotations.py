"""Quaternion / rotation utilities (batched, jnp).

Conventions: quaternions are (w, x, y, z) unit arrays of shape (..., 4).
Covers the reference's angle helpers (src/controller/eigen.hpp:18-33: ZXZ
euler <-> quaternion) plus the rotation machinery the kinematics layer needs
(axis-angle application, quaternion from rotation matrix, slerp for the
orientation trajectories at src/controller/trajectory.cpp:289-325).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_multiply(q1, q2):
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_from_axis_angle(axis, angle):
    """Unit quaternion for a rotation of ``angle`` about (unnormalized) ``axis``."""
    axis = jnp.asarray(axis, dtype=jnp.result_type(float))
    angle = jnp.asarray(angle)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = angle[..., None] / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def quat_to_matrix(q):
    """Rotation matrix (..., 3, 3) from quaternion (..., 4)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1
    )
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1
    )
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quat(m):
    """Quaternion (w, x, y, z) from rotation matrix (..., 3, 3).

    Branch-free Shepperd-style selection of the numerically best row.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    # Per-branch scale factors t_k; the numerically stable branch maximizes t.
    t0 = 1.0 + tr
    t1 = 1.0 + m00 - m11 - m22
    t2 = 1.0 - m00 + m11 - m22
    t3 = 1.0 - m00 - m11 + m22
    scales = jnp.stack([t0, t1, t2, t3], axis=-1)

    # Candidate quaternions (w, x, y, z), each valid when its t_k > 0.
    c0 = jnp.stack([t0, m21 - m12, m02 - m20, m10 - m01], -1)
    c1 = jnp.stack([m21 - m12, t1, m01 + m10, m02 + m20], -1)
    c2 = jnp.stack([m02 - m20, m01 + m10, t2, m12 + m21], -1)
    c3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, t3], -1)
    candidates = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4 branch, 4 comp)

    choice = jnp.argmax(scales, axis=-1)
    best_t = jnp.take_along_axis(scales, choice[..., None], axis=-1)
    gather = jnp.broadcast_to(
        choice[..., None, None], choice.shape + (1, 4)
    )
    q = jnp.take_along_axis(candidates, gather, axis=-2)[..., 0, :]
    q = q * (0.5 / jnp.sqrt(jnp.maximum(best_t, 1e-12)))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize sign (w >= 0).
    return jnp.where(q[..., :1] < 0, -q, q)


def euler_zxz_to_quat(euler):
    """ZXZ euler angles -> quaternion (reference eigen.hpp:26-33)."""
    a, b, c = euler[..., 0], euler[..., 1], euler[..., 2]
    qz1 = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), a)
    qx = quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), b)
    qz2 = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), c)
    return quat_multiply(quat_multiply(qz1, qx), qz2)


def quat_to_euler_zxz(q):
    """Quaternion -> ZXZ euler angles, matching Eigen's eulerAngles(2, 0, 2)
    range conventions (first angle in [0, pi]) used at reference
    eigen.hpp:18-21."""
    m = quat_to_matrix(q)
    # Eigen eulerAngles(2,0,2): R = Rz(a) * Rx(b) * Rz(c), a in [0, pi].
    b = jnp.arccos(jnp.clip(m[..., 2, 2], -1.0, 1.0))
    sin_b = jnp.sin(b)
    degenerate = jnp.abs(sin_b) < 1e-9
    a = jnp.where(
        degenerate,
        jnp.arctan2(m[..., 1, 0], m[..., 0, 0]),
        jnp.arctan2(m[..., 0, 2], -m[..., 1, 2]),
    )
    c = jnp.where(
        degenerate,
        jnp.zeros_like(b),
        jnp.arctan2(m[..., 2, 0], m[..., 2, 1]),
    )
    # Eigen maps the leading angle into [0, pi] by flipping all three.
    flip = a < 0
    a = jnp.where(flip, a + jnp.pi, a)
    b = jnp.where(flip, -b, b)
    c = jnp.where(flip, c + jnp.pi, c)
    # Degenerate case: rotation purely about z, split angle into a only.
    a = jnp.where(degenerate & (a < 0), a + 2 * jnp.pi, a)
    return jnp.stack([a, b, c], axis=-1)


def quat_slerp(q0, q1, t):
    """Spherical linear interpolation (trajectory.cpp:318-325).

    ``t`` broadcasts against the quaternions' batch shape: a (...,) time
    batch with single (4,) endpoints yields (..., 4) (trajectory playback)."""
    t = jnp.asarray(t)[..., None]
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    out = w0 * q0 + w1 * q1
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def quat_from_two_vectors(a, b):
    """Quaternion rotating unit direction of ``a`` onto ``b`` (Eigen
    FromTwoVectors, used by trajectory.cpp:178-181, 283-285)."""
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    cross = jnp.cross(a, b)
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    w = 1.0 + dot
    # Antiparallel fallback: rotate pi about any orthogonal axis.
    orthogonal = jnp.where(
        jnp.abs(a[..., :1]) < 0.9,
        jnp.cross(a, jnp.array([1.0, 0.0, 0.0])),
        jnp.cross(a, jnp.array([0.0, 1.0, 0.0])),
    )
    antiparallel = w[..., 0] < 1e-8
    q = jnp.concatenate([w, cross], axis=-1)
    q_anti = jnp.concatenate([jnp.zeros_like(w), orthogonal], axis=-1)
    q = jnp.where(antiparallel[..., None], q_anti, q)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def euler_difference(a, b):
    """Per-axis wrapped angular difference b - a in (-pi, pi] — the working
    version of the reference's empty euler_difference (eigen.hpp:35-37)."""
    d = jnp.asarray(b) - jnp.asarray(a)
    return d - 2.0 * jnp.pi * jnp.round(d / (2.0 * jnp.pi))
