"""Batch-last ("lanes") rigid-body math with trace-time sparsity elimination.

The vmap formulation keeps per-rollout small matrices as (B, 12, 3, 3) /
(B, 12, 12) arrays whose minor dims are far below the TPU tile (8, 128) —
every 3x3 matmul pays massive padding and the rollout scan runs ~6x slower
than the flops warrant. This module restructures the whole dynamics step as
a *scalar graph over lane vectors*: each physical scalar (a rotation matrix
entry, a mass-matrix entry) is one (T,) array over the rollout batch, so
every operation is a full-width VPU elementwise op with zero padding.

Values in the graph are one of
- ``None``              — structural zero (eliminated at trace time),
- a Python float        — trace-time constant (folded),
- a (T,) jax array      — live lanes.

Because joint frames and axes are static model constants, most FK matrix
entries multiply by exact 0/±1 and fold away: the emitted XLA/Mosaic program
is the minimal FMA sequence a hand-written kernel would contain.

The same functions serve the pure-XLA batch-last rollout path (T = full
batch) and the Pallas fused kernel (T = tile) — reference semantics match
models/kinematics.py + models/dynamics.py, validated by tests against the
vmap path.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.model_data import PRISMATIC, REVOLUTE, RobotModel

# --- scalar-graph primitives -------------------------------------------------

EPS = 1e-12


def is_zero(a) -> bool:
    return a is None or (isinstance(a, (int, float)) and abs(a) < EPS)


def add(a, b):
    if is_zero(a):
        return None if is_zero(b) else b
    if is_zero(b):
        return a
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a + b
    return a + b


def sub(a, b):
    if is_zero(b):
        return None if is_zero(a) else a
    if is_zero(a):
        return -b
    return a - b


def mul(a, b):
    if is_zero(a) or is_zero(b):
        return None
    if isinstance(a, (int, float)) and abs(a - 1.0) < EPS:
        return b
    if isinstance(b, (int, float)) and abs(b - 1.0) < EPS:
        return a
    return a * b


def fma(acc, a, b):
    return add(acc, mul(a, b))


def dot3(a, b):
    return fma(fma(mul(a[0], b[0]), a[1], b[1]), a[2], b[2])


def cross3(a, b):
    return [
        sub(mul(a[1], b[2]), mul(a[2], b[1])),
        sub(mul(a[2], b[0]), mul(a[0], b[2])),
        sub(mul(a[0], b[1]), mul(a[1], b[0])),
    ]


def mat3_mul(A, B):
    """3x3 scalar-graph matrix product."""
    return [
        [fma(fma(mul(A[i][0], B[0][j]), A[i][1], B[1][j]), A[i][2], B[2][j])
         for j in range(3)]
        for i in range(3)
    ]


def mat3_vec(A, v):
    return [dot3(A[i], v) for i in range(3)]


def mat3_T(A):
    return [[A[j][i] for j in range(3)] for i in range(3)]


def acos(x):
    """f32-accurate arccos from VPU-native ops only (Mosaic has no acos
    lowering). Standard libm reduction: asin poly (Cephes asinf, ~1 ulp) on
    |x| <= 0.5, half-angle identity outside."""
    half_pi = math.pi / 2
    ax = jnp.abs(x)

    def asin_poly(v):  # |v| <= ~0.7071; v = sin(theta)
        z = v * v
        p = 4.2163199048e-2
        p = p * z + 2.4181311049e-2
        p = p * z + 4.5470025998e-2
        p = p * z + 7.4953002686e-2
        p = p * z + 1.6666752422e-1
        return v + v * z * p

    # |x| > 0.5: acos(|x|) = 2 asin(sqrt((1 - |x|) / 2)).
    s = jnp.sqrt(jnp.maximum(0.5 * (1.0 - ax), 0.0))
    acos_big = 2.0 * asin_poly(s)
    acos_small = half_pi - asin_poly(x)  # signed, |x| <= 0.5
    big = ax > 0.5
    # Reflect for negative x in the big branch: acos(-x) = pi - acos(x).
    return jnp.where(
        big, jnp.where(x < 0, math.pi - acos_big, acos_big), acos_small
    )


def materialize(value, like: jax.Array) -> jax.Array:
    """Turn a graph value into a concrete (T,) array."""
    if value is None:
        return jnp.zeros_like(like)
    if isinstance(value, (int, float)):
        return jnp.full_like(like, value)
    return value


def static_mat(M: np.ndarray):
    """3x3 numpy matrix -> scalar graph of floats/zeros."""
    return [
        [None if abs(M[i, j]) < EPS else float(M[i, j]) for j in range(3)]
        for i in range(3)
    ]


def static_vec(v: np.ndarray):
    return [None if abs(x) < EPS else float(x) for x in np.asarray(v)]


# --- forward kinematics ------------------------------------------------------


class LaneFK:
    """Per-link world transforms as scalar graphs.

    rotation[i]: 3x3 graph; origin[i]: 3 graph; axis_world[i]: 3 graph.
    """

    __slots__ = ("rotation", "origin", "axis_world")

    def __init__(self, rotation, origin, axis_world):
        self.rotation = rotation
        self.origin = origin
        self.axis_world = axis_world


def lane_fk(model: RobotModel, q) -> LaneFK:
    """Forward kinematics over lanes. ``q``: list of 12 (T,) arrays (or a
    (12, T) array). Matches models/kinematics.forward_kinematics."""
    if hasattr(q, "shape"):
        q = [q[i] for i in range(model.n_joints)]

    rotations, origins, axes = [], [], []
    for i in range(model.n_joints):
        R_off = static_mat(model.rotation[i])
        p_off = static_vec(model.translation[i])
        parent = int(model.parent[i])
        if parent < 0:
            R_parent = static_mat(np.eye(3))
            p_parent = [None, None, None]
        else:
            R_parent, p_parent = rotations[parent], origins[parent]

        # Joint frame before motion.
        R_joint = mat3_mul(R_parent, R_off)
        p_joint = [add(mat3_vec(R_parent, p_off)[k], p_parent[k]) for k in range(3)]

        axis = np.asarray(model.axis[i], dtype=np.float64)
        axis = axis / np.linalg.norm(axis)
        qi = q[i]

        if int(model.joint_type[i]) == REVOLUTE:
            # All reference joints rotate about z in their joint frame, but
            # handle the general static axis via Rodrigues with static K.
            c, s = jnp.cos(qi), jnp.sin(qi)
            K = np.array(
                [
                    [0, -axis[2], axis[1]],
                    [axis[2], 0, -axis[0]],
                    [-axis[1], axis[0], 0],
                ]
            )
            K2 = K @ K
            R_motion = [
                [
                    add(
                        add(1.0 if a == b else None, mul(s, None if abs(K[a, b]) < EPS else float(K[a, b]))),
                        mul(sub(1.0, c), None if abs(K2[a, b]) < EPS else float(K2[a, b])),
                    )
                    for b in range(3)
                ]
                for a in range(3)
            ]
            R_world = mat3_mul(R_joint, R_motion)
            p_world = p_joint
        else:  # prismatic
            R_world = R_joint
            axis_in_joint = static_vec(axis)
            step = mat3_vec(R_joint, axis_in_joint)
            p_world = [add(p_joint[k], mul(qi, step[k])) for k in range(3)]

        a_world = mat3_vec(R_joint, static_vec(axis))
        rotations.append(R_world)
        origins.append(p_world)
        axes.append(a_world)

    return LaneFK(rotations, origins, axes)


def lane_frame(model: RobotModel, fk: LaneFK, table: dict, name: str):
    """World (R graph, p graph) of a named frame from ``model.frames`` or
    ``model.link_frames``."""
    parent, R_fix, p_fix = table[name]
    if parent < 0:
        return static_mat(R_fix), static_vec(p_fix)
    R_parent = fk.rotation[parent]
    p_parent = fk.origin[parent]
    R = mat3_mul(R_parent, static_mat(R_fix))
    p = [add(mat3_vec(R_parent, static_vec(p_fix))[k], p_parent[k]) for k in range(3)]
    return R, p


def lane_point_jacobian(model: RobotModel, fk: LaneFK, point, body: int):
    """Linear point Jacobian columns (12 entries of 3-graphs); masked by
    ancestry at trace time (static sparsity)."""
    columns = []
    for i in range(model.n_joints):
        if not model.ancestor[i, body]:
            columns.append([None, None, None])
            continue
        if int(model.joint_type[i]) == PRISMATIC:
            columns.append(fk.axis_world[i])
        else:
            r = [sub(point[k], fk.origin[i][k]) for k in range(3)]
            columns.append(cross3(fk.axis_world[i], r))
    return columns  # [joint][xyz]


def lane_angular_jacobian(model: RobotModel, fk: LaneFK, body: int):
    columns = []
    for i in range(model.n_joints):
        if not model.ancestor[i, body] or int(model.joint_type[i]) == PRISMATIC:
            columns.append([None, None, None])
        else:
            columns.append(fk.axis_world[i])
    return columns


# --- mass matrix (CRBA with composite inertias at the world origin) ----------


def _spatial_inertia(model: RobotModel, fk: LaneFK, k: int):
    """Body k's 6x6 spatial inertia about the world origin as a scalar graph
    (see models/dynamics.spatial_inertias)."""
    m = float(model.mass[k])
    R = fk.rotation[k]
    com_local = static_vec(model.com[k])
    com = [add(mat3_vec(R, com_local)[a], fk.origin[k][a]) for a in range(3)]

    # I_com world = R I_local R^T (I_local static symmetric).
    I_local = static_mat(model.inertia[k])
    I_world = mat3_mul(mat3_mul(R, I_local), mat3_T(R))

    cx = [
        [None, mul(-1.0, com[2]), com[1]],
        [com[2], None, mul(-1.0, com[0])],
        [mul(-1.0, com[1]), com[0], None],
    ]
    cxT = mat3_T(cx)
    # upper-left: I_com + m cx cx^T; upper-right: m cx; lower-right: m I.
    cx_cxT = mat3_mul(cx, cxT)
    UL = [[add(I_world[a][b], mul(m, cx_cxT[a][b])) for b in range(3)] for a in range(3)]
    UR = [[mul(m, cx[a][b]) for b in range(3)] for a in range(3)]
    LL = [[mul(m, cxT[a][b]) for b in range(3)] for a in range(3)]
    LR = [[m if a == b else None for b in range(3)] for a in range(3)]

    inertia = [[None] * 6 for _ in range(6)]
    for a in range(3):
        for b in range(3):
            inertia[a][b] = UL[a][b]
            inertia[a][b + 3] = UR[a][b]
            inertia[a + 3][b] = LL[a][b]
            inertia[a + 3][b + 3] = LR[a][b]
    return inertia


def _motion_subspace(model: RobotModel, fk: LaneFK, i: int):
    """S_i = [axis; origin x axis] (revolute) or [0; axis] (prismatic)."""
    if int(model.joint_type[i]) == PRISMATIC:
        return [None, None, None] + fk.axis_world[i]
    lin = cross3(fk.origin[i], fk.axis_world[i])
    return fk.axis_world[i] + lin


def lane_mass_matrix(model: RobotModel, fk: LaneFK):
    """M(q) as a 12x12 scalar graph via CRBA: composite inertias accumulate
    leaf-to-root (no transforms needed at a common origin), then
    M[i, j] = S_j^T (I^c_i S_i) for j an ancestor-or-self of i."""
    n = model.n_joints
    composites = [_spatial_inertia(model, fk, k) for k in range(n)]
    # children lists from the static parent array; accumulate leaf -> root.
    for k in reversed(range(n)):
        parent = int(model.parent[k])
        if parent >= 0:
            for a in range(6):
                for b in range(6):
                    composites[parent][a][b] = add(
                        composites[parent][a][b], composites[k][a][b]
                    )

    subspaces = [_motion_subspace(model, fk, i) for i in range(n)]

    M = [[None] * n for _ in range(n)]
    for i in range(n):
        Ic = composites[i]
        Si = subspaces[i]
        # F = I^c_i S_i (6-graph).
        F = [None] * 6
        for a in range(6):
            acc = None
            for b in range(6):
                acc = fma(acc, Ic[a][b], Si[b])
            F[a] = acc
        # Diagonal + ancestor entries.
        j = i
        while j >= 0:
            Sj = subspaces[j]
            acc = None
            for a in range(6):
                acc = fma(acc, Sj[a], F[a])
            M[i][j] = acc
            M[j][i] = acc
            j = int(model.parent[j])
    return M


# --- linear algebra over lanes ----------------------------------------------


def lane_cholesky_solve(M, rhs, like: jax.Array):
    """Solve M x = rhs for a symmetric positive-definite 12x12 scalar-graph
    matrix, unrolled Cholesky over lanes. ``rhs``: 12-graph. Returns 12 list
    of (T,) arrays."""
    n = len(M)
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        acc = materialize(M[j][j], like)
        for k in range(j):
            if L[j][k] is not None:
                acc = acc - L[j][k] * L[j][k]
        diag = jnp.sqrt(acc)
        inv_diag = 1.0 / diag
        L[j][j] = diag
        for i in range(j + 1, n):
            acc = M[i][j]
            s = None
            for k in range(j):
                s = fma(s, L[i][k], L[j][k])
            value = sub(acc, s)
            if value is None:
                L[i][j] = None
            else:
                L[i][j] = materialize(value, like) * inv_diag

    # Forward substitution L y = rhs.
    y = [None] * n
    for i in range(n):
        acc = rhs[i]
        s = None
        for k in range(i):
            s = fma(s, L[i][k], y[k])
        value = sub(acc, s)
        y[i] = materialize(value, like) / L[i][i]

    # Back substitution L^T x = y.
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        s = None
        for k in range(i + 1, n):
            s = fma(s, L[k][i], x[k])
        value = sub(acc, s)
        x[i] = materialize(value, like) / L[i][i]
    return x
