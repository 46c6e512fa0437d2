"""Kinematics validation.

Oracle 1: an independent numpy FK hard-coded from the published
Franka-Ridgeback URDF chain (4x4 homogeneous transforms) — independent of
both the extraction script and the jnp implementation, so agreement
cross-validates the whole pipeline.

Oracle 2: finite differences validate the analytic Jacobians.
"""

import numpy as np
import jax
import jax.numpy as jnp

from assistedmanipulation_tpu.models import kinematics as kin
from assistedmanipulation_tpu.models.model_data import frankaridgeback_model


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[0 + c, -s, 0], [s, c, 0], [0, 0, 1]])


def _T(R=None, p=(0, 0, 0)):
    T = np.eye(4)
    if R is not None:
        T[:3, :3] = R
    T[:3, 3] = p
    return T


def oracle_grasp_pose(q):
    """Hand-coded chain, numbers straight from the published URDF:
    world -> x/y sliders -> pivot -> mid_mount (z 0.28) -> arm mount
    (0.295, 0.005, 0.445) -> panda joints (Franka FR3 kinematics) ->
    hand (z 0.107, yaw -pi/4) -> grasp (z 0.095)."""
    T = _T(p=(q[0], 0, 0)) @ _T(p=(0, q[1], 0)) @ _T(_rot_z(q[2]))
    T = T @ _T(p=(0, 0, 0.28)) @ _T(p=(0.295, 0.005, 0.445))
    # Panda joint origins (rpy, xyz) from the URDF, each followed by a z-rev.
    chain = [
        ((0.0, 0.0, 0.0), (0, 0, 0.333)),
        ((-np.pi / 2, 0.0, 0.0), (0, 0, 0)),
        ((np.pi / 2, 0.0, 0.0), (0, -0.316, 0)),
        ((np.pi / 2, 0.0, 0.0), (0.0825, 0, 0)),
        ((-np.pi / 2, 0.0, 0.0), (-0.0825, 0.384, 0)),
        ((np.pi / 2, 0.0, 0.0), (0, 0, 0)),
        ((np.pi / 2, 0.0, 0.0), (0.088, 0, 0)),
    ]
    for i, ((roll, _, _), xyz) in enumerate(chain):
        T = T @ _T(_rot_x(roll), xyz) @ _T(_rot_z(q[3 + i]))
    # link8 (z 0.107) -> hand (yaw -pi/4) -> grasp (z 0.095)
    T = T @ _T(p=(0, 0, 0.107)) @ _T(_rot_z(-np.pi / 4)) @ _T(p=(0, 0, 0.095))
    return T


def random_q(rng):
    q = rng.uniform(-1.0, 1.0, size=12)
    q[10:] = rng.uniform(0.0, 0.04, size=2)
    return q


def test_fk_matches_urdf_oracle(rng):
    model = frankaridgeback_model()
    for _ in range(5):
        q = random_q(rng)
        fk = kin.forward_kinematics(model, jnp.asarray(q, dtype=jnp.float64))
        R, p = kin.frame_transform(model, fk, "panda_grasp_joint")
        T = oracle_grasp_pose(q)
        np.testing.assert_allclose(np.asarray(p), T[:3, 3], atol=1e-9)
        np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-9)


def test_fk_zero_configuration(rng):
    """At q=0 the arm points straight up: grasp at known closed-form point."""
    model = frankaridgeback_model()
    fk = kin.forward_kinematics(model, jnp.zeros(12, dtype=jnp.float64))
    _, p = kin.frame_transform(model, fk, "panda_grasp_joint")
    T = oracle_grasp_pose(np.zeros(12))
    np.testing.assert_allclose(np.asarray(p), T[:3, 3], atol=1e-12)
    # arm mount frame height = 0.28 + 0.445
    _, p_mount = kin.frame_transform(model, fk, "arm_mount_joint")
    np.testing.assert_allclose(np.asarray(p_mount), [0.295, 0.005, 0.725], atol=1e-12)


def test_point_jacobian_finite_difference(rng):
    model = frankaridgeback_model()
    q = random_q(rng)

    def grasp_position(q_):
        fk = kin.forward_kinematics(model, q_)
        return kin.frame_transform(model, fk, "panda_grasp_joint")[1]

    q_jax = jnp.asarray(q, dtype=jnp.float64)
    fk = kin.forward_kinematics(model, q_jax)
    point = grasp_position(q_jax)
    J = kin.point_jacobian(model, fk, point, body=9)

    J_ad = jax.jacfwd(grasp_position)(q_jax)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-9)


def test_angular_jacobian_finite_difference(rng):
    model = frankaridgeback_model()
    q = random_q(rng)
    q_jax = jnp.asarray(q, dtype=jnp.float64)

    def link7_rotation(q_):
        fk = kin.forward_kinematics(model, q_)
        return fk.rotation[9]

    fk = kin.forward_kinematics(model, q_jax)
    J_ang = kin.angular_jacobian(model, fk, body=9)

    dR = jax.jacfwd(link7_rotation)(q_jax)  # (3, 3, 12)
    R = np.asarray(fk.rotation[9])
    for i in range(12):
        omega_hat = np.asarray(dR[..., i]) @ R.T  # skew(omega_i)
        omega = np.array(
            [omega_hat[2, 1], omega_hat[0, 2], omega_hat[1, 0]]
        )
        np.testing.assert_allclose(np.asarray(J_ang[:, i]), omega, atol=1e-9)


def test_link_positions_batched(rng):
    model = frankaridgeback_model()
    q = np.stack([random_q(rng) for _ in range(4)])
    fk = kin.forward_kinematics(model, jnp.asarray(q, dtype=jnp.float64))
    links = ["pivot", "panda_link3", "panda_link7"]
    positions = kin.link_positions(model, fk, links)
    assert positions.shape == (4, 3, 3)
    # Batched result matches per-sample.
    fk0 = kin.forward_kinematics(model, jnp.asarray(q[0], dtype=jnp.float64))
    single = kin.link_positions(model, fk0, links)
    np.testing.assert_allclose(np.asarray(positions[0]), np.asarray(single), atol=1e-12)
