"""Rotation utility tests, including the reference's angles round-trip test
(src/test/case/angles.hpp:27-35: ZXZ euler -> quaternion -> euler)."""

import numpy as np
import jax.numpy as jnp

from assistedmanipulation_tpu.ops import rotations as rot


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotate_matches_matrix(rng):
    q = jnp.asarray(random_quats(rng, 16))
    v = jnp.asarray(rng.normal(size=(16, 3)))
    rotated = rot.quat_rotate(q, v)
    via_matrix = jnp.einsum("nij,nj->ni", rot.quat_to_matrix(q), v)
    np.testing.assert_allclose(np.asarray(rotated), np.asarray(via_matrix), atol=1e-5)


def test_matrix_quat_round_trip(rng):
    q = random_quats(rng, 32)
    q = np.where(q[:, :1] < 0, -q, q)  # canonical sign
    m = rot.quat_to_matrix(jnp.asarray(q))
    q2 = rot.matrix_to_quat(m)
    np.testing.assert_allclose(np.asarray(q2), q, atol=1e-5)


def test_axis_angle():
    q = rot.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.asarray(np.pi / 2))
    v = rot.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [0.0, 1.0, 0.0], atol=1e-6)


def test_euler_zxz_round_trip():
    """The reference angles test: x = (0, 0, pi/8) must round-trip. With a
    zero middle angle the decomposition is degenerate and the z rotations
    merge; accept the merged representation like Eigen does."""
    euler = jnp.array([0.3, 0.5, 0.7])
    q = rot.euler_zxz_to_quat(euler)
    back = rot.quat_to_euler_zxz(q)
    q2 = rot.euler_zxz_to_quat(back)
    # Compare rotations, not raw angles (representation may differ).
    np.testing.assert_allclose(
        np.asarray(rot.quat_to_matrix(q)), np.asarray(rot.quat_to_matrix(q2)), atol=1e-5
    )

    degenerate = jnp.array([0.0, 0.0, np.pi / 8])
    q = rot.euler_zxz_to_quat(degenerate)
    back = rot.quat_to_euler_zxz(q)
    q2 = rot.euler_zxz_to_quat(back)
    np.testing.assert_allclose(
        np.asarray(rot.quat_to_matrix(q)), np.asarray(rot.quat_to_matrix(q2)), atol=1e-5
    )


def test_slerp_endpoints(rng):
    q0 = jnp.asarray(random_quats(rng, 8))
    q1 = jnp.asarray(random_quats(rng, 8))
    np.testing.assert_allclose(
        np.asarray(rot.quat_slerp(q0, q1, 0.0)), np.asarray(q0), atol=1e-6
    )
    end = rot.quat_slerp(q0, q1, 1.0)
    # sign may flip; compare rotations
    np.testing.assert_allclose(
        np.asarray(rot.quat_to_matrix(end)),
        np.asarray(rot.quat_to_matrix(q1)),
        atol=1e-5,
    )


def test_from_two_vectors(rng):
    a = jnp.asarray(rng.normal(size=(8, 3)))
    b = jnp.asarray(rng.normal(size=(8, 3)))
    q = rot.quat_from_two_vectors(a, b)
    rotated = rot.quat_rotate(q, a / jnp.linalg.norm(a, axis=-1, keepdims=True))
    expected = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(rotated), np.asarray(expected), atol=1e-5)


def test_euler_difference_wraps():
    a = jnp.asarray([0.1, 3.0, -3.0, 0.0])
    b = jnp.asarray([-0.1, -3.0, 3.0, 2 * np.pi])
    d = np.asarray(rot.euler_difference(a, b))
    np.testing.assert_allclose(
        d, [-0.2, 2 * np.pi - 6.0, 6.0 - 2 * np.pi, 0.0], atol=1e-12
    )
    # Always the geodesic: |d| <= pi.
    assert (np.abs(d) <= np.pi + 1e-12).all()
