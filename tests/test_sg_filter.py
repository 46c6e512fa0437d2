"""Savitzky-Golay smoother tests: Gram weights against known closed forms and
a NumPy oracle of the reference's MovingExtendedWindow apply semantics
(src/controller/filter.cpp, gram_savitzky_golay.cpp)."""

import numpy as np
import jax.numpy as jnp

from assistedmanipulation_tpu.ops.sg_filter import (
    SGSmoother,
    gram_weights,
    sg_smooth,
)


def test_gram_weights_order1_is_moving_average():
    """An order-0/1 centered SG filter is the simple moving average."""
    for order in (0, 1):
        weights = gram_weights(3, 0, order, 0)
        np.testing.assert_allclose(weights, np.full(7, 1.0 / 7.0), atol=1e-12)


def test_gram_weights_order2_window2_known_values():
    """Classic 5-point quadratic SG kernel: (-3, 12, 17, 12, -3)/35."""
    weights = gram_weights(2, 0, 2, 0)
    np.testing.assert_allclose(
        weights, np.array([-3.0, 12.0, 17.0, 12.0, -3.0]) / 35.0, atol=1e-12
    )


def _oracle_apply(buffer, steps, window, weights):
    """NumPy oracle of the sequential apply pass with the reference's
    lower_bound-1 write-back (filter.cpp:104-110, 165-173)."""
    buffer = buffer.copy()
    dof = buffer.shape[0]
    out = np.zeros((steps, dof))
    for i in range(steps):
        for d in range(dof):
            segment = buffer[d, i : i + 2 * window + 1]
            value = segment @ weights
            out[i, d] = value
            buffer[d, window + i - 1] = value
    return out, buffer


def _oracle_full(prev_buffer, controls, shift, steps, window, weights):
    length = prev_buffer.shape[1]
    # trim: rotate left by shift with tail clamp
    source = np.minimum(np.arange(length) + shift, length - 1)
    buffer = prev_buffer[:, source]
    # fill horizon + extension
    buffer[:, window : window + steps] = controls.T
    buffer[:, window + steps :] = controls.T[:, -1:]
    return _oracle_apply(buffer, steps, window, weights)


def test_sg_smooth_matches_oracle():
    rng = np.random.default_rng(0)
    steps, window, order, dof = 10, 3, 1, 2
    smoother = SGSmoother(steps=steps, window=window, order=order)
    weights = smoother.weights(np.float64)

    prev = rng.normal(size=(dof, smoother.buffer_length))
    controls = rng.normal(size=(steps, dof))
    shift = 4

    expected, expected_buffer = _oracle_full(
        prev, controls, shift, steps, window, weights
    )

    filtered, buffer = sg_smooth(
        smoother,
        jnp.asarray(prev, dtype=jnp.float32),
        jnp.asarray(controls, dtype=jnp.float32),
        jnp.asarray(shift),
    )
    np.testing.assert_allclose(np.asarray(filtered), expected, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(buffer), expected_buffer, rtol=2e-5, atol=2e-5)


def test_sg_smooth_constant_signal_is_identity():
    smoother = SGSmoother(steps=8, window=2, order=1)
    buffer = jnp.full((3, smoother.buffer_length), 5.0)
    controls = jnp.full((8, 3), 5.0)
    filtered, _ = sg_smooth(smoother, buffer, controls, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(filtered), 5.0, rtol=1e-6)
