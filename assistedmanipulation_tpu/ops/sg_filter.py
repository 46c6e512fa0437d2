"""Savitzky-Golay smoothing of the optimal control sequence.

Reference behavior (src/controller/filter.cpp + vendored gram_savitzky_golay,
called from src/controller/mppi.cpp:424-440):

- Gram-polynomial least-squares convolution weights for a centered window of
  half-width ``w`` and polynomial order ``n`` (Gorry 1990 recurrences).
- A per-channel ``MovingExtendedWindow`` buffer of length steps + 2w + 1 that
  carries ``w`` values of *history* (smoothed controls from the previous MPPI
  update) before the current horizon start, and extends the horizon end by
  replicating the last control.
- Per update: ``trim(t)`` aligns the buffer with the new horizon start
  (filter.cpp:35-70), the horizon controls are written in
  (``add_measurement``, filter.cpp:72-90 + extend), then ``apply`` filters
  step-by-step; each filtered value is written back into the buffer *one slot
  before* the step it was extracted at (filter.cpp:104-110 computes
  ``lower_bound - 1``), so later steps see a mix of raw and smoothed values.
  That write-back makes the filter sequential in time; it runs as a small
  lax.scan over the horizon (the batch axis carries the parallelism).

The functional equivalent below carries the (dof, L) buffers explicitly in the
controller state. Times are kept implicitly: the horizon always occupies slots
[w, w+steps) and history slots [0, w), so the reference's time-based
``lower_bound`` searches reduce to static indices for monotonic horizons.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


# --- Gram polynomial convolution weights (host, trace-time) -----------------


def _gram_poly(i: int, m: int, k: int, s: int) -> float:
    """Gram polynomial recurrence (Gorry 1990)."""
    if k > 0:
        return (4.0 * k - 2.0) / (k * (2.0 * m - k + 1.0)) * (
            i * _gram_poly(i, m, k - 1, s) + s * _gram_poly(i, m, k - 1, s - 1)
        ) - ((k - 1.0) * (2.0 * m + k)) / (k * (2.0 * m - k + 1.0)) * _gram_poly(
            i, m, k - 2, s
        )
    return 1.0 if (k == 0 and s == 0) else 0.0


def _gen_fact(a: int, b: int) -> float:
    result = 1.0
    for j in range(a - b + 1, a + 1):
        result *= j
    return result


def gram_weights(m: int, t: int = 0, n: int = 2, s: int = 0) -> np.ndarray:
    """Least-squares convolution weights over window [-m, m] evaluated at
    point ``t`` for the ``s``-th derivative of an order-``n`` polynomial fit."""
    weights = np.zeros(2 * m + 1)
    for idx, i in enumerate(range(-m, m + 1)):
        w = 0.0
        for k in range(n + 1):
            w += (
                (2 * k + 1)
                * (_gen_fact(2 * m, k) / _gen_fact(2 * m + k + 1, k + 1))
                * _gram_poly(i, m, k, 0)
                * _gram_poly(t, m, k, s)
            )
        weights[idx] = w
    return weights


# --- Functional smoother ----------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SGSmoother:
    """Static smoother spec: horizon steps, window half-width, poly order."""

    steps: int
    window: int
    order: int

    @property
    def buffer_length(self) -> int:
        return self.steps + 2 * self.window + 1

    def weights(self, dtype=np.float64) -> np.ndarray:
        return gram_weights(self.window, 0, self.order, 0).astype(dtype)

    def init_buffer(self, control_dof: int, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros((control_dof, self.buffer_length), dtype=dtype)


def sg_trim(smoother: SGSmoother, buffer: jax.Array, shift: jax.Array) -> jax.Array:
    """Align the history buffer with a horizon start ``shift`` steps ahead.

    Equivalent to MovingExtendedWindow::trim (filter.cpp:35-70): rotate the
    buffer left by ``shift`` slots and extend the tail with the last retained
    value. ``shift`` is a traced int32 scalar in [0, steps].
    """
    length = smoother.buffer_length
    shift = jnp.clip(shift, 0, smoother.steps)
    cols = jnp.arange(length)
    source = jnp.minimum(cols + shift, length - 1)
    return buffer[:, source]


def sg_fill_horizon(
    smoother: SGSmoother, buffer: jax.Array, controls: jax.Array
) -> jax.Array:
    """Write the horizon controls into slots [w, w+steps) and extend the tail
    with the last control (add_measurement + extend, filter.cpp:72-116).

    controls: (steps, dof); buffer: (dof, L). Returns the filled buffer.
    """
    w, steps = smoother.window, smoother.steps
    horizon = controls.T  # (dof, steps)
    tail = jnp.repeat(horizon[:, -1:], w + 1, axis=1)
    return jnp.concatenate([buffer[:, :w], horizon, tail], axis=1)


@partial(jax.jit, static_argnums=0)
def sg_apply(smoother: SGSmoother, buffer: jax.Array):
    """Sequentially filter the horizon slots.

    For step i the window [i, i+2w] is convolved with the Gram weights and the
    result is written back at slot w+i-1 (the reference's lower_bound-1
    write-back, filter.cpp:104-110), so step i+1's window includes it.

    Returns (filtered (steps, dof), final buffer (dof, L)).
    """
    w = smoother.window
    weights = jnp.asarray(smoother.weights(), dtype=buffer.dtype)

    # Unrolled over the (static) horizon: every slice/write-back index is a
    # compile-time constant, so the 50-step recurrence lowers to a chain of
    # tiny fused dot/updates instead of a lax.scan whose per-iteration
    # dynamic-slice bookkeeping dominated the profiled cost (~1.8 us/step of
    # loop overhead on v5e for 12x21 windows).
    filtered_steps = []
    for i in range(smoother.steps):
        segment = jax.lax.slice_in_dim(buffer, i, i + 2 * w + 1, axis=1)
        filtered = segment @ weights  # (dof,)
        buffer = jax.lax.dynamic_update_slice_in_dim(
            buffer, filtered[:, None], w + i - 1, axis=1
        )
        filtered_steps.append(filtered)
    return jnp.stack(filtered_steps), buffer


def sg_smooth(smoother: SGSmoother, buffer: jax.Array, controls: jax.Array, shift):
    """Full per-update smoothing pass: trim -> fill -> apply.

    Mirrors the optimise() smoothing block (mppi.cpp:424-440). ``shift`` is
    the number of horizon steps the controller advanced since the last update.

    Returns (smoothed controls (steps, dof), updated buffer).
    """
    buffer = sg_trim(smoother, buffer, shift)
    buffer = sg_fill_horizon(smoother, buffer, controls)
    return sg_apply(smoother, buffer)
