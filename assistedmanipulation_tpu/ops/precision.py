"""Matmul-precision control for numerically sensitive device code.

TPU lowers f32 matmuls to bf16 MXU passes by default. That is the right
trade for the large batched kernels, but the small chained products on the
control path — 3x3 rotation composition in FK, the 12x12 CRBA mass matrix,
Kalman covariance updates — amplify bf16 rounding into instability: the
implicit-PD plant observably NaNs within ~40 steps at dt = 0.005 on v5e
(CPU, which uses true f32, is unaffected). These matrices are far too small
to be MXU-bound, so full precision costs nothing. The lanes/Pallas rollout
backends use unrolled scalar graphs on the VPU (true f32) and don't need
this.
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Decorator pinning full-f32 matmul precision inside ``fn``."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
