"""Scalar cost primitives as branch-free, batched jnp expressions.

Re-implements the reference's functor cost family
(reference: src/controller/cost.hpp:10-167) for device execution:

- ``QuadraticCost``:          c0 + c1*|v| + c2*v^2
- ``RightInverseBarrier``:    scale/(upper-v) clamped to max; quadratic past bound
- ``LeftInverseBarrier``:     scale/(v-lower) clamped to max; quadratic past bound
- ``UpperLogBarrier``:        min(scale*(-log10(upper-v)+offset), 0); max past bound
- ``LowerLogBarrier``:        min(scale*(-log10(v-lower)+offset), 0); max past bound

Everything is written with ``jnp.where`` (never Python branches) so the same
expression evaluates correctly for batched arrays inside jitted rollouts, and
so NaN inputs propagate to NaN costs (the MPPI weighting layer relies on NaN
poisoning semantics, reference src/controller/mppi.cpp:331-334).

Two-channel decomposition (TPU adaptation): the reference accumulates costs
in float64, where a 1e10 barrier saturation and a 1e-2 objective difference
coexist (eps(3e11) ~ 6e-5). In float32 the saturation constant destroys the
smooth signal (eps(3e11) ~ 3e4). Each barrier therefore also exposes
``decomposed(value) -> (saturations, smooth)``: a count of maximum_cost
saturations and the residual smooth cost. The MPPI weighting layer
accumulates the channels separately and composes them lexicographically
(mppi.py), which reproduces the reference's float64 weighting bit-for-float32
while keeping full precision on the smooth channel.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

MAXIMUM_COST_DEFAULT = 1e10


@dataclasses.dataclass
class QuadraticCost:
    """c0 + c1*|v| + c2*v^2 (reference cost.hpp:10-37)."""

    constant_cost: float = 0.0
    linear_cost: float = 0.0
    quadratic_cost: float = 0.0

    def __call__(self, value):
        value = jnp.asarray(value)
        return (
            self.constant_cost
            + self.linear_cost * jnp.abs(value)
            + self.quadratic_cost * value * value
        )


@dataclasses.dataclass
class RightInverseBarrier:
    """Inverse barrier against an upper bound (reference cost.hpp:43-68).

    value <  upper: min(scale / (upper - value), maximum_cost)
    value >= upper: maximum_cost + scale * (value - upper)^2
    """

    upper_bound: float = 0.0
    scale: float = 0.0
    maximum_cost: float = MAXIMUM_COST_DEFAULT

    def __call__(self, value):
        value = jnp.asarray(value)
        gap = self.upper_bound - value
        # Guard the division so the "inside" branch never produces inf/NaN for
        # out-of-bound inputs; jnp.where evaluates both branches.
        safe_gap = jnp.where(gap > 0, gap, 1.0)
        inside = jnp.minimum(self.scale / safe_gap, self.maximum_cost)
        outside = self.maximum_cost + self.scale * (value - self.upper_bound) ** 2
        result = jnp.where(value >= self.upper_bound, outside, inside)
        return jnp.where(jnp.isnan(value), jnp.nan, result)

    def decomposed(self, value):
        """(saturations, smooth): value >= bound -> (1, scale*excess^2);
        inside with the 1/gap clamp hit -> (1, 0); else (0, scale/gap)."""
        value = jnp.asarray(value)
        gap = self.upper_bound - value
        safe_gap = jnp.where(gap > 0, gap, 1.0)
        raw = self.scale / safe_gap
        outside = value >= self.upper_bound
        clamped = raw >= self.maximum_cost
        saturations = jnp.where(outside | clamped, 1.0, 0.0)
        smooth = jnp.where(
            outside,
            self.scale * (value - self.upper_bound) ** 2,
            jnp.where(clamped, 0.0, raw),
        )
        nan = jnp.isnan(value)
        return (
            jnp.where(nan, jnp.nan, saturations),
            jnp.where(nan, jnp.nan, smooth),
        )


@dataclasses.dataclass
class LeftInverseBarrier:
    """Inverse barrier against a lower bound (reference cost.hpp:74-98)."""

    lower_bound: float = 0.0
    scale: float = 0.0
    maximum_cost: float = MAXIMUM_COST_DEFAULT

    def __call__(self, value):
        value = jnp.asarray(value)
        gap = value - self.lower_bound
        safe_gap = jnp.where(gap > 0, gap, 1.0)
        inside = jnp.minimum(self.scale / safe_gap, self.maximum_cost)
        outside = self.maximum_cost + self.scale * (self.lower_bound - value) ** 2
        result = jnp.where(value <= self.lower_bound, outside, inside)
        return jnp.where(jnp.isnan(value), jnp.nan, result)

    def decomposed(self, value):
        """(saturations, smooth) — see RightInverseBarrier.decomposed."""
        value = jnp.asarray(value)
        gap = value - self.lower_bound
        safe_gap = jnp.where(gap > 0, gap, 1.0)
        raw = self.scale / safe_gap
        outside = value <= self.lower_bound
        clamped = raw >= self.maximum_cost
        saturations = jnp.where(outside | clamped, 1.0, 0.0)
        smooth = jnp.where(
            outside,
            self.scale * (self.lower_bound - value) ** 2,
            jnp.where(clamped, 0.0, raw),
        )
        nan = jnp.isnan(value)
        return (
            jnp.where(nan, jnp.nan, saturations),
            jnp.where(nan, jnp.nan, smooth),
        )


@dataclasses.dataclass
class UpperLogBarrier:
    """Logarithmic barrier against an upper bound (reference cost.hpp:105-133).

    value <  upper: min(scale * (-log10(upper - value) + offset), 0)
    value >= upper: maximum_cost
    """

    upper_bound: float = 0.0
    scale: float = 0.0
    offset: float = 0.0
    maximum_cost: float = MAXIMUM_COST_DEFAULT

    def __call__(self, value):
        value = jnp.asarray(value)
        gap = self.upper_bound - value
        safe_gap = jnp.where(gap > 0, gap, 1.0)
        inside = jnp.minimum(
            self.scale * (-jnp.log10(safe_gap) + self.offset), 0.0
        )
        result = jnp.where(value >= self.upper_bound, self.maximum_cost, inside)
        return jnp.where(jnp.isnan(value), jnp.nan, result)

    def decomposed(self, value):
        value = jnp.asarray(value)
        gap = self.upper_bound - value
        safe_gap = jnp.where(gap > 0, gap, 1.0)
        inside = jnp.minimum(
            self.scale * (-jnp.log10(safe_gap) + self.offset), 0.0
        )
        outside = value >= self.upper_bound
        nan = jnp.isnan(value)
        saturations = jnp.where(outside, 1.0, 0.0)
        smooth = jnp.where(outside, 0.0, inside)
        return (
            jnp.where(nan, jnp.nan, saturations),
            jnp.where(nan, jnp.nan, smooth),
        )


@dataclasses.dataclass
class LowerLogBarrier:
    """Logarithmic barrier against a lower bound (reference cost.hpp:139-166)."""

    lower_bound: float = 0.0
    scale: float = 0.0
    offset: float = 0.0
    maximum_cost: float = MAXIMUM_COST_DEFAULT

    def __call__(self, value):
        value = jnp.asarray(value)
        gap = value - self.lower_bound
        safe_gap = jnp.where(gap > 0, gap, 1.0)
        inside = jnp.minimum(
            self.scale * (-jnp.log10(safe_gap) + self.offset), 0.0
        )
        result = jnp.where(value <= self.lower_bound, self.maximum_cost, inside)
        return jnp.where(jnp.isnan(value), jnp.nan, result)

    def decomposed(self, value):
        value = jnp.asarray(value)
        gap = value - self.lower_bound
        safe_gap = jnp.where(gap > 0, gap, 1.0)
        inside = jnp.minimum(
            self.scale * (-jnp.log10(safe_gap) + self.offset), 0.0
        )
        outside = value <= self.lower_bound
        nan = jnp.isnan(value)
        saturations = jnp.where(outside, 1.0, 0.0)
        smooth = jnp.where(outside, 0.0, inside)
        return (
            jnp.where(nan, jnp.nan, saturations),
            jnp.where(nan, jnp.nan, smooth),
        )
