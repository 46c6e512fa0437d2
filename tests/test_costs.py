"""Golden-value unit tests for the cost primitives, hand-computed from the
reference formulas (src/controller/cost.hpp:10-167)."""

import jax.numpy as jnp
import numpy as np
import pytest

from assistedmanipulation_tpu.ops.costs import (
    LeftInverseBarrier,
    LowerLogBarrier,
    QuadraticCost,
    RightInverseBarrier,
    UpperLogBarrier,
)


def test_quadratic_cost():
    cost = QuadraticCost(constant_cost=1.0, linear_cost=2.0, quadratic_cost=3.0)
    # 1 + 2*|−2| + 3*4 = 17
    assert np.isclose(float(cost(-2.0)), 17.0)
    assert np.isclose(float(cost(0.0)), 1.0)
    batched = cost(jnp.array([0.0, 1.0, -2.0]))
    np.testing.assert_allclose(np.asarray(batched), [1.0, 6.0, 17.0], rtol=1e-6)


def test_right_inverse_barrier_inside():
    barrier = RightInverseBarrier(upper_bound=2.0, scale=3.0)
    # scale / (upper - v) = 3 / (2 - 1) = 3
    assert np.isclose(float(barrier(1.0)), 3.0)
    # clamped to maximum_cost when close to the bound
    assert float(barrier(2.0 - 1e-12)) == pytest.approx(1e10)


def test_right_inverse_barrier_outside():
    barrier = RightInverseBarrier(upper_bound=2.0, scale=3.0)
    # maximum + scale*(v-upper)^2 = 1e10 + 3*1 = 1e10 + 3
    assert np.isclose(float(barrier(3.0)), 1e10 + 3.0)


def test_left_inverse_barrier():
    barrier = LeftInverseBarrier(lower_bound=-1.0, scale=2.0)
    assert np.isclose(float(barrier(0.0)), 2.0)  # 2/(0-(-1))
    assert np.isclose(float(barrier(-2.0)), 1e10 + 2.0)  # beyond bound


def test_upper_log_barrier():
    barrier = UpperLogBarrier(upper_bound=1.0, scale=2.0, offset=-1.0)
    # inside: min(2*(-log10(1-v) + offset), 0); v=0: min(2*(0-1),0) = -2
    assert np.isclose(float(barrier(0.0)), -2.0)
    # at/past bound: maximum_cost
    assert float(barrier(1.5)) == pytest.approx(1e10)
    # clamped to zero from above: v=0.99999 -> -log10(1e-5)=5; 2*(5-1)=8 -> min(8,0)=0
    assert float(barrier(0.99999)) == pytest.approx(0.0, abs=1e-6)


def test_lower_log_barrier():
    barrier = LowerLogBarrier(lower_bound=0.0, scale=1.0, offset=0.0)
    # v=10: min(-log10(10), 0) = -1
    assert np.isclose(float(barrier(10.0)), -1.0)
    assert float(barrier(-0.5)) == pytest.approx(1e10)


def test_nan_propagates():
    """NaN inputs must poison the cost (mppi.cpp:331-334 semantics)."""
    for cost in [
        QuadraticCost(1.0, 1.0, 1.0),
        RightInverseBarrier(1.0, 1.0),
        LeftInverseBarrier(1.0, 1.0),
        UpperLogBarrier(1.0, 1.0, 0.0),
        LowerLogBarrier(1.0, 1.0, 0.0),
    ]:
        assert np.isnan(float(cost(jnp.nan)))
