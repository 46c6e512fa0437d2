"""QP trajectory safety filter (safety.py) — the layer the reference stubbed
(safety.cpp:5-22). Checks the affine constraint model against the real plant
step and the filter's write-back integration with the planner."""

import numpy as np
import jax
import jax.numpy as jnp

from assistedmanipulation_tpu import mppi, safety
from assistedmanipulation_tpu.models import frankaridgeback as fr


def _state():
    return jnp.asarray(fr.make_state("huddled"), dtype=jnp.float64)


def _next_velocity(x, u, dt=0.01):
    """True plant next-step joint velocity for checking the filter's affine
    model (models/frankaridgeback.integrate_with_wrench)."""
    step = fr.make_plant_step()
    x_next, _ = step(x, u, jnp.zeros(6, dtype=x.dtype), dt)
    return x_next[fr.VELOCITY]


def test_safe_control_passes_through():
    cfg = safety.Configuration(iterations=100)
    filter_fn = safety.make_safety_filter(cfg)
    x = _state()
    u = jnp.zeros(12, dtype=jnp.float64).at[3].set(1.0)  # small arm torque
    u_safe = filter_fn(x, u, 0.0)
    np.testing.assert_allclose(np.asarray(u_safe), np.asarray(u), atol=1e-3)


def test_velocity_limit_enforced():
    cfg = safety.Configuration(
        limit_joints=False,
        limit_acceleration=False,
        limit_reach=False,
        iterations=200,
    )
    filter_fn = safety.make_safety_filter(cfg)
    x = _state()
    # Slam maximum torque on every arm joint and full base speed.
    u = jnp.asarray(
        [0.5, 0.5, 1.0, 87, 87, 87, 87, 12, 12, 12, 0, 0], dtype=jnp.float64
    )
    v_unfiltered = np.asarray(_next_velocity(x, u))
    assert (np.abs(v_unfiltered) > safety.DEFAULT_VELOCITY_LIMIT + 1e-6).any()

    u_safe = filter_fn(x, u, 0.0)
    v_filtered = np.asarray(_next_velocity(x, u_safe))
    assert (
        np.abs(v_filtered) <= safety.DEFAULT_VELOCITY_LIMIT + 1e-3
    ).all(), v_filtered


def test_acceleration_limit_enforced():
    cfg = safety.Configuration(
        limit_joints=False,
        limit_velocity=False,
        limit_reach=False,
        iterations=200,
    )
    filter_fn = safety.make_safety_filter(cfg)
    x = _state()
    u = jnp.asarray(
        [0.5, 0.5, 1.0, 87, 87, 87, 87, 12, 12, 12, 0, 0], dtype=jnp.float64
    )
    dt = cfg.time_step
    v0 = np.asarray(x[fr.VELOCITY])
    u_safe = filter_fn(x, u, 0.0)
    accel = (np.asarray(_next_velocity(x, u_safe)) - v0) / dt
    assert (
        np.abs(accel) <= safety.DEFAULT_ACCELERATION_LIMIT * (1 + 1e-3) + 1e-3
    ).all(), accel


def test_planner_writeback():
    """A planner with the filter publishes a control sequence whose first
    step respects the velocity constraint model."""
    steps = 5
    configuration = mppi.Configuration(
        rollouts=6,
        keep_best_rollouts=2,
        time_step=0.01,
        horizon=steps * 0.01,
        covariance=fr.DEFAULT_COVARIANCE,
        control_min=fr.DEFAULT_CONTROL_MIN,
        control_max=fr.DEFAULT_CONTROL_MAX,
        control_default=np.zeros(12),
        dtype="float32",
    )
    from assistedmanipulation_tpu.objectives.assisted_manipulation import (
        AssistedManipulation,
    )

    plant = fr.make_plant(AssistedManipulation(), fr.Configuration())
    filter_fn = safety.make_safety_filter(safety.Configuration(iterations=60))
    planner = mppi.Planner(configuration, plant, filter_fn=filter_fn)
    state = planner.init(seed=0)
    x0 = jnp.asarray(fr.make_state("huddled"), dtype=jnp.float32)
    state, info = planner.update(state, x0, 0.0)
    optimal = np.asarray(state.optimal_control)
    assert np.isfinite(optimal).all()

    v1 = np.asarray(
        _next_velocity(x0.astype(jnp.float64), jnp.asarray(optimal[0], jnp.float64))
    )
    assert (np.abs(v1) <= safety.DEFAULT_VELOCITY_LIMIT + 5e-3).all()
