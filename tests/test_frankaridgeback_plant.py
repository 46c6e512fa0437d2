"""Integration tests of the full robot plant: actuation semantics, energy
tank, and a closed-loop MPPI reach (small problem sizes — CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from assistedmanipulation_tpu import mppi
from assistedmanipulation_tpu.models import frankaridgeback as fr
from assistedmanipulation_tpu.models.model_data import frankaridgeback_model
from assistedmanipulation_tpu.objectives.track_point import (
    Configuration as TrackPointConfig,
    TrackPoint,
)

MODEL = frankaridgeback_model()


def test_hold_position_zero_control():
    """With zero control the gravity-compensated robot holds pose exactly
    (the feedforward cancellation, raisim_dynamics.cpp:220-224)."""
    step = fr.make_plant_step()
    x = jnp.asarray(fr.make_state("huddled"))
    u = jnp.zeros(12)
    w = jnp.zeros(6)
    for _ in range(50):
        x, _ = step(x, u, w, 0.005)
    np.testing.assert_allclose(
        np.asarray(x[fr.VELOCITY]), 0.0, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(x[fr.POSITION]), fr.PRESETS["huddled"], atol=1e-12
    )


def test_base_velocity_tracking():
    """Base velocity commands track through the implicit kd=1000 PD."""
    step = fr.make_plant_step()
    x = jnp.asarray(fr.make_state("huddled"))
    u = jnp.zeros(12).at[0].set(0.3).at[2].set(0.5)
    w = jnp.zeros(6)
    for _ in range(200):
        x, _ = step(x, u, w, 0.005)
    v = np.asarray(x[fr.VELOCITY])
    np.testing.assert_allclose(v[0], 0.3, atol=0.01)
    np.testing.assert_allclose(v[2], 0.5, atol=0.01)
    assert np.asarray(x[fr.POSITION])[0] > 0.2  # moved in x


def test_energy_tank_integrates_external_power():
    """Tank integrates -u^T J^T w per step (raisim_dynamics.cpp:226-252)."""
    step = fr.make_plant_step()
    x = jnp.asarray(fr.make_state("huddled", energy=100.0))
    u = jnp.zeros(12).at[0].set(0.2)
    w = jnp.asarray([10.0, 0.0, 0.0, 0.0, 0.0, 0.0])

    aux = fr.derive_aux(MODEL, x)
    expected_power = float(u @ (aux.ee_jacobian.T @ w))
    x1, _ = step(x, u, w, 0.005)
    np.testing.assert_allclose(
        float(x1[fr.ENERGY]), 100.0 - expected_power * 0.005, rtol=1e-9
    )


def test_wrench_accelerates_robot():
    """A pure +x force on the end effector must accelerate the system in +x."""
    step = fr.make_plant_step()
    x = jnp.asarray(fr.make_state("huddled"))
    u = jnp.zeros(12)
    w = jnp.asarray([50.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    for _ in range(100):
        x, aux = step(x, u, w, 0.005)
    # The end effector should have moved in +x.
    x0_aux = fr.derive_aux(MODEL, jnp.asarray(fr.make_state("huddled")))
    assert float(aux.ee_position[0]) > float(x0_aux.ee_position[0]) + 0.005


def test_gripper_holds_position():
    """Gripper PD (kp=100) targets the *current* position each step
    (raisim_dynamics.cpp:208-211), so fingers stay where they are."""
    step = fr.make_plant_step()
    x = jnp.asarray(fr.make_state("huddled"))
    u = jnp.zeros(12)
    w = jnp.zeros(6)
    for _ in range(100):
        x, _ = step(x, u, w, 0.005)
    np.testing.assert_allclose(
        np.asarray(x[fr.POSITION][10:]), [0.025, 0.025], atol=1e-6
    )


@pytest.mark.slow
def test_closed_loop_reach():
    """End-to-end: MPPI with the TrackPoint objective drives the end
    effector toward the target point (config 3 of BASELINE.json, scaled down
    for CPU)."""
    objective = TrackPoint(
        TrackPointConfig(point=(1.0, 1.0, 1.0), enable_reach_limits=False)
    )
    plant = fr.make_plant(objective)
    configuration = mppi.Configuration(
        rollouts=14,
        keep_best_rollouts=6,
        time_step=0.02,
        horizon=0.2,
        gradient_step=2.0,
        cost_scale=10.0,
        covariance=fr.DEFAULT_COVARIANCE,
        control_min=fr.DEFAULT_CONTROL_MIN,
        control_max=fr.DEFAULT_CONTROL_MAX,
        smoothing=mppi.Smoothing(window=5, order=1),
        dtype="float32",
    )
    planner = mppi.Planner(configuration, plant)
    state = planner.init(seed=0)

    step = fr.make_plant_step()
    x = jnp.asarray(fr.make_state("huddled"), dtype=jnp.float32)
    target = np.array([1.0, 1.0, 1.0])

    def distance(x):
        aux = fr.derive_aux(MODEL, x)
        return float(np.linalg.norm(np.asarray(aux.ee_position) - target))

    initial = distance(x)
    t = 0.0
    dt = 0.02
    w = jnp.zeros(6, dtype=jnp.float32)
    for _ in range(25):
        state, _ = planner.update(state, x, t)
        u = planner.get(state, t)
        x, _ = step(x, u, w, dt)
        t += dt

    final = distance(x)
    assert final < initial - 0.05, f"no progress: {initial:.3f} -> {final:.3f}"
    assert not np.isnan(np.asarray(x)).any()
