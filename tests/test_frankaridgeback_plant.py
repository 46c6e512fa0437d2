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
    """Base velocity commands track through the implicit kd=1000 PD, with
    the steady-state droop f/kd = 10/1000 = 0.01 from the URDF Coulomb
    joint friction (robot.urdf:41-75) that RaiSim also exhibits."""
    step = fr.make_plant_step()
    x = jnp.asarray(fr.make_state("huddled"))
    u = jnp.zeros(12).at[0].set(0.3).at[2].set(0.5)
    w = jnp.zeros(6)
    for _ in range(200):
        x, _ = step(x, u, w, 0.005)
    v = np.asarray(x[fr.VELOCITY])
    np.testing.assert_allclose(v[0], 0.3 - 0.01, atol=0.003)
    np.testing.assert_allclose(v[2], 0.5 - 0.01, atol=0.003)
    assert np.asarray(x[fr.POSITION])[0] > 0.2  # moved in x


def test_base_joint_coulomb_friction_stiction():
    """Base joints hold still under sub-threshold generalized force: a pure
    end-effector force whose base-x component stays below the 10 N Coulomb
    limit leaves the base essentially parked (creep < eps) while the
    frictionless arm joints give way."""
    step = fr.make_plant_step()
    x = jnp.asarray(fr.make_state("huddled"))
    u = jnp.zeros(12)
    # 8 N along +x at the hand: |J^T w| on base x is <= 8 < 10.
    w = jnp.asarray([8.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    for _ in range(200):
        x, aux = step(x, u, w, 0.005)
    v = np.asarray(x[fr.VELOCITY])
    q = np.asarray(x[fr.POSITION])
    # Base x: creep-level motion only (regularized stiction, eps = 1e-3).
    assert abs(v[0]) < 5e-3
    assert abs(q[0] - fr.PRESETS["huddled"][0]) < 5e-3
    # Arm moved: at least one arm joint picked up real velocity.
    assert np.max(np.abs(v[3:10])) > 1e-2


def test_ee_acceleration_matches_finite_difference():
    """Classical EE acceleration J̇v + Jq̈ (ee_classical_acceleration)
    matches the finite difference of the logged EE velocity. The reference
    never actually computes this (setComputeInverseDynamics commented out,
    raisim_dynamics.cpp:38); dynamics.hpp:95-117 is the API being honored."""
    step = fr.make_plant_step()
    x = jnp.asarray(fr.make_state("huddled"))
    u = jnp.zeros(12).at[4].set(5.0)
    w = jnp.asarray([10.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    dt = 0.002
    auxes = []
    for _ in range(4):
        x, aux = step(x, u, w, dt)
        auxes.append(aux)
    a_logged = np.asarray(auxes[1].ee_linear_acceleration)
    a_fd = (
        np.asarray(auxes[2].ee_linear_velocity)
        - np.asarray(auxes[1].ee_linear_velocity)
    ) / dt
    np.testing.assert_allclose(a_logged, a_fd, rtol=0.05, atol=5e-3)
    alpha_logged = np.asarray(auxes[1].ee_angular_acceleration)
    alpha_fd = (
        np.asarray(auxes[2].ee_angular_velocity)
        - np.asarray(auxes[1].ee_angular_velocity)
    ) / dt
    np.testing.assert_allclose(alpha_logged, alpha_fd, rtol=0.05, atol=5e-3)


def test_joint_power_live_under_load():
    """joint_power = tau . v (raisim_dynamics.cpp:176-179) is zero at rest
    and nonzero once the robot moves under arm torque."""
    step = fr.make_plant_step()
    x = jnp.asarray(fr.make_state("huddled"))
    u = jnp.zeros(12).at[4].set(5.0)
    w = jnp.zeros(6)
    x, aux0 = step(x, u, w, 0.005)
    assert float(aux0.joint_power) == 0.0  # v = 0 on the first step
    for _ in range(20):
        x, aux = step(x, u, w, 0.005)
    assert abs(float(aux.joint_power)) > 1e-3


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
