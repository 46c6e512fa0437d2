"""Objective-term tests with hand-computed expectations
(assisted_manipulation.cpp:74-319, track_point.cpp)."""

import numpy as np
import jax.numpy as jnp

from assistedmanipulation_tpu.models.frankaridgeback import (
    POSITION,
    VELOCITY,
    ENERGY,
    derive_aux,
    make_state,
)
from assistedmanipulation_tpu.models.model_data import frankaridgeback_model
from assistedmanipulation_tpu.objectives.assisted_manipulation import (
    AssistedManipulation,
    Configuration,
    ForecastContext,
    COLLISION_PAIRS,
)
from assistedmanipulation_tpu.objectives.track_point import TrackPoint


MODEL = frankaridgeback_model()


def aux_for(state):
    return derive_aux(MODEL, jnp.asarray(state))


def test_collision_pair_table_matches_reference():
    """20 pairs, exactly the table at assisted_manipulation.cpp:92-125."""
    assert COLLISION_PAIRS.shape == (20, 2)
    # pivot (0) against panda links 3-7 (indices 3..7)
    assert (COLLISION_PAIRS[:5] == [[0, 3], [0, 4], [0, 5], [0, 6], [0, 7]]).all()
    assert (COLLISION_PAIRS[-1] == [5, 7]).all()


def test_joint_limit_cost_inside_and_outside():
    objective = AssistedManipulation()
    state = make_state("huddled")
    q = jnp.asarray(state[POSITION])
    inside = float(objective.joint_limit_cost(q))
    # All joints within limits: sum of inverse barriers, finite and modest.
    assert 0 < inside < 1e4

    # Violate joint6's lower limit (0.349 at index 8 -> preset joint_limit
    # uses -0.2): barrier fires at maximum_cost + quadratic.
    violated = make_state("joint_limit")
    outside = float(objective.joint_limit_cost(jnp.asarray(violated[POSITION])))
    assert outside >= 1e10


def test_self_collision_closer_costs_more():
    objective = AssistedManipulation()
    far = float(objective.self_collision_cost(aux_for(make_state("huddled"))))
    near = float(
        objective.self_collision_cost(aux_for(make_state("self_collision")))
    )
    assert near > far > 0


def test_velocity_cost_hand_computed():
    objective = AssistedManipulation()
    state = make_state("huddled")
    state[VELOCITY] = 0.1
    expected = 0.01 * np.sum(np.asarray(objective.configuration.velocity_cost))
    value = float(objective.velocity_cost(jnp.asarray(state)))
    np.testing.assert_allclose(value, expected, rtol=1e-6)


def test_energy_cost_barriers():
    config = Configuration(enable_energy_limit=True)
    objective = AssistedManipulation(config)
    state = make_state("huddled")
    state[ENERGY] = 10.0  # centered between 0 and 20: cost = 10/10 + 10/10
    np.testing.assert_allclose(
        float(objective.energy_cost(jnp.asarray(state))), 2.0, rtol=1e-6
    )
    state[ENERGY] = 0.0  # at the lower bound -> maximum cost
    assert float(objective.energy_cost(jnp.asarray(state))) >= 1e10


def test_trajectory_cost_hand_computed():
    objective = AssistedManipulation()
    state = make_state("huddled")
    aux = aux_for(state)
    # Constant 50 N force in +x over the horizon.
    wrench = np.zeros((31, 6))
    wrench[:, 0] = 50.0
    ctx = ForecastContext(
        wrench_horizon=jnp.asarray(wrench),
        start_time=jnp.asarray(0.0),
        time_step=0.01,
        horizon=0.3,
    )
    value = float(objective.trajectory_cost(aux, jnp.asarray(0.0), ctx))

    # target = clip(1e-2 * 50) = 0.5 in x; distance 0.5
    # position cost = 100 + 500 * 0.25 = 225
    # ee velocity is zero -> projection 0;
    # velocity_target = clip(exp(2*0.5)-1, 0.1, 5) = e - 1
    # velocity cost = 500 * (e-1)^2
    expected = 225.0 + 500.0 * (np.e - 1.0) ** 2
    np.testing.assert_allclose(value, expected, rtol=1e-5)

    # Beyond the horizon the forecast returns zero wrench -> distance 0,
    # below threshold is false (0 > 0) -> cost 0.
    value_beyond = float(objective.trajectory_cost(aux, jnp.asarray(1.0), ctx))
    assert value_beyond == 0.0


def test_trajectory_context_interpolates():
    wrench = np.zeros((4, 6))
    wrench[:, 1] = [0.0, 1.0, 2.0, 3.0]
    ctx = ForecastContext(
        wrench_horizon=jnp.asarray(wrench),
        start_time=jnp.asarray(0.0),
        time_step=0.1,
        horizon=0.3,
    )
    np.testing.assert_allclose(float(ctx.wrench(jnp.asarray(0.15))[1]), 1.5)
    np.testing.assert_allclose(float(ctx.wrench(jnp.asarray(0.3))[1]), 3.0)
    np.testing.assert_allclose(float(ctx.wrench(jnp.asarray(0.31))[1]), 0.0)


def test_manipulability_finite_and_positive():
    objective = AssistedManipulation()
    value = float(objective.manipulability_cost(aux_for(make_state("huddled"))))
    assert 0 <= value < 1e10


def test_total_cost_sums_terms():
    objective = AssistedManipulation()
    state = jnp.asarray(make_state("huddled"))
    aux = aux_for(make_state("huddled"))
    u = jnp.zeros(12)
    terms = objective.terms(state, u, aux, jnp.asarray(0.0), None)
    channels = objective(state, u, aux, jnp.asarray(0.0), None)
    total = float(channels[0]) * 1e10 + float(channels[1])
    np.testing.assert_allclose(
        total, sum(float(v) for v in terms.values()), rtol=1e-9
    )
    # Energy disabled by default; trajectory zero without ctx.
    assert float(terms["energy"]) == 0.0
    assert float(terms["trajectory"]) == 0.0


def test_track_point_costs():
    objective = TrackPoint()
    state = make_state("huddled")
    aux = aux_for(state)
    point_cost = float(objective.point_cost(aux))
    expected = 100.0 * float(
        jnp.sum((aux.ee_position - jnp.asarray([1.0, 1.0, 1.0])) ** 2)
    )
    np.testing.assert_allclose(point_cost, expected, rtol=1e-6)

    # In-limit joints: zero joint cost (quadratic penalties only outside).
    assert float(objective.joint_limit_cost(jnp.asarray(state[POSITION]))) == 0.0
    q_bad = state[POSITION].copy()
    q_bad[4] = 2.0  # above 1.7628
    value = float(objective.joint_limit_cost(jnp.asarray(q_bad)))
    np.testing.assert_allclose(
        value, 1000.0 + 100000.0 * (2.0 - 1.7628) ** 2, rtol=1e-6
    )
