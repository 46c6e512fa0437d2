"""Cross-validation of the fused batch-minor ("lanes") rollout path
(kernels/lanes.py + kernels/lane_rollout.py) against the generic vmap
reference path in mppi.Planner._rollout_batch.

The lanes path is a hand-scheduled re-expression of the exact same math
(FK, assisted-manipulation cost, CRBA + implicit-PD dynamics), so the two
must agree to float tolerance on identical inputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from assistedmanipulation_tpu import mppi
from assistedmanipulation_tpu.kernels import lanes as L
from assistedmanipulation_tpu.kernels.lane_rollout import (
    make_lanes_planner,
    make_lanes_rollout_fn,
)
from assistedmanipulation_tpu.models import frankaridgeback as fr
from assistedmanipulation_tpu.models import kinematics as kin
from assistedmanipulation_tpu.models.dynamics import mass_matrix
from assistedmanipulation_tpu.models.model_data import frankaridgeback_model
from assistedmanipulation_tpu.objectives.assisted_manipulation import (
    AssistedManipulation,
    Configuration as ObjectiveConfig,
    ForecastContext,
)

MODEL = frankaridgeback_model()


def make_configuration(rollouts=6, steps=8, dtype="float64"):
    base_cov = [0.1, 0.1, 0.2] + [0.4] * 7 + [0.0, 0.0]
    return mppi.Configuration(
        rollouts=rollouts,
        keep_best_rollouts=3,
        time_step=0.01,
        horizon=steps * 0.01,
        gradient_step=2.0,
        cost_scale=10.0,
        covariance=np.diag(base_cov),
        control_min=np.array([-0.5, -0.5, -1.0] + [-20.0] * 7 + [-0.05] * 2),
        control_max=np.array([0.5, 0.5, 1.0] + [20.0] * 7 + [0.05] * 2),
        smoothing=mppi.Smoothing(window=5, order=1),
        dtype=dtype,
    )


def make_ctx(steps, dtype=jnp.float64):
    t = np.arange(steps + 1) * 0.01
    wrench = np.zeros((steps + 1, 6))
    wrench[:, 0] = 5.0 * np.sin(4.0 * t) + 8.0
    wrench[:, 1] = 3.0 * np.cos(3.0 * t)
    wrench[:, 2] = 2.0
    return ForecastContext(
        wrench_horizon=jnp.asarray(wrench, dtype=dtype),
        start_time=jnp.asarray(0.0, dtype=dtype),
        time_step=0.01,
        horizon=steps * 0.01,
    )


@pytest.mark.parametrize("ctx_none", [False, True])
def test_lane_rollout_matches_vmap(rng, ctx_none):
    """Identical (R, 2) cost channels from the lanes and vmap rollouts."""
    steps, rollouts = 8, 6
    cfg = make_configuration(rollouts, steps)
    objective = AssistedManipulation()
    plant = fr.make_plant(objective, fr.Configuration(), MODEL)
    planner = mppi.Planner(cfg, plant)
    lanes_fn = make_lanes_rollout_fn(
        MODEL, objective.configuration, fr.Configuration(), steps, 0.01
    )

    R = cfg.rollout_count
    noise = jnp.asarray(
        rng.normal(0, 0.3, (R, steps, 12)), dtype=jnp.float64
    )
    optimal = jnp.asarray(rng.normal(0, 0.1, (steps, 12)), dtype=jnp.float64)
    x0 = jnp.asarray(fr.make_state("huddled", energy=10.0), dtype=jnp.float64)
    time = jnp.asarray(0.0, dtype=jnp.float64)
    ctx = None if ctx_none else make_ctx(steps)

    ref, ref_states = planner._rollout_batch(noise, optimal, x0, time, ctx)
    got, got_states = lanes_fn(noise, optimal, x0, time, ctx)

    assert got.shape == (R, 2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-9, atol=1e-9
    )
    # Rollout-0 (zero-noise) pre-step states agree between the lanes path
    # and the generic vmap batch (q/v exactly; the wrench/energy tail is
    # x0's by both constructions).
    assert got_states.shape == (steps, 31)
    np.testing.assert_allclose(
        np.asarray(got_states), np.asarray(ref_states), rtol=1e-9, atol=1e-9
    )


def test_lanes_planner_update_matches_vmap(rng):
    """Full Planner.update parity: same seed, same optimal control out."""
    steps = 6
    cfg = make_configuration(rollouts=5, steps=steps)
    objective = AssistedManipulation()
    plant = fr.make_plant(objective, fr.Configuration(), MODEL)
    ref_planner = mppi.Planner(cfg, plant)
    lane_planner = make_lanes_planner(cfg)

    x0 = jnp.asarray(fr.make_state("huddled", energy=10.0), dtype=jnp.float64)
    ctx = make_ctx(steps)

    s_ref = ref_planner.init(seed=7)
    s_lane = lane_planner.init(seed=7)
    for i in range(3):
        t = i * 0.05
        s_ref, info_ref = ref_planner.update(s_ref, x0, t, ctx)
        s_lane, info_lane = lane_planner.update(s_lane, x0, t, ctx)

    np.testing.assert_allclose(
        np.asarray(s_lane.optimal_control),
        np.asarray(s_ref.optimal_control),
        rtol=1e-7,
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(info_lane.costs), np.asarray(info_ref.costs), rtol=1e-7
    )


def test_long_horizon_planner_update(rng):
    """SURVEY §7's 50-500 step scan-efficiency hard part, correctness leg:
    a 200-step-horizon planner update on the fused lanes backend runs,
    stays finite and bounded (the TPU perf leg is PERF.md's horizon
    scaling table; the VMEM tile derivation is
    test_pallas_rollout.py::test_vmem_sublane_derivation_long_horizons)."""
    steps = 200
    cfg = make_configuration(rollouts=4, steps=steps)
    planner = make_lanes_planner(cfg)
    x0 = jnp.asarray(fr.make_state("huddled", energy=10.0), dtype=jnp.float64)
    state = planner.init(seed=3)
    state, info = planner.update(state, x0, 0.0, make_ctx(steps))
    optimal = np.asarray(state.optimal_control)
    assert optimal.shape == (steps, 12)
    assert np.isfinite(optimal).all()
    assert np.isfinite(np.asarray(info.costs)).all()
    assert (optimal >= np.asarray(fr.DEFAULT_CONTROL_MIN) - 1e-9).all()
    assert (optimal <= np.asarray(fr.DEFAULT_CONTROL_MAX) + 1e-9).all()


def test_lane_fk_matches_kinematics(rng):
    """Lane FK scalar graphs materialize to the kinematics.py transforms."""
    q = rng.uniform(-1.0, 1.0, (12,))
    qb = jnp.asarray(np.repeat(q[:, None], 3, axis=1))  # (12, T=3)
    fk_ref = kin.forward_kinematics(MODEL, jnp.asarray(q))
    fk_lane = L.lane_fk(MODEL, qb)

    like = qb[0]
    for body in range(MODEL.n_joints):
        R_lane = np.stack(
            [
                [np.asarray(L.materialize(fk_lane.rotation[body][a][b], like))[0]
                 for b in range(3)]
                for a in range(3)
            ]
        )
        p_lane = np.stack(
            [np.asarray(L.materialize(fk_lane.origin[body][a], like))[0]
             for a in range(3)]
        )
        np.testing.assert_allclose(
            R_lane, np.asarray(fk_ref.rotation[body]), atol=1e-12
        )
        np.testing.assert_allclose(
            p_lane, np.asarray(fk_ref.origin[body]), atol=1e-12
        )


def test_lane_mass_matrix_and_solve(rng):
    """CRBA over lanes == models.dynamics.mass_matrix; Cholesky solve checks
    against numpy."""
    q = rng.uniform(-1.0, 1.0, (12,))
    qb = jnp.asarray(q[:, None])  # T = 1
    fk_lane = L.lane_fk(MODEL, qb)
    M_graph = L.lane_mass_matrix(MODEL, fk_lane)
    like = qb[0]
    M_lane = np.array(
        [
            [np.asarray(L.materialize(M_graph[i][j], like))[0] for j in range(12)]
            for i in range(12)
        ]
    )
    fk_ref = kin.forward_kinematics(MODEL, jnp.asarray(q))
    M_ref = np.asarray(mass_matrix(MODEL, fk_ref))
    np.testing.assert_allclose(M_lane, M_ref, rtol=1e-9, atol=1e-11)

    # Regularize like the implicit-PD solve does before factorizing.
    for i in range(12):
        M_graph[i][i] = L.add(M_graph[i][i], 5.0)
    rhs_np = rng.normal(0, 1.0, (12,))
    rhs = [jnp.asarray(rhs_np[i : i + 1]) for i in range(12)]
    x = L.lane_cholesky_solve(M_graph, rhs, like)
    x_np = np.array([np.asarray(xi)[0] for xi in x])
    expected = np.linalg.solve(M_lane + 5.0 * np.eye(12), rhs_np)
    np.testing.assert_allclose(x_np, expected, rtol=1e-9, atol=1e-11)


def test_lane_filter_rollout_matches_vmap(rng):
    """make_lane_filter_rollout (the fast optimal re-rollout) must produce
    the same cost channels and states as Planner._filter_rollout."""
    import jax.numpy as jnp
    from assistedmanipulation_tpu import mppi
    from assistedmanipulation_tpu.kernels.lane_rollout import (
        make_lane_filter_rollout,
    )
    from assistedmanipulation_tpu.models import frankaridgeback as fr
    from assistedmanipulation_tpu.models.model_data import frankaridgeback_model
    from assistedmanipulation_tpu.objectives.assisted_manipulation import (
        AssistedManipulation,
        Configuration as ObjectiveConfiguration,
        ForecastContext,
    )

    steps, dt = 6, 0.01
    config = mppi.Configuration(
        rollouts=4,
        keep_best_rollouts=2,
        time_step=dt,
        horizon=steps * dt,
        covariance=fr.DEFAULT_COVARIANCE,
        control_min=fr.DEFAULT_CONTROL_MIN,
        control_max=fr.DEFAULT_CONTROL_MAX,
        control_default=np.zeros(12),
        smoothing=None,
        dtype="float32",
    )
    objective_cfg = ObjectiveConfiguration()
    model = frankaridgeback_model()
    plant = fr.make_plant(AssistedManipulation(objective_cfg), fr.Configuration(), model)
    planner = mppi.Planner(config, plant)

    optimal = jnp.asarray(
        rng.normal(scale=0.2, size=(steps, 12)), dtype=jnp.float32
    )
    x0 = jnp.asarray(fr.make_state("huddled"), dtype=jnp.float32)
    time = jnp.asarray(0.2, dtype=jnp.float32)
    wrench = jnp.asarray(
        rng.normal(scale=10.0, size=(steps + 1, 6)), dtype=jnp.float32
    )
    ctx = ForecastContext(
        wrench_horizon=wrench,
        start_time=time,
        time_step=dt,
        horizon=steps * dt,
    )

    want_cost, want_states, _ = planner._filter_rollout(optimal, x0, time, ctx)

    fast = make_lane_filter_rollout(
        model, objective_cfg, fr.Configuration(), steps, dt
    )
    got_channels, got_states = fast(optimal, x0, time, ctx)
    from assistedmanipulation_tpu.mppi import compose_cost

    np.testing.assert_allclose(
        float(compose_cost(got_channels)), float(want_cost), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_states), np.asarray(want_states), rtol=2e-4, atol=2e-5
    )
