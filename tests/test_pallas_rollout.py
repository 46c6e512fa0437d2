"""Pallas fused rollout kernel vs the pure-XLA lanes backend.

Runs the kernel in interpreter mode on CPU (sublanes=1 keeps the tile small)
and checks the cost channels match the lanes path bit-for-bit-ish — both are
the same scalar graph, so agreement should be tight f32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from assistedmanipulation_tpu.kernels.lane_rollout import (
    make_lanes_rollout_fn,
)
from assistedmanipulation_tpu.kernels.pallas_rollout import (
    make_pallas_rollout_fn,
)
from assistedmanipulation_tpu.models import frankaridgeback as fr
from assistedmanipulation_tpu.models.model_data import frankaridgeback_model
from assistedmanipulation_tpu.objectives.assisted_manipulation import (
    Configuration as ObjectiveConfiguration,
    ForecastContext,
)

STEPS = 4
DT = 0.01


def _make_fns():
    model = frankaridgeback_model()
    objective_cfg = ObjectiveConfiguration()
    robot_cfg = fr.Configuration()
    lanes = make_lanes_rollout_fn(model, objective_cfg, robot_cfg, STEPS, DT)
    pallas = make_pallas_rollout_fn(
        model,
        objective_cfg,
        robot_cfg,
        STEPS,
        DT,
        sublanes=1,
        interpret=True,
    )
    return lanes, pallas


def _make_ctx():
    wrench = jnp.zeros((STEPS + 1, 6), dtype=jnp.float32).at[:, 0].set(25.0)
    return ForecastContext(
        wrench_horizon=wrench,
        start_time=jnp.asarray(0.0, dtype=jnp.float32),
        time_step=DT,
        horizon=STEPS * DT,
    )


@pytest.mark.parametrize("with_ctx", [True, False])
def test_pallas_matches_lanes(rng, with_ctx):
    lanes_fn, pallas_fn = _make_fns()
    R = 7  # deliberately not a multiple of the tile: exercises padding
    noise = jnp.asarray(
        rng.normal(scale=0.3, size=(R, STEPS, 12)), dtype=jnp.float32
    )
    optimal = jnp.asarray(
        rng.normal(scale=0.1, size=(STEPS, 12)), dtype=jnp.float32
    )
    x0 = jnp.asarray(fr.make_state("huddled"), dtype=jnp.float32)
    time = jnp.asarray(0.0, dtype=jnp.float32)
    ctx = _make_ctx() if with_ctx else None

    expected = np.asarray(lanes_fn(noise, optimal, x0, time, ctx))
    got = np.asarray(pallas_fn(noise, optimal, x0, time, ctx))

    assert got.shape == (R, 2)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)


def test_pallas_planner_update_runs(rng):
    """End-to-end planner update on the Pallas backend (interpreted)."""
    from assistedmanipulation_tpu import mppi
    from assistedmanipulation_tpu.kernels.pallas_rollout import (
        make_pallas_planner,
    )

    configuration = mppi.Configuration(
        rollouts=6,
        keep_best_rollouts=2,
        time_step=DT,
        horizon=STEPS * DT,
        covariance=fr.DEFAULT_COVARIANCE,
        control_min=fr.DEFAULT_CONTROL_MIN,
        control_max=fr.DEFAULT_CONTROL_MAX,
        control_default=np.zeros(12),
        smoothing=mppi.Smoothing(window=10, order=1),
        dtype="float32",
    )
    planner = make_pallas_planner(configuration, sublanes=1, interpret=True)
    state = planner.init(seed=0)
    x0 = jnp.asarray(fr.make_state("huddled"), dtype=jnp.float32)
    state, info = planner.update(state, x0, 0.0, _make_ctx())
    assert np.isfinite(np.asarray(state.optimal_control)).all()
    assert np.isfinite(np.asarray(info.weights)).all()
