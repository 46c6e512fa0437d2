"""Does the forecast-scenario ensemble help? (VERDICT r3 item 6.)

The reference's Kalman wrench filter carries a full posterior covariance it
never uses for planning (forecast.cpp:277-330 computes it, then the planner
reads only the mean horizon). forecast/scenarios.py samples a scenario
ensemble from that posterior and scores every MPPI rollout against the
ensemble mean (BASELINE config 5). This experiment measures whether that
actually helps: the circle scenario with NOISY wrench observations —
Gaussian noise of standard deviation SIGMA newtons added to every wrench
observation the Kalman filter sees — planned with scenarios C in {1, 4},
comparing mean human force and tracking RMSE over 3 seeds.

Protocol: one closed-loop episode per (sigma, C, seed) — human PID pulls
the EE around the circle, observations feed the order-1 Kalman forecast,
the planner (lanes backend for both arms, so the ONLY difference is the
ensemble) updates at 20 Hz with the sampled-ensemble ctx, the plant steps
at 200 Hz between updates as one jitted scan. Ensemble horizons come from
forecast.scenarios.sample_scenarios (scenario 0 = the mean = exactly the
C=1 ctx).

Writes scenario_value.json; scripts/experiments.py renders it into
EXPERIMENTS.md.

Usage: [SV_DURATION=15] python scripts/scenario_value.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if jax.default_backend() not in ("cpu", "tpu"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from assistedmanipulation_tpu import mppi
    from assistedmanipulation_tpu.forecast import forecast as fc
    from assistedmanipulation_tpu.forecast.dynamics_forecast import (
        Configuration as DFConfiguration,
        DynamicsForecast,
    )
    from assistedmanipulation_tpu.forecast.scenarios import (
        make_scenario_rollout_fn,
        sample_scenarios,
    )
    from assistedmanipulation_tpu.kernels.lane_rollout import (
        make_lanes_rollout_fn,
    )
    from assistedmanipulation_tpu.models import frankaridgeback as fr
    from assistedmanipulation_tpu.models.model_data import frankaridgeback_model
    from assistedmanipulation_tpu.objectives.assisted_manipulation import (
        AssistedManipulation,
        Configuration as ObjectiveConfiguration,
    )
    from assistedmanipulation_tpu.sim import pid as pid_module
    from assistedmanipulation_tpu.sim import trajectories
    import scripts.experiments as ex

    duration = float(os.environ.get("SV_DURATION", 15.0))
    sim_dt = 0.005
    controller_rate = 0.05
    per_period = int(round(controller_rate / sim_dt))
    periods = int(duration / controller_rate)
    dtype = jnp.float32

    model = frankaridgeback_model()
    robot_cfg = fr.Configuration()
    initial, kp_np, kd_np = robot_cfg.resolve()
    kp = jnp.asarray(kp_np, dtype)
    kd = jnp.asarray(kd_np, dtype)
    objective = AssistedManipulation()
    plant = fr.make_plant(objective, robot_cfg, model)
    configuration = ex.mppi_configuration()
    steps = configuration.step_count
    lanes_fn = make_lanes_rollout_fn(
        model, ObjectiveConfiguration(), robot_cfg, steps,
        configuration.time_step,
    )
    def make_strategy(sigma):
        """Order-1 Kalman forecast with an HONEST noise model: the filter
        is told the actual observation noise (R = sigma^2 I, floored at the
        reference's 1e-8) and a unit transition variance for model
        mismatch, so its posterior — and therefore the sampled scenario
        ensemble — carries real uncertainty. With the reference's pinned
        1e-8 covariances the posterior is degenerate (~1e-4 N spread) and
        the ensemble trivially equals the mean."""
        return fc.KalmanForecast(
            fc.KalmanForecastConfiguration(
                observed_states=6, order=1, time_step=0.01, horizon=0.3,
                observation_variance=max(sigma**2, 1e-8),
                transition_variance=(1.0 if sigma > 0 else None),
            )
        )

    forecaster = DynamicsForecast(
        DFConfiguration(time_step=0.01, horizon=0.3), robot_cfg, model
    )
    trajectory = trajectories.CircularTrajectory(
        trajectories.CircularConfiguration()
    )
    pid = pid_module.PID(pid_module.HUMAN_POINT_CONTROL)

    def make_planner(scenario_count):
        # Same lanes evaluator for both arms; the wrapper passes a 2-D ctx
        # through untouched, so C=1 and C=4 differ ONLY in the ensemble.
        return mppi.Planner(
            configuration, plant,
            rollout_fn=make_scenario_rollout_fn(lanes_fn),
        )

    def advance(x, planner_state, strategy_state, pid_state, t0, obs_noise,
                planner, strategy):
        """One 50 ms control period of 200 Hz simulation (sim/episode.py
        tick semantics): PID wrench toward the circle, NOISY observation
        into the Kalman filter, interpolated control, plant step."""

        def tick(carry, inputs):
            x, strategy_state, pid_state = carry
            k, noise_k = inputs
            t = t0 + k.astype(dtype) * sim_dt
            aux = fr.derive_aux(model, x)
            reference = trajectory.position(t).astype(dtype)
            pid_state = pid.set_reference(pid_state, reference)
            pid_state = pid.update(pid_state, aux.ee_position, t)
            wrench = jnp.concatenate(
                [pid_state.control, jnp.zeros(3, dtype=dtype)]
            )
            observed = wrench + noise_k
            strategy_state = strategy.update(strategy_state, observed, t)
            u = planner._get_impl(planner_state, t)
            x_next = fr.integrate_with_wrench(
                model, kp, kd, x, u, aux, wrench, dt=sim_dt
            )
            err = aux.ee_position - reference
            return (x_next, strategy_state, pid_state), (
                jnp.linalg.norm(pid_state.control),
                jnp.sum(err * err),
            )

        (x, strategy_state, pid_state), (forces, sqerr) = jax.lax.scan(
            tick,
            (x, strategy_state, pid_state),
            (jnp.arange(per_period, dtype=jnp.int32), obs_noise),
        )
        return x, strategy_state, pid_state, forces, sqerr

    def controller_update(planner_state, x, strategy_state, t, key, planner,
                          scenario_count, strategy):
        _, ctx = forecaster.forecast(
            x, t, lambda tq: strategy.forecast(strategy_state, tq)
        )
        if scenario_count > 1:
            horizons = sample_scenarios(
                strategy, strategy_state, key, scenario_count
            )
            ctx = ctx._replace(wrench_horizon=horizons.astype(dtype))
        new_state, _ = planner._update_impl(planner_state, x, t, ctx)
        return new_state

    compiled = {}

    def get_compiled(scenario_count, sigma):
        """One jitted (strategy, advance, update) triple per arm, shared
        across seeds so each episode is dispatch-only after the first."""
        key = (scenario_count, sigma)
        if key not in compiled:
            planner = make_planner(scenario_count)
            strategy = make_strategy(sigma)
            compiled[key] = (
                planner,
                strategy,
                jax.jit(
                    lambda *a: advance(
                        *a, planner=planner, strategy=strategy
                    )
                ),
                jax.jit(
                    lambda *a: controller_update(
                        *a, planner=planner,
                        scenario_count=scenario_count, strategy=strategy,
                    )
                ),
            )
        return compiled[key]

    def episode(scenario_count, sigma, seed):
        planner, strategy, advance_jit, update_jit = get_compiled(
            scenario_count, sigma
        )
        x = jnp.asarray(initial, dtype)
        planner_state = planner.init(seed=seed)
        strategy_state = strategy.init(dtype)
        pid_state = pid.init(dtype=dtype)
        key = jax.random.key(seed + 7777)
        forces = []
        sqerr = []
        for i in range(periods):
            t = jnp.asarray(i * controller_rate, dtype)
            key, sub, obs = jax.random.split(key, 3)
            planner_state = update_jit(
                planner_state, x, strategy_state, t, sub
            )
            obs_noise = sigma * jax.random.normal(
                obs, (per_period, 6), dtype
            )
            x, strategy_state, pid_state, f, e = advance_jit(
                x, planner_state, strategy_state, pid_state, t, obs_noise
            )
            forces.append(f)
            sqerr.append(e)
        forces = np.asarray(jnp.concatenate(forces), np.float64)
        sqerr = np.asarray(jnp.concatenate(sqerr), np.float64)
        return {
            "mean_force": round(float(forces.mean()), 2),
            "rmse": round(float(np.sqrt(sqerr.mean())), 4),
        }

    report = {"duration": duration, "trajectory": "circle", "cells": []}
    for sigma in (0.0, 5.0, 10.0):
        for scenario_count in (1, 4):
            runs = {}
            for seed in (0, 1, 2):
                start = time.perf_counter()
                runs[seed] = episode(scenario_count, sigma, seed)
                runs[seed]["wall_s"] = round(
                    time.perf_counter() - start, 1
                )
            forces = sorted(r["mean_force"] for r in runs.values())
            rmses = sorted(r["rmse"] for r in runs.values())
            cell = {
                "obs_noise_sigma": sigma,
                "scenarios": scenario_count,
                "median_force": forces[1],
                "median_rmse": rmses[1],
                "runs": runs,
            }
            report["cells"].append(cell)
            print(cell, flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "scenario_value.json")
    with open(out, "w") as handle:
        json.dump(report, handle, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
