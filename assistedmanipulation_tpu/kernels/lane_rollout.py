"""Fused Franka-Ridgeback MPPI rollout over lane-major arrays.

The complete per-step pipeline — FK, assisted-manipulation cost, CRBA mass
matrix, implicit-PD forward dynamics, semi-implicit Euler — expressed with
the scalar-graph lane math (kernels/lanes.py). Called either

- directly under jit with T = full rollout batch (the "lanes" planner
  backend: pure XLA, batch-minor layout, no tile padding), or
- from the Pallas fused kernel with T = tile width (kernels/pallas_rollout).

Semantics match the vmap reference path exactly (models/frankaridgeback.py +
objectives/assisted_manipulation.py); tests cross-validate the cost outputs.

Key structural optimizations (all trace-time, no approximation):
- static joint frames fold 0/±1 rotation entries out of FK;
- the gripper PD position term vanishes (the command *is* the current
  position, raisim_dynamics.cpp:208-211) and base kp = 0, so
  tau_pd = kd * (v_cmd - v) exactly;
- MPPI rollouts carry no external wrench (raisim_dynamics.cpp:236-238), so
  external power is zero and the tank energy stays at x0[30] throughout;
- the trajectory cost's target vector depends only on the forecast wrench,
  so its position term and velocity target precompute per *step* (not per
  rollout) on the host side of the call.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import frankaridgeback as fr
from ..models.dynamics import FRICTION_EPS
from ..models.model_data import RobotModel
from ..objectives.assisted_manipulation import (
    COLLISION_PAIRS,
    Configuration as ObjectiveConfiguration,
    ForecastContext,
)
from . import lanes as L


class TrajectoryStepData(NamedTuple):
    """Per-step rollout-independent pieces of the trajectory cost
    (assisted_manipulation.cpp:237-290)."""

    target: jax.Array  # (S, 3) clamped target vectors
    inv_norm2: jax.Array  # (S,) 1 / |target|^2 (0 when inactive)
    position_cost: jax.Array  # (S,) constant part incl. threshold gating
    velocity_target: jax.Array  # (S,)
    active: jax.Array  # (S,) bool


def trajectory_step_data(
    cfg: ObjectiveConfiguration, ctx: ForecastContext, t0, steps: int, dt: float
) -> TrajectoryStepData:
    t0 = jnp.asarray(t0)
    times = t0 + jnp.arange(steps, dtype=t0.dtype) * dt
    wrench = jax.vmap(ctx.wrench)(times)  # (S, 6)
    force = wrench[:, :3]
    target = jnp.clip(
        cfg.trajectory_target_scale * force,
        -cfg.trajectory_target_maximum,
        cfg.trajectory_target_maximum,
    )
    norm2 = jnp.sum(target * target, axis=-1)
    distance = jnp.sqrt(norm2)
    active = distance > cfg.trajectory_position_threshold
    position_cost = jnp.where(
        active,
        cfg.trajectory_position_constant
        + cfg.trajectory_position_quadratic * norm2,
        0.0,
    )
    velocity_target = jnp.clip(
        jnp.exp(cfg.trajectory_velocity_dropoff * distance) - 1.0,
        cfg.trajectory_velocity_minimum,
        cfg.trajectory_velocity_maximum,
    )
    inv_norm2 = jnp.where(active, 1.0 / jnp.maximum(norm2, 1e-30), 0.0)
    return TrajectoryStepData(target, inv_norm2, position_cost, velocity_target, active)


def _barrier_left(value, bound: float, scale: float, maximum: float = 1e10):
    """LeftInverseBarrier.decomposed as a scalar graph on one lane vector."""
    gap = L.materialize(L.sub(value, bound), value)
    safe = jnp.where(gap > 0, gap, 1.0)
    raw = scale / safe
    outside = gap <= 0
    clamped = raw >= maximum
    violations = jnp.where(outside | clamped, 1.0, 0.0)
    smooth = jnp.where(outside, scale * gap * gap, jnp.where(clamped, 0.0, raw))
    return violations, smooth


def _barrier_right(value, bound: float, scale: float, maximum: float = 1e10):
    gap = L.materialize(L.sub(bound, value), value)
    safe = jnp.where(gap > 0, gap, 1.0)
    raw = scale / safe
    outside = gap <= 0
    clamped = raw >= maximum
    violations = jnp.where(outside | clamped, 1.0, 0.0)
    smooth = jnp.where(outside, scale * gap * gap, jnp.where(clamped, 0.0, raw))
    return violations, smooth


def step_cost_and_dynamics(
    model: RobotModel,
    cfg: ObjectiveConfiguration,
    kp: np.ndarray,
    kd: np.ndarray,
    q_list,
    v_list,
    u_list,
    energy: jax.Array,
    traj_target,
    traj_inv_norm2,
    traj_position_cost,
    traj_velocity_target,
    dt: float,
):
    """One fused rollout step over lanes.

    Inputs: q/v/u as lists of 12 (T,) arrays; energy (T,); traj_* per-step
    scalars (0-d arrays). Returns (violations (T,), smooth (T,), q', v').
    """
    like = q_list[0]
    fk = L.lane_fk(model, q_list)

    violations = jnp.zeros_like(like)
    smooth = jnp.zeros_like(like)

    # --- joint limits (assisted_manipulation.cpp:74-88) ---------------------
    if cfg.enable_joint_limit:
        for i in range(12):
            lb, ls = cfg.lower_joint_limit[i]
            ub, us = cfg.upper_joint_limit[i]
            vl, sl = _barrier_left(q_list[i], lb, ls)
            vr, sr = _barrier_right(q_list[i], ub, us)
            violations = violations + vl + vr
            smooth = smooth + sl + sr

    # --- link positions for collisions + workspace --------------------------
    link_positions = []
    for name in fr.COLLISION_LINKS:
        _, p = L.lane_frame(model, fk, model.link_frames, name)
        link_positions.append([L.materialize(c, like) for c in p])

    if cfg.enable_self_collision_limit:
        radii = np.asarray(cfg.self_collision_radii)
        cb, cs = cfg.self_collision_limit
        for a, b in COLLISION_PAIRS:
            pa, pb = link_positions[a], link_positions[b]
            d2 = (
                (pa[0] - pb[0]) ** 2
                + (pa[1] - pb[1]) ** 2
                + (pa[2] - pb[2]) ** 2
            )
            distance = jnp.sqrt(d2)
            gap = distance - float(radii[a] + radii[b])
            vl, sl = _barrier_left(gap, cb, cs)
            violations = violations + vl
            smooth = smooth + sl

    # --- end effector state -------------------------------------------------
    R_ee, p_ee_graph = L.lane_frame(model, fk, model.frames, model.end_effector_frame)
    p_ee = [L.materialize(c, like) for c in p_ee_graph]
    J_lin = L.lane_point_jacobian(model, fk, p_ee, fr.EE_BODY)  # [12][3]

    # ee linear velocity = sum_i J_lin[i] * v_i
    ee_vel = [None, None, None]
    for i in range(12):
        for a in range(3):
            ee_vel[a] = L.fma(ee_vel[a], J_lin[i][a], v_list[i])
    ee_vel = [L.materialize(c, like) for c in ee_vel]

    # --- workspace (assisted_manipulation.cpp:160-209) ----------------------
    if cfg.enable_workspace_limit:
        yaw = q_list[2]
        cy, sy = jnp.cos(yaw), jnp.sin(yaw)
        _, mount = L.lane_frame(model, fk, model.frames, "arm_mount_joint")
        robot = [
            L.materialize(mount[0], like) + 0.1 * cy,
            L.materialize(mount[1], like) + 0.1 * sy,
            L.materialize(mount[2], like) + 0.15,
        ]
        to_ee = [p_ee[a] - robot[a] for a in range(3)]
        projection = to_ee[0] * cy + to_ee[1] * sy  # forward is unit length
        ib, iscale = cfg.workspace_limit_infront
        vl, sl = _barrier_left(projection, ib, iscale)
        violations, smooth = violations + vl, smooth + sl

        reach = jnp.sqrt(to_ee[0] ** 2 + to_ee[1] ** 2 + to_ee[2] ** 2)
        rb, rscale = cfg.workspace_limit_reach
        vr, sr = _barrier_right(reach, rb, rscale)
        violations, smooth = violations + vr, smooth + sr

        v1n = jnp.sqrt(to_ee[0] ** 2 + to_ee[1] ** 2)
        denom = v1n  # |forward_xy| = 1
        cos_angle = jnp.clip(projection / jnp.where(denom > 0, denom, 1.0), -1.0, 1.0)
        angle = L.acos(cos_angle)
        smooth = smooth + jnp.where(
            denom > 0, cfg.workspace_cost_yaw * angle * angle, 0.0
        )

        height = p_ee[2] - robot[2]
        ab, ascale = cfg.workspace_limit_above
        va, sa = _barrier_left(height, ab, ascale)
        violations, smooth = violations + va, smooth + sa

    # --- energy (constant over the rollout; assisted_manipulation.cpp:211) --
    if cfg.enable_energy_limit:
        eb, es = cfg.energy_limit_below
        ea, esa = cfg.energy_limit_above
        vb, sb = _barrier_left(energy, eb, es)
        va, sa = _barrier_right(energy, ea, esa)
        violations = violations + vb + va
        smooth = smooth + sb + sa

    # --- velocity cost ------------------------------------------------------
    if cfg.enable_velocity_cost:
        for i, gain in enumerate(cfg.velocity_cost):
            if gain:
                smooth = smooth + float(gain) * v_list[i] * v_list[i]

    # --- trajectory cost (per-rollout part: velocity projection) ------------
    if cfg.enable_trajectory_cost:
        dot = (
            ee_vel[0] * traj_target[0]
            + ee_vel[1] * traj_target[1]
            + ee_vel[2] * traj_target[2]
        )
        projection = dot * traj_inv_norm2
        # copysign(1, p) * |target * p| = p * |target| (exact identity).
        target_norm = jnp.sqrt(
            traj_target[0] ** 2 + traj_target[1] ** 2 + traj_target[2] ** 2
        )
        signed = projection * target_norm
        velocity_error = jnp.abs(traj_velocity_target - signed)
        smooth = smooth + traj_position_cost + jnp.where(
            traj_inv_norm2 > 0,
            cfg.trajectory_velocity_quadratic * velocity_error * velocity_error,
            0.0,
        )

    # --- manipulability (assisted_manipulation.cpp:292-319) -----------------
    if cfg.enable_manipulability_cost:
        # Linear rows, arm columns 3..9 of the EE jacobian. The base 3x3
        # yaw-override (raisim_dynamics.cpp:169-174) only touches columns
        # 0-2, so the arm block is the true point jacobian.
        m = [[jnp.zeros_like(like) for _ in range(3)] for _ in range(3)]
        for i in range(3, 10):
            col = [L.materialize(J_lin[i][a], like) for a in range(3)]
            for a in range(3):
                for b in range(a, 3):
                    m[a][b] = m[a][b] + col[a] * col[b]
        det = (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[1][2])
            - m[0][1] * (m[0][1] * m[2][2] - m[1][2] * m[0][2])
            + m[0][2] * (m[0][1] * m[1][2] - m[1][1] * m[0][2])
        )
        volume = jnp.sqrt(jnp.maximum(det, 0.0))
        volume = jnp.where(jnp.isnan(volume), 1e-5, jnp.clip(volume, 1e-5, 1e5))
        inv = 1.0 / volume
        smooth = smooth + cfg.manipulability_quadratic * inv * inv

    # --- dynamics: tau_pd + arm feedforward, implicit-PD solve --------------
    # tau = kd * (v_cmd - v) + S_arm u  (gripper/base kp terms vanish; see
    # module docstring).
    tau = []
    for i in range(12):
        v_cmd = u_list[i] if i < 3 else None
        t = L.mul(float(kd[i]), L.sub(v_cmd, v_list[i]))
        if 3 <= i < 10:
            t = L.add(t, u_list[i])
        tau.append(t)

    M = L.lane_mass_matrix(model, fk)
    for i in range(12):
        M[i][i] = L.add(M[i][i], float(kd[i]) * dt)
    # URDF Coulomb joint friction, implicitly regularized (same model as
    # models/dynamics.friction_coefficients): tau_f = -c v_next with
    # c = f/(|v|+eps); -c v on the rhs, +c dt on the implicit diagonal.
    # Only joints with nonzero URDF friction pay (base x/y/pivot = 10).
    for i in range(12):
        f_i = float(model.friction[i]) if model.friction is not None else 0.0
        d_i = float(model.damping[i]) if model.damping is not None else 0.0
        if f_i == 0.0 and d_i == 0.0:
            continue
        c_i = f_i / (jnp.abs(v_list[i]) + FRICTION_EPS) + d_i
        tau[i] = L.sub(tau[i], c_i * v_list[i])
        M[i][i] = L.add(M[i][i], c_i * dt)
    qdd = L.lane_cholesky_solve(M, tau, like)

    v_next = [L.materialize(L.add(v_list[i], L.mul(dt, qdd[i])), like) for i in range(12)]
    q_next = [q_list[i] + dt * v_next[i] for i in range(12)]

    return violations, smooth, q_next, v_next


def make_lane_rollout(
    model: RobotModel,
    objective_cfg: ObjectiveConfiguration,
    robot_cfg: fr.Configuration,
    steps: int,
    dt: float,
    discount: float = 1.0,
):
    """Build rollout_costs(noise_lanes (S, 12, T), optimal (S, 12), x0 (31,),
    traj_data) -> ((T, 2) cost channels, (S, 12, 2) lane-0 pre-step q/v).
    Pure jnp — jit or embed in Pallas. Lane 0 is the zero-noise static
    rollout in the planner's layout; its per-step states feed the "batch"
    optimal_rollout_mode's observability (one tiny slice per step; XLA
    drops the output when unused)."""
    _, kp, kd = robot_cfg.resolve()

    def rollout_costs(noise_lanes, optimal, x0, traj: TrajectoryStepData):
        T = noise_lanes.shape[-1]
        like = jnp.zeros((T,), dtype=noise_lanes.dtype)
        energy = jnp.full((T,), x0[fr.ENERGY], dtype=noise_lanes.dtype)

        q0 = jnp.broadcast_to(x0[fr.POSITION][:, None], (12, T)).astype(noise_lanes.dtype)
        v0 = jnp.broadcast_to(x0[fr.VELOCITY][:, None], (12, T)).astype(noise_lanes.dtype)

        def body(carry, inputs):
            q, v, violations, smooth = carry
            noise_s, opt_s, target_s, inv2_s, pcost_s, vtarget_s, disc_s = inputs
            u = [opt_s[d] + noise_s[d] for d in range(12)]
            q_list = [q[d] for d in range(12)]
            v_list = [v[d] for d in range(12)]
            step_viol, step_smooth, q_next, v_next = step_cost_and_dynamics(
                model,
                objective_cfg,
                kp,
                kd,
                q_list,
                v_list,
                u,
                energy,
                [target_s[0], target_s[1], target_s[2]],
                inv2_s,
                pcost_s,
                vtarget_s,
                dt,
            )
            violations = violations + disc_s * step_viol
            smooth = smooth + disc_s * step_smooth
            return (
                jnp.stack(q_next),
                jnp.stack(v_next),
                violations,
                smooth,
            ), jnp.stack([q[:, 0], v[:, 0]], axis=-1)  # lane 0 pre-step

        discounts = discount ** jnp.arange(steps, dtype=noise_lanes.dtype)
        (q, v, violations, smooth), qv0 = jax.lax.scan(
            body,
            (q0, v0, jnp.zeros_like(like), jnp.zeros_like(like)),
            (
                noise_lanes,
                optimal,
                traj.target,
                traj.inv_norm2,
                traj.position_cost,
                traj.velocity_target,
                discounts,
            ),
        )
        return jnp.stack([violations, smooth], axis=-1), qv0  # (T, 2), (S, 12, 2)

    return rollout_costs


def make_lane_filter_rollout(
    model: RobotModel,
    objective_cfg: ObjectiveConfiguration,
    robot_cfg: fr.Configuration,
    steps: int,
    dt: float,
    discount: float = 1.0,
):
    """Single-trajectory optimal re-rollout on the lanes scalar graph
    (mppi::Trajectory::filter semantics, mppi.cpp:450-479, without a
    per-step control filter — the Planner falls back to the vmap plant path
    when a safety filter is attached).

    The vmap re-rollout is the Amdahl tail of the solve: one sequential
    50-step trajectory whose per-step CRBA/Cholesky lowers to LAPACK-style
    custom calls — measured at ~60% of the whole 10k-rollout update on v5e.
    The lanes step is one fused scalar graph on the VPU (no custom calls),
    identical in cost semantics to the batched rollout (same
    step_cost_and_dynamics), run at T=1.

    MEASURED OUTCOME on v5e: at T=1 the scalar graph's per-op overhead does
    not amortize — the whole-solve bench dropped 206 -> 154 solves/s wired
    in place of the vmap path, so the planner factories do NOT wire it.
    The production answer to the Amdahl tail is
    ``mppi.Configuration.optimal_rollout_mode = "batch"`` (read the
    zero-noise rollout's cost, skip the re-rollout, 206 -> ~570 solves/s);
    this function remains for platforms where scalar graphs win and as the
    parity-tested reference of the re-rollout semantics.

    Returns fn(optimal (S, 12), x0 (31,), time, ctx) ->
    (cost (2,) channels, states (S, 31)). States match the vmap path: the
    pre-step state per step; wrench/energy slots carry x0's values (the
    rollout plant applies no wrench, so the tank is constant —
    raisim_dynamics.cpp:236-238 skip + zero external power)."""
    _, kp, kd = robot_cfg.resolve()

    def fn(optimal, x0, time, ctx):
        dtype = optimal.dtype
        if ctx is None:
            zeros = jnp.zeros((steps,), dtype=dtype)
            traj = TrajectoryStepData(
                target=jnp.zeros((steps, 3), dtype=dtype),
                inv_norm2=zeros,
                position_cost=zeros,
                velocity_target=zeros,
                active=jnp.zeros((steps,), dtype=bool),
            )
        else:
            traj = trajectory_step_data(objective_cfg, ctx, time, steps, dt)

        like = jnp.zeros((1,), dtype=dtype)
        energy = jnp.full((1,), x0[fr.ENERGY], dtype=dtype)
        q0 = x0[fr.POSITION].astype(dtype)[:, None]  # (12, 1)
        v0 = x0[fr.VELOCITY].astype(dtype)[:, None]

        def body(carry, inputs):
            q, v, violations, smooth = carry
            opt_s, target_s, inv2_s, pcost_s, vtarget_s, disc_s = inputs
            u = [jnp.broadcast_to(opt_s[d], (1,)) for d in range(12)]
            q_list = [q[d] for d in range(12)]
            v_list = [v[d] for d in range(12)]
            step_viol, step_smooth, q_next, v_next = step_cost_and_dynamics(
                model,
                objective_cfg,
                kp,
                kd,
                q_list,
                v_list,
                u,
                energy,
                [target_s[0], target_s[1], target_s[2]],
                inv2_s,
                pcost_s,
                vtarget_s,
                dt,
            )
            violations = violations + disc_s * step_viol
            smooth = smooth + disc_s * step_smooth
            return (
                jnp.stack(q_next),
                jnp.stack(v_next),
                violations,
                smooth,
            ), (q[:, 0], v[:, 0])

        discounts = discount ** jnp.arange(steps, dtype=dtype)
        (_, _, violations, smooth), (qs, vs) = jax.lax.scan(
            body,
            (q0, v0, jnp.zeros_like(like), jnp.zeros_like(like)),
            (optimal, traj.target, traj.inv_norm2, traj.position_cost,
             traj.velocity_target, discounts),
        )
        tail = jnp.broadcast_to(
            x0[24:].astype(dtype), (steps, x0.shape[0] - 24)
        )
        states = jnp.concatenate([qs, vs, tail], axis=-1)  # (S, 31)
        cost = jnp.stack([violations[0], smooth[0]])  # (2,)
        return cost, states

    return fn


def make_lanes_rollout_fn(
    model: RobotModel,
    objective_cfg: ObjectiveConfiguration,
    robot_cfg: fr.Configuration,
    steps: int,
    dt: float,
    discount: float = 1.0,
):
    """Adapter matching Planner's rollout_fn signature: transposes the
    (R, S, 12) noise to lane-major (S, 12, R), precomputes the per-step
    trajectory data from ctx, and runs the fused lane rollout. Returns
    ((R, 2) costs, (S, 31) rollout-0 pre-step states) — rollout 0 is lane
    column 0 after the transpose; the wrench/energy slots carry x0's values
    (the rollout plant applies no wrench, raisim_dynamics.cpp:236-238)."""
    rollout = make_lane_rollout(model, objective_cfg, robot_cfg, steps, dt, discount)

    def fn(noise, optimal_shifted, x0, time, ctx):
        if ctx is None:
            zeros = jnp.zeros((steps,), dtype=noise.dtype)
            traj = TrajectoryStepData(
                target=jnp.zeros((steps, 3), dtype=noise.dtype),
                inv_norm2=zeros,
                position_cost=zeros,
                velocity_target=zeros,
                active=jnp.zeros((steps,), dtype=bool),
            )
        else:
            traj = trajectory_step_data(objective_cfg, ctx, time, steps, dt)
        noise_lanes = jnp.transpose(noise, (1, 2, 0))
        costs, qv0 = rollout(noise_lanes, optimal_shifted, x0, traj)
        tail = jnp.broadcast_to(
            x0[24:].astype(costs.dtype), (steps, x0.shape[0] - 24)
        )
        states0 = jnp.concatenate([qv0[..., 0], qv0[..., 1], tail], axis=-1)
        return costs, states0

    return fn


def make_lanes_planner(
    mppi_configuration,
    objective_cfg: ObjectiveConfiguration = None,
    robot_cfg: fr.Configuration = None,
    filter_fn=None,
    rollout_fn_wrapper=None,
):
    """Planner with the assisted-manipulation objective on the fused
    batch-minor rollout path (cost channels identical to the vmap path).

    ``filter_fn`` forwards to Planner (the QP safety filter);
    ``rollout_fn_wrapper`` post-processes the rollout evaluator (e.g.
    parallel.sharding.shard_rollout_fn for explicit per-device placement)."""
    from .. import mppi as mppi_module
    from ..models.model_data import frankaridgeback_model
    from ..objectives.assisted_manipulation import AssistedManipulation

    model = frankaridgeback_model()
    objective_cfg = objective_cfg or ObjectiveConfiguration()
    robot_cfg = robot_cfg or fr.Configuration()
    objective = AssistedManipulation(objective_cfg)
    plant = fr.make_plant(objective, robot_cfg, model)
    rollout_fn = make_lanes_rollout_fn(
        model,
        objective_cfg,
        robot_cfg,
        mppi_configuration.step_count,
        mppi_configuration.time_step,
        mppi_configuration.cost_discount_factor,
    )
    if rollout_fn_wrapper is not None:
        rollout_fn = rollout_fn_wrapper(rollout_fn)
    return mppi_module.Planner(
        mppi_configuration, plant, rollout_fn=rollout_fn, filter_fn=filter_fn
    )
