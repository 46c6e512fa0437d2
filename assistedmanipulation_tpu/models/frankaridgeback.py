"""Franka-Ridgeback plant: the 31-dim state / 12-dim control robot model.

Reproduces the reference's robot layer semantics on TPU:

- DoF layout (dof.hpp:36-70): q(12) + v(12) + external wrench(6) + tank
  energy(1) = STATE 31; CONTROL 12 = base velocity (vx, vy, wyaw) + arm
  torque(7) + gripper position(2).
- Actuation (raisim_dynamics.cpp:206-238): PD_PLUS_FEEDFORWARD_TORQUE with
  kp = [0,0,0, 0x7, 100,100], kd = [1000x3, 10x7, 50,50]; base velocity
  commands in world frame (the body-frame rotation is commented out in the
  reference, raisim_dynamics.cpp:215), gripper position target = current
  position, arm torques as feedforward on top of getNonlinearities gravity/
  Coriolis compensation — which cancels h(q, v) exactly, so the effective
  rollout dynamics is (M + dt Kd) qdd = tau_pd + S_arm u + J^T w_ext with no
  nonlinear-effects term in the hot path.
- External wrench (raisim_dynamics.cpp:131-148): force applied at offset
  (0, 0, 0.2) in the end-effector's parent body (panda_link7 composite)
  frame, torque applied to the body.
- External power u^T (J_ee^T w) into the energy tank with a minus sign
  (raisim_dynamics.cpp:226-252).
- End-effector state (raisim_dynamics.cpp:150-204): grasp-frame pose,
  point linear velocity, body angular velocity, 6x12 Jacobian whose base
  3x3 block is overwritten with Rz(yaw) ("base jacobian relative to the
  arm", raisim_dynamics.cpp:169-174). Known reference bug NOT copied: the
  linear Jacobian rows are the true linear point Jacobian here, not a
  second copy of the rotational one (raisim_dynamics.cpp:154-164).
- Preset initial states (state.cpp:5-49).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..mppi import Plant
from ..ops.energy import energy_tank_step
from ..ops.rotations import matrix_to_quat
from . import dynamics as dyn
from . import factory
from . import kinematics as kin
from .kinematics import f32_matmuls
from .model_data import RobotModel, frankaridgeback_model


# --- DoF layout (dof.hpp) ---------------------------------------------------

class DoF:
    BASE = 3
    ARM = 7
    GRIPPER = 2
    JOINTS = 12
    EXTERNAL_WRENCH = 6
    STATE = 31
    CONTROL = 12


POSITION = slice(0, 12)
VELOCITY = slice(12, 24)
WRENCH = slice(24, 30)
ENERGY = 30

# Links used by the self-collision table (assisted_manipulation.cpp:92-125);
# radii index = link enum - 3 (pivot first).
COLLISION_LINKS = [
    "pivot",
    "panda_link1",
    "panda_link2",
    "panda_link3",
    "panda_link4",
    "panda_link5",
    "panda_link6",
    "panda_link7",
]

# End-effector body (moving link index of panda_link7 composite, which holds
# the hand + grasp frames) and the wrench application offset in its frame.
EE_BODY = 9
EE_FORCE_OFFSET = np.array([0.0, 0.0, 0.2])

DEFAULT_PROPORTIONAL_GAIN = np.array(
    [0.0, 0.0, 0.0, 0, 0, 0, 0, 0, 0, 0, 100.0, 100.0]
)
DEFAULT_DIFFERENTIAL_GAIN = np.array(
    [1000.0, 1000.0, 1000.0, 10, 10, 10, 10, 10, 10, 10, 50.0, 50.0]
)


# --- presets (state.cpp:5-49) ----------------------------------------------

_PI = np.pi
PRESETS = {
    "zero": np.zeros(12),
    "huddled": np.array(
        [0.2, 0.2, _PI / 4, 0.0, _PI / 5, 0.0, -_PI / 2, 0.0, 2, _PI / 4, 0.025, 0.025]
    ),
    "behind": np.array(
        [0.2, 0.2, _PI / 4, _PI, 1.2, 0.0, -2, 0, _PI / 2, _PI / 4, 0.025, 0.025]
    ),
    "below": np.array(
        [0.2, 0.2, _PI / 4, 0.0, 1.2, 0.0, -2, 0, _PI, _PI / 4, 0.025, 0.025]
    ),
    "reach": np.array(
        [0.2, 0.2, _PI / 4, 0.0, 1.5, 0.0, 0, 0, _PI, _PI / 4, 0.025, 0.025]
    ),
    "joint_limit": np.array(
        [0.2, 0.2, _PI / 4, 0.0, _PI / 5, 0.0, -_PI / 2, 0.0, -0.2, _PI / 4, 0.025, 0.025]
    ),
    "self_collision": np.array(
        [0.2, 0.2, _PI / 4, 0.0, _PI / 3, 0.0, -6 * _PI / 8, 0.0, 2, _PI / 4, 0.025, 0.025]
    ),
}


def make_state(preset: str = "huddled", energy: float = 100.0) -> np.ndarray:
    """31-dim state vector from a named preset. The 'zero' preset zeroes the
    tank too, matching state.cpp:12-14 (which returns before setting 100)."""
    state = np.zeros(DoF.STATE)
    state[POSITION] = PRESETS[preset]
    state[ENERGY] = 0.0 if preset == "zero" else energy
    return state


# --- configuration ----------------------------------------------------------


@dataclasses.dataclass
class Configuration:
    """Mirror of RaisimDynamics::Configuration defaults
    (raisim_dynamics.hpp:56-75)."""

    initial_state: Optional[np.ndarray] = None
    proportional_gain: Optional[np.ndarray] = None
    differential_gain: Optional[np.ndarray] = None
    energy: Optional[float] = 1000.0
    end_effector_frame: str = "panda_grasp_joint"
    # Dynamics backend selection (SimulatorDynamics::Configuration::Type,
    # actor_dynamics.cpp:46-86): "analytic" (CRBA/RNEA, hot-path default)
    # or "lagrangian" (autodiff Euler-Lagrange, models/factory.py).
    dynamics_type: str = "analytic"
    # Backend for the MPPI rollout plant (make_plant) when it should differ
    # from the simulator's — the reference's mixed plant/rollout
    # configuration (the pinocchio case runs the simulator on the alternate
    # dynamics while the controller keeps its own, pinocchio.hpp:11-60,
    # actor_dynamics.hpp:146-213). None = same as dynamics_type.
    rollout_dynamics_type: Optional[str] = None

    def resolve(self):
        initial = (
            np.asarray(self.initial_state)
            if self.initial_state is not None
            else make_state("huddled")
        )
        if self.energy is not None:
            initial = initial.copy()
            initial[ENERGY] = self.energy
        kp = (
            np.asarray(self.proportional_gain)
            if self.proportional_gain is not None
            else DEFAULT_PROPORTIONAL_GAIN
        )
        kd = (
            np.asarray(self.differential_gain)
            if self.differential_gain is not None
            else DEFAULT_DIFFERENTIAL_GAIN
        )
        return initial, kp, kd


# --- derived quantities (aux) ----------------------------------------------


class RobotAux(NamedTuple):
    """Per-step derived quantities (RaisimDynamics::calculate,
    raisim_dynamics.cpp:150-204) shared by cost and integrate.

    The acceleration/power fields are zero on the MPPI hot path (derive_aux)
    and filled by the simulation step (make_plant_step), which knows the
    solved qdd and applied torque — mirroring the reference split where
    get_end_effector_state exposes accelerations (dynamics.hpp:95-117) and
    calculate() computes joint power (raisim_dynamics.cpp:176-179). Known
    reference quirk NOT copied: the reference never calls
    setComputeInverseDynamics(true) (commented out, raisim_dynamics.cpp:38)
    so its logged EE acceleration is undefined and the angular acceleration
    is hard-zeroed (raisim_dynamics.cpp:203); here both are real classical
    accelerations d/dt(J v) = J̇ v + J q̈."""

    fk: kin.FK
    mass: jnp.ndarray  # (12, 12)
    ee_position: jnp.ndarray  # (3,)
    ee_orientation: jnp.ndarray  # (4,) quaternion (w, x, y, z)
    ee_linear_velocity: jnp.ndarray  # (3,)
    ee_angular_velocity: jnp.ndarray  # (3,)
    ee_jacobian: jnp.ndarray  # (6, 12) with the Rz(yaw) base override
    collision_link_positions: jnp.ndarray  # (8, 3)
    arm_mount_position: jnp.ndarray  # (3,)
    ee_linear_acceleration: jnp.ndarray  # (3,)
    ee_angular_acceleration: jnp.ndarray  # (3,)
    joint_power: jnp.ndarray  # () tau . v


@f32_matmuls
def derive_aux(model: RobotModel, x: jnp.ndarray, backend=None) -> RobotAux:
    q = x[POSITION]
    v = x[VELOCITY]
    fk = kin.forward_kinematics(model, q)
    mass = (
        backend.mass_matrix(model, fk, q)
        if backend is not None
        else dyn.mass_matrix(model, fk)
    )

    R_ee, p_ee = kin.frame_transform(model, fk, model.end_effector_frame)
    J_lin = kin.point_jacobian(model, fk, p_ee, body=EE_BODY)
    J_ang = kin.angular_jacobian(model, fk, body=EE_BODY)
    jacobian = jnp.concatenate([J_lin, J_ang], axis=-2)  # (6, 12)

    # Base block override with Rz(yaw) (raisim_dynamics.cpp:169-174).
    yaw = q[2]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    rz = jnp.stack(
        [
            jnp.stack([c, -s, jnp.zeros_like(c)]),
            jnp.stack([s, c, jnp.zeros_like(c)]),
            jnp.stack([jnp.zeros_like(c), jnp.zeros_like(c), jnp.ones_like(c)]),
        ]
    )
    jacobian = jacobian.at[0:3, 0:3].set(rz)

    return RobotAux(
        fk=fk,
        mass=mass,
        ee_position=p_ee,
        ee_orientation=matrix_to_quat(R_ee),
        ee_linear_velocity=J_lin @ v,
        ee_angular_velocity=J_ang @ v,
        ee_jacobian=jacobian,
        collision_link_positions=kin.link_positions(model, fk, COLLISION_LINKS),
        arm_mount_position=kin.frame_transform(model, fk, "arm_mount_joint")[1],
        ee_linear_acceleration=jnp.zeros(3, dtype=x.dtype),
        ee_angular_acceleration=jnp.zeros(3, dtype=x.dtype),
        joint_power=jnp.zeros((), dtype=x.dtype),
    )


@f32_matmuls
def ee_classical_acceleration(model: RobotModel, q, v, qdd):
    """Classical end-effector accelerations (a, alpha) = d/dt (J(q) v) =
    J̇ v + J q̈, via one jvp through the kinematics (no J̇ bookkeeping).

    Replaces raisim getFrameAcceleration (raisim_dynamics.cpp:199-203),
    which the reference leaves undefined (setComputeInverseDynamics is
    commented out, raisim_dynamics.cpp:38) and whose angular part is
    hard-zeroed; both are computed properly here."""

    def ee_velocity(q, v):
        fk = kin.forward_kinematics(model, q)
        _, p_ee = kin.frame_transform(model, fk, model.end_effector_frame)
        J_lin = kin.point_jacobian(model, fk, p_ee, body=EE_BODY)
        J_ang = kin.angular_jacobian(model, fk, body=EE_BODY)
        return J_lin @ v, J_ang @ v

    _, (lin_acc, ang_acc) = jax.jvp(ee_velocity, (q, v), (v, qdd))
    return lin_acc, ang_acc


# --- actuation + integration ------------------------------------------------


def _pd_and_feedforward(x, u, kp, kd):
    """tau_pd + S_arm u (raisim_dynamics.cpp:206-224).

    Gripper position target = current gripper position; base velocity
    command in world frame; arm torque feedforward."""
    q = x[POSITION]
    v = x[VELOCITY]
    q_cmd = jnp.zeros(12, dtype=x.dtype).at[10:12].set(q[10:12])
    v_cmd = jnp.zeros(12, dtype=x.dtype).at[0:3].set(u[0:3])
    tau_pd = kp * (q_cmd - q) + kd * (v_cmd - v)
    tau_ff = jnp.zeros(12, dtype=x.dtype).at[3:10].set(u[3:10])
    return tau_pd + tau_ff


@f32_matmuls
def wrench_generalized_force(model, aux: RobotAux, wrench: jnp.ndarray):
    """Generalized force of a world-frame wrench applied at the hand offset
    point (raisim_dynamics.cpp:131-148)."""
    R7 = aux.fk.rotation[EE_BODY]
    p7 = aux.fk.origin[EE_BODY]
    point = p7 + R7 @ jnp.asarray(EE_FORCE_OFFSET, dtype=p7.dtype)
    J_point = kin.point_jacobian(model, aux.fk, point, body=EE_BODY)
    J_ang = kin.angular_jacobian(model, aux.fk, body=EE_BODY)
    return J_point.T @ wrench[:3] + J_ang.T @ wrench[3:]


@f32_matmuls
def integrate_with_wrench_extras(model, kp, kd, x, u, aux: RobotAux, wrench, dt):
    """Full plant step with an applied external wrench
    (RaisimDynamics::step = act + integrate + update,
    raisim_dynamics.cpp:255-264). Semi-implicit Euler with implicit PD
    damping (see models/dynamics.py). Also returns (qdd, tau_actuation) for
    the simulation/logging path (EE accelerations + joint power)."""
    tau = _pd_and_feedforward(x, u, kp, kd)
    q_ext = wrench_generalized_force(model, aux, wrench)
    # URDF Coulomb joint friction (base x/y/pivot = 10), implicitly
    # regularized: tau_f = -c v_next = -c v - c dt qdd (models/dynamics.py).
    v = x[VELOCITY]
    c = dyn.friction_coefficients(model, v)
    qdd = dyn.forward_dynamics(aux.mass, tau + q_ext - c * v, kd + c, dt)

    v_next = x[VELOCITY] + dt * qdd
    q_next = x[POSITION] + dt * v_next

    # External power u^T (J_ee^T w) -> tank integrates -power
    # (raisim_dynamics.cpp:226-252).
    external_power = u @ (aux.ee_jacobian.T @ wrench)
    energy = energy_tank_step(x[ENERGY], -external_power, dt)

    x_next = (
        jnp.concatenate([q_next, v_next, x[WRENCH], energy[None]])
        .astype(x.dtype)
    )
    return x_next, qdd, tau


def integrate_with_wrench(model, kp, kd, x, u, aux: RobotAux, wrench, dt):
    """MPPI hot-path step: state only (the extras are dead-code-eliminated
    by XLA when unused, but the explicit wrapper keeps call sites honest)."""
    return integrate_with_wrench_extras(model, kp, kd, x, u, aux, wrench, dt)[0]


def make_plant(
    cost_fn,
    configuration: Configuration = None,
    model: RobotModel = None,
) -> Plant:
    """Build the MPPI Plant. Rollout dynamics apply NO external wrench — the
    reference's MPPI dynamics copies deliberately skip the forecast wrench
    (raisim_dynamics.cpp:236-238); the forecast enters through the objective
    via ctx instead."""
    model = model or frankaridgeback_model()
    configuration = configuration or Configuration()
    _, kp_np, kd_np = configuration.resolve()
    backend = factory.create(
        configuration.rollout_dynamics_type or configuration.dynamics_type
    )

    def derive(x, t, ctx=None):
        return derive_aux(model, x, backend=backend)

    def integrate(x, u, aux, t, dt, ctx=None):
        kp = jnp.asarray(kp_np, dtype=x.dtype)
        kd = jnp.asarray(kd_np, dtype=x.dtype)
        zero_wrench = jnp.zeros(6, dtype=x.dtype)
        return integrate_with_wrench(model, kp, kd, x, u, aux, zero_wrench, dt)

    return Plant(
        derive=derive,
        cost=cost_fn,
        integrate=integrate,
        state_dof=DoF.STATE,
        control_dof=DoF.CONTROL,
    )


def simulation_extras(
    model, aux: RobotAux, x, tau, qdd, gravity=(0.0, 0.0, 9.81), backend=None
):
    """Fill the aux acceleration/power fields from a solved step.

    joint_power = (tau_pd + S_arm u + h(q, v)) . v — the reference's
    getGeneralizedForce (feedforward nonlinearities + arm torque + PD)
    dotted with the generalized velocity (raisim_dynamics.cpp:176-179).
    The h term is NOT in the rollout hot path (it cancels against the
    feedforward there); it is recomputed here for logging only. Gravity
    default matches the reference world's (0, 0, 9.81)
    (raisim_dynamics.hpp:58-61)."""
    q, v = x[POSITION], x[VELOCITY]
    h = (
        backend.nonlinear_effects(model, aux.fk, q, v, gravity)
        if backend is not None
        else dyn.nonlinear_effects(model, aux.fk, v, gravity)
    )
    lin_acc, ang_acc = ee_classical_acceleration(model, q, v, qdd)
    return aux._replace(
        ee_linear_acceleration=lin_acc,
        ee_angular_acceleration=ang_acc,
        joint_power=(tau + h) @ v,
    )


def make_plant_step(configuration: Configuration = None, model: RobotModel = None):
    """Plant-side step with wrench input, for the simulator loop and the
    DynamicsForecast rollout: step(x, u, wrench, dt) -> (x_next, aux).
    The returned aux belongs to the pre-step state, with the accelerations
    and joint power of the step just taken (simulation_extras)."""
    model = model or frankaridgeback_model()
    configuration = configuration or Configuration()
    _, kp_np, kd_np = configuration.resolve()
    backend = factory.create(configuration.dynamics_type)

    def step(x, u, wrench, dt):
        aux = derive_aux(model, x, backend=backend)
        kp = jnp.asarray(kp_np, dtype=x.dtype)
        kd = jnp.asarray(kd_np, dtype=x.dtype)
        x_next, qdd, tau = integrate_with_wrench_extras(
            model, kp, kd, x, u, aux, jnp.asarray(wrench, dtype=x.dtype), dt
        )
        aux = simulation_extras(model, aux, x, tau, qdd, backend=backend)
        return x_next, aux

    return step


# Default MPPI configuration covariance/bounds for this robot
# (base.hpp:79-94).
DEFAULT_COVARIANCE = np.array(
    [0.1, 0.1, 0.2, 7.5, 7.5, 7.5, 7.5, 7.5, 7.5, 7.5, 0.0, 0.0]
)
DEFAULT_CONTROL_MIN = np.array(
    [-0.5, -0.5, -1.0, -100.0, -100.0, -100.0, -100.0, -100.0, -100.0, -100.0, -0.05, -0.05]
)
DEFAULT_CONTROL_MAX = np.array(
    [0.5, 0.5, 1.0, 100.0, 100.0, 100.0, 100.0, 100.0, 100.0, 100.0, 0.05, 0.05]
)
