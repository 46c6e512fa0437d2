"""FLOP accounting for the MPPI solve (MFU in bench.py).

The reference never relates its solve time to hardware peak (its only
timing is update_duration, mppi.cpp:161-184). Here the per-rollout-step
FLOP count is not hand-waved: it is counted by walking the jaxpr of the
ACTUAL fused step graph (kernels/lane_rollout.step_cost_and_dynamics — the
same scalar graph the Pallas kernel and the lanes backend execute), one
FLOP per arithmetic primitive per element, 2mnk for contractions.
Transcendentals count as one FLOP, so the total is a lower bound; MFU
computed from it is conservative.

Note the workload is VPU-shaped (elementwise scalar graph on (sublanes,
128) tiles), not MXU-shaped: MFU against the chip's headline matmul peak is
structurally small, so bench.py also reports utilization against the VPU's
elementwise peak — the honest speed-of-light for this op mix.
"""

from __future__ import annotations

from functools import lru_cache
import math

import jax
import numpy as np


# FLOPs per output element. Comparisons/selects/logical ops count zero
# (predicates, not arithmetic); transcendentals count one (lower bound).
_ELEMENTWISE = {
    "add": 1, "sub": 1, "mul": 1, "div": 1, "rem": 1,
    "neg": 1, "abs": 1, "sign": 1, "max": 1, "min": 1,
    "sqrt": 1, "rsqrt": 1, "exp": 1, "log": 1, "log1p": 1, "expm1": 1,
    "sin": 1, "cos": 1, "tan": 1, "tanh": 1, "atan2": 1, "erf": 1,
    "pow": 1, "integer_pow": 1, "cbrt": 1, "logistic": 1,
    "square": 1,
    "add_any": 1,
}
_ZERO = {
    "lt", "le", "gt", "ge", "eq", "ne", "and", "or", "not", "xor",
    "select_n", "broadcast_in_dim", "reshape", "transpose", "squeeze",
    "convert_element_type", "slice", "dynamic_slice", "dynamic_update_slice",
    "concatenate", "gather", "iota", "copy", "stop_gradient", "reduce_or",
    "reduce_and", "is_finite", "sharding_constraint", "clamp",
}


def _out_size(eqn) -> int:
    return int(sum(math.prod(v.aval.shape) or 1 for v in eqn.outvars))


def count_jaxpr_flops(jaxpr) -> float:
    """Walk a (closed) jaxpr counting arithmetic FLOPs, recursing into
    scan/while/cond/pjit sub-jaxprs (scan scaled by trip count)."""
    total = 0.0
    for eqn in jaxpr.jaxpr.eqns if hasattr(jaxpr, "jaxpr") else jaxpr.eqns:
        name = eqn.primitive.name
        if name in _ELEMENTWISE:
            total += _ELEMENTWISE[name] * _out_size(eqn)
        elif name in _ZERO:
            pass
        elif name == "clamp":
            total += 2 * _out_size(eqn)
        elif name == "dot_general":
            dims = eqn.params["dimension_numbers"]
            lhs = eqn.invars[0].aval.shape
            contract = dims[0][0]
            k = math.prod(lhs[d] for d in contract) or 1
            total += 2.0 * k * _out_size(eqn)
        elif name in ("reduce_sum", "reduce_max", "reduce_min", "reduce_prod"):
            total += int(
                sum(math.prod(v.aval.shape) or 1 for v in eqn.invars)
            )
        elif name == "scan":
            inner = count_jaxpr_flops(eqn.params["jaxpr"])
            total += inner * eqn.params["length"]
        elif name == "while":
            # Trip count unknown statically; count one iteration.
            total += count_jaxpr_flops(eqn.params["body_jaxpr"])
        elif name == "cond":
            total += max(
                count_jaxpr_flops(b) for b in eqn.params["branches"]
            )
        elif name in ("pjit", "jit", "closed_call", "custom_jvp_call",
                      "custom_vjp_call", "remat", "checkpoint"):
            total += count_jaxpr_flops(eqn.params["jaxpr"])
        # Everything else (rng, sort, io) contributes no arithmetic FLOPs.
    return total


@lru_cache(maxsize=None)
def rollout_step_jaxpr():
    """The jaxpr of one fused rollout step (the graph both the Pallas and
    lanes backends run) traced at lane shape (1,). Cached — static."""
    import jax.numpy as jnp

    from ..kernels.lane_rollout import step_cost_and_dynamics
    from ..models import frankaridgeback as fr
    from ..models.model_data import frankaridgeback_model
    from ..objectives.assisted_manipulation import (
        Configuration as ObjectiveConfiguration,
    )

    model = frankaridgeback_model()
    objective_cfg = ObjectiveConfiguration()
    robot_cfg = fr.Configuration()
    _, kp, kd = robot_cfg.resolve()

    def step(q, v, u, energy, target, inv2, pcost, vtarget):
        viol, smooth, q_next, v_next = step_cost_and_dynamics(
            model,
            objective_cfg,
            kp,
            kd,
            [q[i] for i in range(12)],
            [v[i] for i in range(12)],
            [u[i] for i in range(12)],
            energy,
            [target[0], target[1], target[2]],
            inv2,
            pcost,
            vtarget,
            0.01,
        )
        return viol, smooth, jnp.stack(q_next), jnp.stack(v_next)

    one = jnp.ones((1,), jnp.float32)
    scalar = jnp.float32(0.1)
    jaxpr = jax.make_jaxpr(step)(
        jnp.ones((12, 1), jnp.float32),
        jnp.ones((12, 1), jnp.float32),
        jnp.zeros((12, 1), jnp.float32),
        one,
        jnp.zeros((3,), jnp.float32),
        scalar,
        scalar,
        scalar,
    )
    return jaxpr


@lru_cache(maxsize=None)
def rollout_step_flops() -> float:
    """FLOPs per rollout per horizon step of the fused kernel, counted by
    walking ``rollout_step_jaxpr``."""
    return count_jaxpr_flops(rollout_step_jaxpr())


def count_jaxpr_ops(jaxpr) -> dict:
    """Histogram of arithmetic primitives (by name) in a jaxpr, flat —
    no scan scaling; used for the vector-ISSUE model of the VPU roofline
    (scripts/vpu_roofline.py)."""
    jaxpr = jaxpr.jaxpr if hasattr(jaxpr, "jaxpr") else jaxpr
    counts: dict = {}
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in ("pjit", "jit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call", "remat", "checkpoint", "scan",
                    "while", "cond"):
            params = eqn.params
            inner = params.get("jaxpr") or params.get("body_jaxpr")
            if inner is None and "branches" in params:
                inner = params["branches"][0]
            if inner is not None:
                for key, value in count_jaxpr_ops(inner).items():
                    counts[key] = counts.get(key, 0) + value
            continue
        counts[name] = counts.get(name, 0) + 1
    return counts


def count_fma_pairs(jaxpr) -> int:
    """Static count of fusable multiply-add pairs: a ``mul`` whose single
    output feeds exactly one ``add``/``sub`` equation (the pattern the VPU
    issues as ONE fused multiply-add). This is the pessimistic structural
    count — the compiler may find more through reassociation, never
    fewer — so utilization computed from it is an upper bound on the
    instruction count and a LOWER bound on utilization."""
    jaxpr = jaxpr.jaxpr if hasattr(jaxpr, "jaxpr") else jaxpr
    # Consumer map: var -> list of (eqn index, primitive name).
    consumers: dict = {}
    for index, eqn in enumerate(jaxpr.eqns):
        for var in eqn.invars:
            if hasattr(var, "count"):  # Var, not Literal
                consumers.setdefault(var, []).append(
                    (index, eqn.primitive.name)
                )
    pairs = 0
    consumed_adds = set()
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in ("pjit", "jit", "closed_call", "scan", "while", "cond"):
            params = eqn.params
            inner = params.get("jaxpr") or params.get("body_jaxpr")
            if inner is None and "branches" in params:
                inner = params["branches"][0]
            if inner is not None:
                pairs += count_fma_pairs(inner)
            continue
        if name != "mul":
            continue
        out = eqn.outvars[0]
        uses = consumers.get(out, [])
        if len(uses) == 1 and uses[0][1] in ("add", "sub", "add_any"):
            if uses[0][0] not in consumed_adds:  # one mul per add
                consumed_adds.add(uses[0][0])
                pairs += 1
    return pairs


def solve_flops(rollout_count: int, steps: int, control_dof: int = 12) -> float:
    """Total arithmetic FLOPs of one MPPI solve: the fused rollout batch
    plus the weighting contraction (gradient einsum, mppi.cpp:413-418); the
    remaining softmax/smooth/clip work is O(R + S*dof), negligible."""
    return (
        rollout_count * steps * rollout_step_flops()
        + 2.0 * rollout_count * steps * control_dof
    )


# Peak dense f32-accumulate matmul throughput per chip (FLOP/s) by
# jax device_kind, from public TPU specs; and the VPU elementwise peak
# estimate: 8x128 lanes x 4 ALUs x clock.
CHIP_PEAKS = {
    # device_kind fragment: (matmul bf16 peak, vpu elementwise f32 peak)
    "v5 lite": (197e12, 3.6e12),  # v5e: 1024 lanes * 4 * 0.94 GHz
    "v5e": (197e12, 3.6e12),
    "v5p": (459e12, 7.0e12),
    "v4": (275e12, 4.3e12),
    "v6 lite": (918e12, 7.1e12),
    "v6e": (918e12, 7.1e12),
}


def chip_peaks(device=None):
    """(matmul_peak, vpu_peak) FLOP/s for the given (default first) device;
    falls back to v5e numbers when the kind is unknown (e.g. CPU tests)."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for fragment, peaks in CHIP_PEAKS.items():
        if fragment in kind:
            return peaks
    return CHIP_PEAKS["v5e"]
