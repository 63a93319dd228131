"""JSON problem front end — same document schema as the reference.

Parses the reference's problem documents (``ProblemConstructionInfo::
fromJson``, ``trajopt/src/problem_description.cpp:272-307``):

  basic_info:  n_steps, manip, fixed_timesteps, fixed_dofs, use_time,
               dt_lower_lim, dt_upper_lim (pd.cpp:118-134)
  opt_info:    trust-region/penalty solver overrides (pd.cpp:136-160)
  costs / constraints: [{type, name, params: {...}}] dispatched through a
               term-type registry like TermInfo::fromName (pd.cpp:106)
  init_info:   stationary | joint_interpolated | given_traj (+ dt)
               (pd.cpp:222-269)

Unknown document fields are rejected like ``ensure_only_members``
(pd.cpp:32-45).  Term coverage: joint_{pos,vel,acc,jerk}, collision,
cart_pose, cart_vel.  ``manip`` selects a robot via the caller-provided
environment (kinematic tree + collision scene).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Callable

import numpy as np

from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.kinematics.chain import KinematicTree
from trajopt_tpu.problem.trajectory import (
    TrajOptProblem, given_init, interpolated_init, stationary_init)
from trajopt_tpu.sqp.params import SQPParams
from trajopt_tpu.terms import cartesian as cart_terms
from trajopt_tpu.terms import joint as joint_terms
from trajopt_tpu.terms.collision import collision_term

# tesseract::collision::CollisionEvaluatorType int values accepted by the
# reference JSON (pd.cpp:1626-1638)
_EVALUATOR_MAP = {1: "discrete", 2: "lvs_discrete", 3: "cast", 4: "cast"}

# User-extensible term-type registry: the TermInfo::RegisterMaker analog
# (problem_description.hpp:199-230).  A builder receives
# (prob, env, params_dict, is_cost, name) and must prob.add_term(...).
TERM_REGISTRY: dict[str, Callable] = {}


def register_term_type(type_name: str):
    """Decorator: register a custom JSON term type (RegisterMaker)."""

    def deco(builder: Callable):
        TERM_REGISTRY[type_name] = builder
        return builder

    return deco


@dataclasses.dataclass
class Environment:
    """What the reference gets from tesseract: kinematics + collision."""

    tree: KinematicTree
    scene: CollisionScene | None = None
    current_state: np.ndarray | None = None


class JsonProblem:
    def __init__(self, prob: TrajOptProblem, init_traj, sqp: SQPParams,
                 backend: str = "jax"):
        self.prob = prob
        self.init_traj = init_traj
        self.sqp = sqp
        self.backend = backend  # basic_info.convex_solver / TRAJOPT_CONVEX_SOLVER

    def solve(self, params: Any = None):
        if self.backend == "native":
            # host reference driver + native C++ QP (the reference's
            # selectable-backend path, solver_interface.cpp:255-292)
            import jax.numpy as jnp
            from trajopt_tpu.sqp.reference_solver import solve_reference
            nlp = self.prob.build()
            x0 = jnp.asarray(self.init_traj).reshape(-1)
            lb, ub = self.prob.bounds(x0)
            return solve_reference(nlp, np.asarray(x0), np.asarray(lb),
                                   np.asarray(ub), params or {}, self.sqp)
        return self.prob.make_solve(self.sqp)(self.init_traj, params or {})


def _ensure_only(d: dict, allowed: set[str], where: str):
    unknown = set(d) - allowed
    if unknown:
        raise ValueError(f"unknown fields {sorted(unknown)} in {where}")


def _broadcast(v, n, default=None):
    if v is None:
        v = default
    arr = np.asarray(v, float).reshape(-1)
    if arr.size == 1:
        arr = np.full(n, arr[0])
    if arr.size != n:
        raise ValueError(f"expected length {n}, got {arr.size}")
    return arr


def load_problem_file(path: str, env: Environment) -> JsonProblem:
    """Load a problem document from .json or .yaml/.yml (the reference's
    yaml_extensions role for problem configs)."""
    with open(path) as f:
        text = f.read()
    if path.endswith((".yaml", ".yml")):
        import yaml
        doc = yaml.safe_load(text)
    else:
        doc = json.loads(text)
    return construct_problem(doc, env)


def construct_problem(doc: dict | str, env: Environment) -> JsonProblem:
    """ConstructProblem(json, env) analog (pd.cpp:544-551)."""
    if isinstance(doc, str):
        doc = json.loads(doc)
    _ensure_only(doc, {"basic_info", "opt_info", "costs", "constraints",
                       "init_info", "param_info"}, "problem document")

    bi = doc["basic_info"]
    _ensure_only(bi, {"n_steps", "manip", "fixed_timesteps", "fixed_dofs",
                      "convex_solver", "dt_lower_lim", "dt_upper_lim",
                      "use_time", "start_fixed", "robot"}, "basic_info")
    n_steps = int(bi["n_steps"])
    use_time = bool(bi.get("use_time", False))
    n_dof = env.tree.n_dof

    prob = TrajOptProblem(
        n_steps=n_steps, n_dof=n_dof,
        joint_lower=env.tree.lower, joint_upper=env.tree.upper,
        use_time=use_time,
        dt_lower=float(bi.get("dt_lower_lim", 1.0)),
        dt_upper=float(bi.get("dt_upper_lim", 1.0)),
        fixed_steps=list(bi.get("fixed_timesteps", [])),
        fixed_dofs=list(bi.get("fixed_dofs", [])),
    )

    for section, is_cost in (("costs", True), ("constraints", False)):
        for i, term_doc in enumerate(doc.get(section, [])):
            _add_term(prob, env, term_doc, is_cost,
                      f"{section}[{i}]")

    init_traj = _parse_init(doc.get("init_info", {"type": "stationary"}),
                            env, n_steps, use_time)

    sqp = _parse_opt_info(doc.get("opt_info", {}))
    import os as _os
    backend = str(bi.get("convex_solver",
                         _os.environ.get("TRAJOPT_CONVEX_SOLVER",
                                         "jax"))).lower()
    return JsonProblem(prob, init_traj, sqp, backend=backend)


def _add_term(prob: TrajOptProblem, env: Environment, doc: dict,
              is_cost: bool, where: str):
    _ensure_only(doc, {"type", "name", "params", "term_type"}, where)
    ttype = doc["type"]
    params = dict(doc.get("params", {}))
    name = doc.get("name", ttype)
    n_dof = prob.n_dof
    n_steps = prob.n_steps
    kw_common = dict(n_dof_total=prob.n_dof_total, name=name)

    if ttype == "total_time":
        _ensure_only(params, {"coeff", "limit"}, where)
        from trajopt_tpu.terms import time as time_terms
        prob.add_term(time_terms.total_time(
            n_steps, n_dof, is_cost=is_cost,
            coeff=float(params.get("coeff", 1.0)),
            limit=float(params.get("limit", 0.0)), name=name))
        return
    if ttype in ("joint_pos", "joint_vel", "joint_acc", "joint_jerk"):
        _ensure_only(params, {"coeffs", "targets", "upper_tols", "lower_tols",
                              "first_step", "last_step", "use_time"}, where)
        # basic_info.use_time switches supporting terms to their
        # 1/dt-scaled variants (readCosts: term_type |= TT_USE_TIME)
        if prob.use_time and ttype in ("joint_vel", "joint_acc"):
            from trajopt_tpu.terms import time as time_terms
            mk = (time_terms.joint_vel_time if ttype == "joint_vel"
                  else time_terms.joint_acc_time)
            kw = dict(is_cost=is_cost,
                      coeffs=_broadcast(params.get("coeffs"), n_dof, 1.0),
                      first_step=int(params.get("first_step", 0)),
                      last_step=int(params.get("last_step", -1)),
                      name=name)
            if ttype == "joint_vel":
                kw.update(
                    targets=_broadcast(params.get("targets"), n_dof, 0.0),
                    upper_tols=(_broadcast(params["upper_tols"], n_dof)
                                if "upper_tols" in params else None),
                    lower_tols=(_broadcast(params["lower_tols"], n_dof)
                                if "lower_tols" in params else None))
            prob.add_term(mk(n_steps, n_dof, **kw))
            return
        deriv = {"joint_pos": "pos", "joint_vel": "vel",
                 "joint_acc": "acc", "joint_jerk": "jerk"}[ttype]
        prob.add_term(joint_terms.joint_term(
            deriv, is_cost, n_steps, n_dof,
            targets=_broadcast(params.get("targets"), n_dof, 0.0),
            coeffs=_broadcast(params.get("coeffs"), n_dof, 1.0),
            upper_tols=_broadcast(params.get("upper_tols"), n_dof, 0.0),
            lower_tols=_broadcast(params.get("lower_tols"), n_dof, 0.0),
            first_step=int(params.get("first_step", 0)),
            last_step=int(params.get("last_step", -1)),
            **kw_common))
    elif ttype == "collision":
        _ensure_only(params, {"coeffs", "dist_pen", "evaluator_type",
                              "first_step", "last_step", "fixed_steps",
                              "longest_valid_segment_length",
                              "safety_margin_buffer", "contact_test_type",
                              "use_weighted_sum"}, where)
        if env.scene is None:
            raise ValueError("collision term requires env.scene")
        ev = _EVALUATOR_MAP[int(params.get("evaluator_type", 1))]
        dist_pen = float(np.asarray(params["dist_pen"]).reshape(-1)[0])
        coeff = float(np.asarray(params.get("coeffs", 20.0)).reshape(-1)[0])
        # longest_valid_segment_length bounds interpolation spacing; we use
        # a fixed sub-step count per gap instead (static shapes) — derive a
        # conservative count from it when provided.
        lvs_len = float(params.get("longest_valid_segment_length", 0.5))
        lvs_substeps = max(2, min(8, int(np.ceil(0.5 / max(lvs_len, 1e-3)))))
        prob.add_term(collision_term(
            env.scene, n_steps, margin=dist_pen, coeff=coeff,
            is_cost=is_cost, evaluator=ev,
            first_step=int(params.get("first_step", 0)),
            last_step=int(params.get("last_step", -1)),
            fixed_steps=list(params.get("fixed_steps", [])),
            lvs_substeps=lvs_substeps,
            n_dof_total=prob.n_dof_total, name=name))
    elif ttype == "cart_pose":
        _ensure_only(params, {"timestep", "source_frame", "target_frame",
                              "pos_coeffs", "rot_coeffs",
                              "source_frame_offset_xyz",
                              "source_frame_offset_wxyz",
                              "target_frame_offset_xyz",
                              "target_frame_offset_wxyz",
                              "xyz", "wxyz", "link"}, where)
        timestep = int(params.get("timestep", n_steps - 1))
        pos_c = _broadcast(params.get("pos_coeffs"), 3, 1.0)
        rot_c = _broadcast(params.get("rot_coeffs"), 3, 1.0)
        coeffs = np.concatenate([pos_c, rot_c])
        link = params.get("source_frame", params.get("link"))
        target_frame = params.get("target_frame")
        xyz = np.asarray(params.get(
            "target_frame_offset_xyz", params.get("xyz", [0, 0, 0])), float)
        wxyz = np.asarray(params.get(
            "target_frame_offset_wxyz", params.get("wxyz", [1, 0, 0, 0])), float)
        R = _quat_to_matrix(wxyz)
        if target_frame and target_frame in env.tree.link_names and \
                np.any(env.tree.ancestor[env.tree.link_id(target_frame)]):
            prob.add_term(cart_terms.dynamic_cart_pose(
                env.tree, link, target_frame, n_steps, timestep,
                is_cost=is_cost, target_tcp=(R, xyz), coeffs=coeffs,
                n_dof_total=prob.n_dof_total, name=name))
        else:
            prob.add_term(cart_terms.cart_pose(
                env.tree, link, n_steps, timestep, is_cost=is_cost,
                target=(R, xyz), coeffs=coeffs,
                n_dof_total=prob.n_dof_total, name=name))
    elif ttype == "avoid_singularity":
        _ensure_only(params, {"link", "lambda", "coeffs", "first_step",
                              "last_step"}, where)
        prob.add_term(cart_terms.avoid_singularity(
            env.tree, params.get("link", env.tree.link_names[-1]),
            n_steps, lambda_=float(params.get("lambda", 1e-3)),
            coeff=float(np.asarray(params.get("coeffs", 1.0)).reshape(-1)[0]),
            first_step=int(params.get("first_step", 0)),
            last_step=int(params.get("last_step", -1)),
            n_dof_total=prob.n_dof_total, name=name))
    elif ttype == "cart_vel":
        _ensure_only(params, {"first_step", "last_step", "max_displacement",
                              "link"}, where)
        prob.add_term(cart_terms.cart_vel(
            env.tree, params["link"], n_steps,
            max_displacement=float(params["max_displacement"]),
            first_step=int(params.get("first_step", 0)),
            last_step=int(params.get("last_step", -1)),
            is_cost=is_cost, n_dof_total=prob.n_dof_total, name=name))
    elif ttype in TERM_REGISTRY:
        TERM_REGISTRY[ttype](prob, env, params, is_cost, name)
    else:
        raise ValueError(f"unknown term type {ttype!r} in {where}")


def _parse_init(doc: dict, env: Environment, n_steps: int, use_time: bool):
    import jax.numpy as jnp

    _ensure_only(doc, {"type", "data", "endpoint", "dt"}, "init_info")
    t = doc.get("type", "stationary").lower()
    dt = float(doc.get("dt", 1.0)) if use_time else None
    if t == "stationary":
        cur = env.current_state
        if cur is None:
            cur = np.zeros(env.tree.n_dof)
        return stationary_init(jnp.asarray(np.asarray(cur, float)), n_steps, dt)
    if t == "given_traj":
        data = np.asarray(doc["data"], float)
        if data.shape != (n_steps, env.tree.n_dof):
            raise ValueError(f"given_traj data has shape {data.shape}, "
                             f"expected {(n_steps, env.tree.n_dof)}")
        return given_init(jnp.asarray(data), dt)
    if t == "joint_interpolated":
        end = np.asarray(doc["endpoint"], float)
        cur = env.current_state
        if cur is None:
            cur = np.zeros(env.tree.n_dof)
        return interpolated_init(jnp.asarray(np.asarray(cur, float)),
                                 jnp.asarray(end), n_steps, dt)
    raise ValueError(f"unknown init_info type {t!r}")


def _parse_opt_info(doc: dict) -> SQPParams:
    allowed = {
        "improve_ratio_threshold", "min_trust_box_size", "min_approx_improve",
        "min_approx_improve_frac", "max_iter", "trust_shrink_ratio",
        "trust_expand_ratio", "cnt_tolerance", "max_merit_coeff_increases",
        "merit_coeff_increase_ratio", "initial_merit_error_coeff",
        "trust_box_size", "max_time", "log_results", "log_dir", "num_threads",
        "inflate_constraints_individually", "max_qp_solver_failures",
    }
    _ensure_only(doc, allowed, "opt_info")
    kw = {}
    for k in ("improve_ratio_threshold", "min_trust_box_size",
              "min_approx_improve", "min_approx_improve_frac",
              "trust_shrink_ratio", "trust_expand_ratio", "cnt_tolerance",
              "merit_coeff_increase_ratio", "initial_merit_error_coeff"):
        if k in doc:
            kw[k] = float(doc[k])
    for k in ("max_iter", "max_merit_coeff_increases", "max_qp_solver_failures"):
        if k in doc:
            kw[k] = int(doc[k])
    if "inflate_constraints_individually" in doc:
        kw["inflate_constraints_individually"] = bool(
            doc["inflate_constraints_individually"])
    if "trust_box_size" in doc:
        kw["initial_trust_box_size"] = float(doc["trust_box_size"])
    return dataclasses.replace(SQPParams(), **kw)


def _quat_to_matrix(wxyz):
    w, x, y, z = [float(v) for v in wxyz]
    n = np.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])
