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
cart_pose, dynamic_cart_pose, cart_vel, avoid_singularity, total_time,
user_defined.  ``manip`` selects a robot via the caller-provided
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
                 backend: str = "jax", log_results: bool = False,
                 log_dir: str = "/tmp"):
        self.prob = prob
        self.init_traj = init_traj
        self.sqp = sqp
        self.backend = backend  # basic_info.convex_solver / TRAJOPT_CONVEX_SOLVER
        self.log_results = log_results  # opt_info.log_results/log_dir:
        self.log_dir = log_dir          # per-iteration CSV logs on solve()

    def solve(self, params: Any = None):
        callback = None
        logger = None
        if self.log_results:
            # optimizers.cpp:708-718 writes trajopt_{solver,vars}.log to
            # log_dir when log_results is set; mirror with the CSV logger
            # callback (host side, per SQP iteration).
            from trajopt_tpu.callbacks import CsvLogger, \
                make_iteration_callback
            logger = CsvLogger()
            callback = make_iteration_callback(logger)
        if self.backend == "native":
            # host reference driver + native C++ QP (the reference's
            # selectable-backend path, solver_interface.cpp:255-292)
            import jax.numpy as jnp
            from trajopt_tpu.sqp.reference_solver import solve_reference
            nlp = self.prob.build()
            x0 = jnp.asarray(self.init_traj).reshape(-1)
            lb, ub = self.prob.bounds(x0)
            res = solve_reference(nlp, np.asarray(x0), np.asarray(lb),
                                  np.asarray(ub), params or {}, self.sqp)
        else:
            res = self.prob.make_solve(self.sqp, callback=callback)(
                self.init_traj, params or {})
        if logger is not None:
            import os
            os.makedirs(self.log_dir, exist_ok=True)
            logger.write_solver_log(os.path.join(self.log_dir,
                                                 "trajopt_solver.log"))
            logger.write_vars_log(os.path.join(self.log_dir,
                                               "trajopt_vars.log"))
        return res


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

    # Init trajectory is parsed FIRST: collision terms derive their LVS
    # sub-step count from its per-gap displacement (see _add_term).
    init_traj = _parse_init(doc.get("init_info", {"type": "stationary"}),
                            env, n_steps, use_time)

    for section, is_cost in (("costs", True), ("constraints", False)):
        for i, term_doc in enumerate(doc.get(section, [])):
            _add_term(prob, env, term_doc, is_cost,
                      f"{section}[{i}]", init_traj=init_traj)

    oi = doc.get("opt_info", {})
    sqp = _parse_opt_info(oi)
    from trajopt_tpu.utils.config import env_qp_backend
    backend = str(bi.get("convex_solver", env_qp_backend())).lower()
    # Reference-schema documents use the reference's ModelType names
    # (solver_interface.hpp:233-259; numerical_ik1.json has AUTO_SOLVER):
    # first-order/default solvers map to the ADMM path, interior-point
    # solvers (BPMPD, GUROBI) to the IPM algorithm class.
    backend = {"auto_solver": "jax", "osqp": "jax", "qpoases": "jax",
               "bpmpd": "ipm", "gurobi": "ipm"}.get(backend, backend)
    if backend not in ("jax", "native", "ipm"):
        raise ValueError(f"unknown convex_solver {backend!r} "
                         "(expected 'jax', 'native', 'ipm', or a reference "
                         "ModelType name: AUTO_SOLVER/OSQP/QPOASES/BPMPD/"
                         "GUROBI)")
    if backend == "ipm":
        # Second algorithm class (interior-point, qp/ipm.py) on the jitted
        # solver path — the reference's selectable QP backend role
        # (solver_interface.cpp:255-292; BPMPD/Gurobi are interior-point).
        import dataclasses as _dc
        sqp = _dc.replace(sqp, qp_algorithm="ipm")
        backend = "jax"
    return JsonProblem(prob, init_traj, sqp, backend=backend,
                       log_results=bool(oi.get("log_results", False)),
                       log_dir=str(oi.get("log_dir", "/tmp")))


def _add_term(prob: TrajOptProblem, env: Environment, doc: dict,
              is_cost: bool, where: str, init_traj=None):
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
                              "use_weighted_sum", "pairs", "max_num_cnt"},
                     where)
        if env.scene is None:
            raise ValueError("collision term requires env.scene")
        ev = _EVALUATOR_MAP[int(params.get("evaluator_type", 1))]
        # ContactTestType {FIRST=0, CLOSEST=1, ALL=2} (pd.cpp:1652-1657):
        # the static all-pairs narrowphase IS the ALL semantics; FIRST and
        # CLOSEST would change which contacts exist, so reject them loudly.
        ctt = int(params.get("contact_test_type", 2))
        if ctt != 2:
            raise ValueError(
                f"contact_test_type={ctt} unsupported in {where}: the "
                f"static narrowphase evaluates ALL (=2) contacts")
        # coeffs / dist_pen: scalar or per-timestep vector
        dist_pen = np.asarray(params["dist_pen"], float).reshape(-1)
        coeff = np.asarray(params.get("coeffs", 20.0), float).reshape(-1)
        # per-link-pair overrides (pd.cpp:1700-1710)
        pair_coeffs: dict = {}
        pair_margins: dict = {}
        for j, ent in enumerate(params.get("pairs", [])):
            _ensure_only(ent, {"link", "pair", "coeffs", "dist_pen"},
                         f"{where}.pairs[{j}]")
            link = ent["link"]
            plist = list(ent["pair"])
            if not plist:
                raise ValueError(f"empty pair list in {where}.pairs[{j}]")
            for p in plist:
                if "coeffs" in ent:
                    pair_coeffs[(link, p)] = float(ent["coeffs"])
                if "dist_pen" in ent:
                    pair_margins[(link, p)] = float(ent["dist_pen"])
        # longest_valid_segment_length bounds interpolation spacing.  The
        # reference subdivides each gap by ACTUAL joint motion at every
        # CalcCollisions call: ceil(|dq|/lvs) sub-segments
        # (collision_terms.cpp:845-855).  Static shapes need a fixed count;
        # derive it from the INIT trajectory's worst gap displacement —
        # known at construction, and an upper bound in practice since the
        # smoothing costs only shrink per-gap motion during the solve.
        # The count is capped at 8: our swept kernels cover each
        # sub-segment's full translational sweep exactly (union-hull cast,
        # world.py _convex_swept_group_distance; capsule edge sweeps), so
        # unlike the reference's interpolated-state model the residual
        # error is only the rotation chord ~ L*(dq/n)^2/8 — about a
        # millimetre at 8 sub-segments for 1-rad arm-scale gaps, far
        # below reference margins — while the reference needs
        # dq/n <= lvs to bound a FIRST-order interpolation error (hence
        # its much finer 0.02-rad subdivision).  The conformance tests
        # verify outcomes with the reference's own 0.05 LVS continuous
        # check, independent of this internal count.
        lvs_len = float(params.get("longest_valid_segment_length", 0.5))
        if init_traj is not None:
            tr = np.asarray(init_traj)[:, :n_dof]
            max_disp = float(np.max(np.linalg.norm(np.diff(tr, axis=0),
                                                   axis=1))) if n_steps > 1 \
                else 0.0
        else:
            max_disp = 0.5
        lvs_substeps = max(2, min(8, int(np.ceil(max_disp
                                                 / max(lvs_len, 1e-4)))))
        mnc = params.get("max_num_cnt")
        if mnc is None and env.scene.n_pairs > 64:
            # Static all-pairs rows make the QP quadratically large on
            # reference-scale scenes (PR2: 1759 candidate geom pairs ->
            # ~80k QP rows for a 6-step cast problem).  The reference's
            # fixed-size stack caps contacts the same way: find ALL
            # contacts, sort by worst, keep max_num_cnt (default 3 link
            # pairs, collision_types.h:156-162).  Our cap is per
            # step/sub-segment over geom pairs, so default more
            # generously; pass max_num_cnt explicitly to override.
            # MEASURED (round 4, benchmarks/aggregate_compare.py; table
            # in ROADMAP.md): on the pr2ish cast scene hard top-k beats
            # both all-pairs (17x run time, 3.2 vs 2.0 mean SQP iters)
            # and the reference-style weighted-average aggregation (2.6
            # iters, 10x run time), with identical 16/16
            # converged+verified and the best worst-case clearance;
            # k=16 and k=32 measure identically, 32 keeps headroom.
            mnc = 32
        prob.add_term(collision_term(
            env.scene, n_steps,
            margin=dist_pen if dist_pen.size > 1 else float(dist_pen[0]),
            coeff=coeff if coeff.size > 1 else float(coeff[0]),
            is_cost=is_cost, evaluator=ev,
            first_step=int(params.get("first_step", 0)),
            last_step=int(params.get("last_step", -1)),
            fixed_steps=list(params.get("fixed_steps", [])),
            lvs_substeps=lvs_substeps,
            pair_coeffs=pair_coeffs or None,
            pair_margins=pair_margins or None,
            max_num_cnt=int(mnc) if mnc is not None else None,
            aggregate=("weighted_average"
                       if bool(params.get("use_weighted_sum", False))
                       else "none"),
            safety_margin_buffer=float(params.get("safety_margin_buffer",
                                                  0.0)),
            n_dof_total=prob.n_dof_total, name=name))
    elif ttype == "user_defined":
        # Superset of the reference (UserDefinedTermInfo::fromJson throws,
        # pd.cpp:594-597): functions resolve by name from USER_FUNCTIONS.
        _ensure_only(params, {"error_function", "jacobian_function",
                              "penalty_type", "constraint_type", "coeffs",
                              "first_step", "last_step", "fixed_steps"},
                     where)
        from trajopt_tpu.terms.user import USER_FUNCTIONS, user_defined_term
        err_name = params["error_function"]
        if err_name not in USER_FUNCTIONS:
            raise ValueError(
                f"error_function {err_name!r} not registered "
                f"(register_user_function) in {where}")
        jac_name = params.get("jacobian_function")
        if jac_name is not None and jac_name not in USER_FUNCTIONS:
            raise ValueError(f"jacobian_function {jac_name!r} not "
                             f"registered in {where}")
        pen_names = {0: "squared", 1: "abs", 2: "hinge"}
        cnt_names = {0: "eq", 1: "ineq"}
        pen = params.get("penalty_type", "squared")
        cnt = params.get("constraint_type", "eq")
        prob.add_term(user_defined_term(
            USER_FUNCTIONS[err_name], n_steps, n_dof,
            jac_fn=USER_FUNCTIONS.get(jac_name),
            is_cost=is_cost,
            penalty_type=pen_names.get(pen, pen),
            constraint_type=cnt_names.get(cnt, cnt),
            coeffs=params.get("coeffs"),
            first_step=int(params.get("first_step", 0)),
            last_step=int(params.get("last_step", -1)),
            fixed_steps=list(params.get("fixed_steps", [])),
            n_dof_total=prob.n_dof_total, name=name))
    elif ttype in ("cart_pose", "dynamic_cart_pose"):
        # Shared field set: CartPoseTermInfo::fromJson
        # (problem_description.cpp:726-766) and
        # DynamicCartPoseTermInfo::fromJson (:312-350, registered at :53)
        # read the same params; both apply source/target frame offsets.
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
        src_xyz = np.asarray(params.get("source_frame_offset_xyz",
                                        [0, 0, 0]), float)
        src_R = _quat_to_matrix(np.asarray(
            params.get("source_frame_offset_wxyz", [1, 0, 0, 0]), float))
        xyz = np.asarray(params.get(
            "target_frame_offset_xyz", params.get("xyz", [0, 0, 0])), float)
        wxyz = np.asarray(params.get(
            "target_frame_offset_wxyz", params.get("wxyz", [1, 0, 0, 0])), float)
        R = _quat_to_matrix(wxyz)
        target_moves = (
            target_frame is not None
            and target_frame in env.tree.link_names
            and np.any(env.tree.ancestor[env.tree.link_id(target_frame)]))
        if ttype == "dynamic_cart_pose":
            # The reference requires an actual moving target frame here
            # (DynamicCartPoseTermInfo::hatch asserts both frames are
            # active); a static target_frame is a config error.
            if target_frame is None:
                raise ValueError(f"dynamic_cart_pose requires target_frame "
                                 f"in {where}")
            if target_frame not in env.tree.link_names:
                raise ValueError(f"unknown target_frame {target_frame!r} "
                                 f"in {where}")
            if not target_moves:
                raise ValueError(
                    f"dynamic_cart_pose target_frame {target_frame!r} is "
                    f"static; use cart_pose in {where}")
        if target_moves:
            prob.add_term(cart_terms.dynamic_cart_pose(
                env.tree, link, target_frame, n_steps, timestep,
                is_cost=is_cost, tcp=(src_R, src_xyz),
                target_tcp=(R, xyz), coeffs=coeffs,
                n_dof_total=prob.n_dof_total, name=name))
        else:
            prob.add_term(cart_terms.cart_pose(
                env.tree, link, n_steps, timestep, is_cost=is_cost,
                tcp=(src_R, src_xyz), target=(R, xyz), coeffs=coeffs,
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
    if "max_time" in doc:
        # wall-clock budget; enforced by the host-driven reference solver
        # (TIME_LIMIT status) — see SQPParams.max_time
        kw["max_time"] = float(doc["max_time"])
    if "num_threads" in doc:
        # The reference's num_threads selects OpenMP term-parallel
        # evaluation; term evaluation here is one fused batched trace, and
        # throughput scaling is by vmapped problem batching.  0/1 (auto/
        # serial) are equivalent semantics; larger values have no analog.
        if int(doc["num_threads"]) > 1:
            raise ValueError(
                "opt_info.num_threads > 1 has no analog: term evaluation "
                "is fused on-device; batch problems (vmap) for parallelism")
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
