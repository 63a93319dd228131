"""Cartesian terms: static/dynamic pose, Cartesian velocity, singularity
avoidance.

Re-creates the error/Jacobian calculator pairs of
``trajopt/src/kinematic_terms.cpp`` as pure JAX residual functions over the
trajectory vector, with Jacobians by autodiff through FK (instead of the
reference's hand-rolled chain-rule + numeric-diff hybrids):

* cart_pose:  CartPoseErrCalculator (kinematic_terms.cpp:250-263) — pose
  error ``calcTransformError(target, source)`` with tcp offsets, index
  masking, tolerance bands.  Cost -> ABS penalty with coeff weights;
  constraint -> EQ rows scaled by coeffs (CartPoseTermInfo::hatch,
  problem_description.cpp:780-830).
* dynamic_cart_pose: DynamicCartPoseErrCalculator — target frame rides on
  another (moving) robot link.
* cart_vel:   CartVelErrCalculator — per-gap displacement limit rows
  [dp - limit; -dp - limit] (INEQ).
* avoid_singularity: AvoidSingularityErrCalculator
  (kinematic_terms.cpp:586-603) — err = 1/(sigma_min + lambda) - 1/(0.1 + lambda).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from trajopt_tpu.kinematics.chain import KinematicTree
from trajopt_tpu.kinematics.transforms import (
    apply_tolerances, compose, transform_error)
from trajopt_tpu.sqp.nlp import Kind, TermSet


def _step_q(x, t, n_steps, n_dof_total, n_dof):
    return x.reshape(n_steps, n_dof_total)[t, :n_dof]


def _step_local_banded(rows_of_q, timestep, n_rows, n_steps, n_dof_total,
                       n_dof):
    """Banded-Jacobian providers for a term whose rows depend on ONE
    timestep's joints (all cartesian pose-style terms are step-local, so
    their QP rows are width-n_dof windows — the structure the reference's
    sparse constraint Jacobians expose, trajopt_ifopt cartesian_*).

    Returns (banded_jac, val_banded_jac, band_starts, band_width) for
    TermSet so `make_solver(structured=True)` accepts the term.
    """
    import jax

    band_starts = np.full((n_rows,), timestep * n_dof_total)

    def banded_jac(x, params):
        q = _step_q(x, timestep, n_steps, n_dof_total, n_dof)
        J = jax.jacfwd(lambda qq: rows_of_q(qq, params))(q)
        W = jnp.zeros((n_rows, n_dof_total), x.dtype)
        return W.at[:, :n_dof].set(J)

    def val_banded_jac(x, params):
        q = _step_q(x, timestep, n_steps, n_dof_total, n_dof)
        r, vjp = jax.vjp(lambda qq: rows_of_q(qq, params), q)
        J = jax.vmap(lambda e: vjp(e)[0])(jnp.eye(n_rows, dtype=x.dtype))
        W = jnp.zeros((n_rows, n_dof_total), x.dtype)
        return r, W.at[:, :n_dof].set(J)

    return banded_jac, val_banded_jac, band_starts, n_dof_total


def _as_pose(pose):
    """Accept (R, p), 4x4, or p-only (identity rotation)."""
    if pose is None:
        return np.eye(3), np.zeros(3)
    if isinstance(pose, tuple):
        return np.asarray(pose[0]), np.asarray(pose[1])
    pose = np.asarray(pose)
    if pose.shape == (4, 4):
        return pose[:3, :3], pose[:3, 3]
    if pose.shape == (3,):
        return np.eye(3), pose
    raise ValueError(f"bad pose spec shape {pose.shape}")


def cart_pose(
    tree: KinematicTree,
    link: str,
    n_steps: int,
    timestep: int,
    *,
    is_cost: bool = True,
    target=None,            # (R, p) | 4x4 | xyz | params key string
    tcp=None,               # source-frame offset (R, p) | 4x4 | xyz
    target_tcp=None,        # offset applied to the target frame
    coeffs=None,            # weights, len = len(indices) (default 6 ones)
    indices: Sequence[int] | None = None,
    upper_tolerance=None,
    lower_tolerance=None,
    n_dof_total: int | None = None,
    name: str | None = None,
) -> TermSet:
    """Pose term for one trajectory timestep (CartPoseTermInfo)."""
    n_dof = tree.n_dof
    n_dof_total = n_dof_total or n_dof
    link_id = tree.link_id(link)
    idx = np.arange(6) if indices is None else np.asarray(indices)
    cfs = np.ones(len(idx)) if coeffs is None else np.broadcast_to(
        np.asarray(coeffs, float), (len(idx),))
    R_tcp, p_tcp = _as_pose(tcp)
    R_ttcp, p_ttcp = _as_pose(target_tcp)
    has_tol = upper_tolerance is not None or lower_tolerance is not None
    up = np.zeros(6) if upper_tolerance is None else np.asarray(upper_tolerance)
    lo = np.zeros(6) if lower_tolerance is None else np.asarray(lower_tolerance)
    name = name or f"cart_pose_{link}_t{timestep}"

    def err6_q(q, params):
        dtype = q.dtype
        R, p = tree.fk(q)
        R_src, p_src = compose(R[link_id], p[link_id],
                               jnp.asarray(R_tcp, dtype), jnp.asarray(p_tcp, dtype))
        if isinstance(target, str):
            tgt = params[target]
            R_t = jnp.asarray(tgt[0], dtype) if isinstance(tgt, tuple) else jnp.eye(3, dtype=dtype)
            p_t = jnp.asarray(tgt[1] if isinstance(tgt, tuple) else tgt, dtype)
        else:
            R_t_np, p_t_np = _as_pose(target)
            R_t, p_t = jnp.asarray(R_t_np, dtype), jnp.asarray(p_t_np, dtype)
        R_t, p_t = compose(R_t, p_t, jnp.asarray(R_ttcp, dtype),
                           jnp.asarray(p_ttcp, dtype))
        e = transform_error(R_t, p_t, R_src, p_src)
        if has_tol:
            e = apply_tolerances(e, jnp.asarray(lo, dtype), jnp.asarray(up, dtype))
        return e[idx]

    def rows_q(q, params):
        if is_cost:
            return err6_q(q, params)
        return err6_q(q, params) * jnp.asarray(cfs, q.dtype)

    fn = lambda x, p: rows_q(  # noqa: E731
        _step_q(x, timestep, n_steps, n_dof_total, n_dof), p)
    bj, vbj, starts, width = _step_local_banded(
        rows_q, timestep, len(idx), n_steps, n_dof_total, n_dof)
    kind = Kind.COST_ABS if is_cost else Kind.CNT_EQ
    weight = (lambda p: jnp.asarray(cfs)) if is_cost else \
        (lambda p: jnp.asarray(1.0))
    return TermSet(name, kind, fn, len(idx), weight_fn=weight,
                   banded_jac=bj, val_banded_jac=vbj,
                   band_starts=starts, band_width=width)


def dynamic_cart_pose(
    tree: KinematicTree,
    source_link: str,
    target_link: str,
    n_steps: int,
    timestep: int,
    *,
    is_cost: bool = True,
    tcp=None,
    target_tcp=None,
    coeffs=None,
    indices: Sequence[int] | None = None,
    n_dof_total: int | None = None,
    name: str | None = None,
) -> TermSet:
    """Pose error between two moving robot frames (DynamicCartPoseErrCalculator)."""
    n_dof = tree.n_dof
    n_dof_total = n_dof_total or n_dof
    src_id = tree.link_id(source_link)
    tgt_id = tree.link_id(target_link)
    idx = np.arange(6) if indices is None else np.asarray(indices)
    cfs = np.ones(len(idx)) if coeffs is None else np.broadcast_to(
        np.asarray(coeffs, float), (len(idx),))
    R_tcp, p_tcp = _as_pose(tcp)
    R_ttcp, p_ttcp = _as_pose(target_tcp)
    name = name or f"dyn_cart_pose_{source_link}_{target_link}_t{timestep}"

    def err_q(q, params):
        dtype = q.dtype
        R, p = tree.fk(q)
        R_s, p_s = compose(R[src_id], p[src_id],
                           jnp.asarray(R_tcp, dtype), jnp.asarray(p_tcp, dtype))
        R_t, p_t = compose(R[tgt_id], p[tgt_id],
                           jnp.asarray(R_ttcp, dtype), jnp.asarray(p_ttcp, dtype))
        return transform_error(R_t, p_t, R_s, p_s)[idx]

    def rows_q(q, params):
        if is_cost:
            return err_q(q, params)
        return err_q(q, params) * jnp.asarray(cfs, q.dtype)

    fn = lambda x, p: rows_q(  # noqa: E731
        _step_q(x, timestep, n_steps, n_dof_total, n_dof), p)
    bj, vbj, starts, width = _step_local_banded(
        rows_q, timestep, len(idx), n_steps, n_dof_total, n_dof)
    kind = Kind.COST_ABS if is_cost else Kind.CNT_EQ
    weight = (lambda p: jnp.asarray(cfs)) if is_cost else \
        (lambda p: jnp.asarray(1.0))
    return TermSet(name, kind, fn, len(idx), weight_fn=weight,
                   banded_jac=bj, val_banded_jac=vbj,
                   band_starts=starts, band_width=width)


def cart_vel(
    tree: KinematicTree,
    link: str,
    n_steps: int,
    *,
    max_displacement: float,
    first_step: int = 0,
    last_step: int = -1,
    is_cost: bool = False,
    coeffs=None,
    n_dof_total: int | None = None,
    name: str | None = None,
) -> TermSet:
    """Per-gap Cartesian displacement limit: rows [dp - limit; -dp - limit]
    for each xyz axis and gap (CartVelTermInfo / CartVelErrCalculator)."""
    n_dof = tree.n_dof
    n_dof_total = n_dof_total or n_dof
    link_id = tree.link_id(link)
    if last_step <= -1:
        last_step = n_steps - 1
    gaps = list(range(first_step, last_step))
    gaps_arr = np.asarray(gaps)
    name = name or f"cart_vel_{link}"
    c = 1.0 if coeffs is None else float(np.asarray(coeffs).reshape(()))
    import jax

    def gap_rows(q0, q1):
        _, p0 = tree.fk(q0)
        _, p1 = tree.fk(q1)
        dp = p1[link_id] - p0[link_id]
        return jnp.concatenate([dp - max_displacement,
                                -dp - max_displacement]) * c

    def fn(x, params):
        qs = x.reshape(n_steps, n_dof_total)[:, :n_dof]
        return jax.vmap(gap_rows)(qs[gaps_arr], qs[gaps_arr + 1]).reshape(-1)

    # Banded rows: each gap's 6 rows cover the two adjacent steps' joints
    # (the same two-step window shape as the cast collision rows).
    G = len(gaps)
    band_width = 2 * n_dof_total
    band_starts = np.repeat(gaps_arr * n_dof_total, 6)

    def banded_jac(x, params):
        qs = x.reshape(n_steps, n_dof_total)[:, :n_dof]
        J0, J1 = jax.vmap(jax.jacfwd(gap_rows, argnums=(0, 1)))(
            qs[gaps_arr], qs[gaps_arr + 1])            # [G, 6, n_dof]
        W = jnp.zeros((6 * G, band_width), x.dtype)
        W = W.at[:, :n_dof].set(J0.reshape(-1, n_dof))
        W = W.at[:, n_dof_total:n_dof_total + n_dof].set(
            J1.reshape(-1, n_dof))
        return W

    kind = Kind.COST_HINGE if is_cost else Kind.CNT_INEQ
    return TermSet(name, kind, fn, 6 * G, banded_jac=banded_jac,
                   band_starts=band_starts, band_width=band_width)


def cart_line(
    tree: KinematicTree,
    link: str,
    n_steps: int,
    timestep: int,
    *,
    line_start,            # pose spec: (R, p) | 4x4 | xyz
    line_end,
    is_cost: bool = False,
    coeffs=None,
    indices: Sequence[int] | None = None,
    tcp=None,
    n_dof_total: int | None = None,
    name: str | None = None,
) -> TermSet:
    """Constrain a link pose to a line segment between two target poses
    (CartLineConstraint, trajopt_ifopt/src/constraints/
    cartesian_line_constraint.cpp:119-149): the target is the nearest point
    on the segment (position = clamped projection, orientation = slerp by
    the projection parameter), then a cart_pose-style error to it."""
    from trajopt_tpu.kinematics.transforms import (
        axis_angle_matrix, rotvec_from_matrix)

    n_dof = tree.n_dof
    n_dof_total = n_dof_total or n_dof
    link_id = tree.link_id(link)
    idx = np.arange(6) if indices is None else np.asarray(indices)
    cfs = np.ones(len(idx)) if coeffs is None else np.broadcast_to(
        np.asarray(coeffs, float), (len(idx),))
    R1_np, p1_np = _as_pose(line_start)
    R2_np, p2_np = _as_pose(line_end)
    R_tcp, p_tcp = _as_pose(tcp)
    name = name or f"cart_line_{link}_t{timestep}"

    def err_q(q, params):
        dtype = q.dtype
        R, p = tree.fk(q)
        R_src, p_src = compose(R[link_id], p[link_id],
                               jnp.asarray(R_tcp, dtype), jnp.asarray(p_tcp, dtype))
        p1 = jnp.asarray(p1_np, dtype)
        p2 = jnp.asarray(p2_np, dtype)
        R1 = jnp.asarray(R1_np, dtype)
        R2 = jnp.asarray(R2_np, dtype)
        ab = p2 - p1
        t = jnp.clip(jnp.dot(p_src - p1, ab) / (jnp.dot(ab, ab) + 1e-12),
                     0.0, 1.0)
        p_line = p1 + t * ab
        # slerp: R(t) = R1 exp(t log(R1' R2))
        rv = rotvec_from_matrix(R1.T @ R2)
        angle = jnp.linalg.norm(rv) + 1e-12
        R_line = R1 @ axis_angle_matrix(rv / angle, t * angle)
        return transform_error(R_line, p_line, R_src, p_src)[idx]

    def rows_q(q, params):
        if is_cost:
            return err_q(q, params)
        return err_q(q, params) * jnp.asarray(cfs, q.dtype)

    fn = lambda x, p: rows_q(  # noqa: E731
        _step_q(x, timestep, n_steps, n_dof_total, n_dof), p)
    bj, vbj, starts, width = _step_local_banded(
        rows_q, timestep, len(idx), n_steps, n_dof_total, n_dof)
    kind = Kind.COST_ABS if is_cost else Kind.CNT_EQ
    weight = (lambda p: jnp.asarray(cfs)) if is_cost else \
        (lambda p: jnp.asarray(1.0))
    return TermSet(name, kind, fn, len(idx), weight_fn=weight,
                   banded_jac=bj, val_banded_jac=vbj,
                   band_starts=starts, band_width=width)


def ik_constraint(
    tree: KinematicTree,
    link: str,
    n_steps: int,
    timestep: int,
    *,
    target,                # pose spec for the IK target
    q_seed,
    is_cost: bool = False,
    coeffs=None,
    pos_only: bool = False,
    n_dof_total: int | None = None,
    name: str | None = None,
) -> TermSet:
    """Constrain joint values at a timestep toward the IK solution of a
    target pose (InverseKinematicsConstraint: rows = q_t - ik(target),
    trajopt_ifopt/src/constraints/inverse_kinematics_constraint.cpp).
    The IK solve runs once at term-construction time."""
    from trajopt_tpu.kinematics.ik import solve_ik

    n_dof = tree.n_dof
    n_dof_total = n_dof_total or n_dof
    R_t, p_t = _as_pose(target)
    q_ik, err_norm = solve_ik(tree, link, R_t, p_t,
                              jnp.asarray(q_seed, jnp.float64),
                              pos_only=pos_only)
    q_ik = np.asarray(q_ik)
    cfs = np.ones(n_dof) if coeffs is None else np.broadcast_to(
        np.asarray(coeffs, float), (n_dof,))
    name = name or f"ik_{link}_t{timestep}"

    def rows_q(q, params):
        if is_cost:
            return q - jnp.asarray(q_ik, q.dtype)
        return (q - jnp.asarray(q_ik, q.dtype)) * jnp.asarray(cfs, q.dtype)

    fn = lambda x, p: rows_q(  # noqa: E731
        _step_q(x, timestep, n_steps, n_dof_total, n_dof), p)
    bj, vbj, starts, width = _step_local_banded(
        rows_q, timestep, n_dof, n_steps, n_dof_total, n_dof)
    kind = Kind.COST_SQ if is_cost else Kind.CNT_EQ
    weight = (lambda p: jnp.asarray(cfs)) if is_cost else \
        (lambda p: jnp.asarray(1.0))
    return TermSet(name, kind, fn, n_dof, weight_fn=weight, linear=True,
                   banded_jac=bj, val_banded_jac=vbj,
                   band_starts=starts, band_width=width)


def avoid_singularity(
    tree: KinematicTree,
    link: str,
    n_steps: int,
    *,
    lambda_: float = 1.0e-3,
    coeff: float = 1.0,
    first_step: int = 0,
    last_step: int = -1,
    joints: Sequence[int] | None = None,
    n_dof_total: int | None = None,
    name: str | None = None,
) -> TermSet:
    """err_t = 1/(sigma_min(J_t) + lambda) - 1/(0.1 + lambda), hinge cost
    (AvoidSingularityErrCalculator, kinematic_terms.cpp:586-603).

    ``joints`` restricts the Jacobian to a subset of active-joint columns —
    the AvoidSingularitySubsetErrCalculator variant (kinematic_terms.hpp,
    subset_kin_ vs superset joints) used when only part of a composite
    group should stay away from singularities.
    """
    n_dof = tree.n_dof
    n_dof_total = n_dof_total or n_dof
    if last_step <= -1:
        last_step = n_steps - 1
    steps = list(range(first_step, last_step + 1))
    name = name or f"avoid_singularity_{link}"
    threshold = 1.0 / (0.1 + lambda_)
    cols = None if joints is None else np.asarray(list(joints))

    steps_arr = np.asarray(steps)
    import jax

    def err_one(q):
        J = tree.jacobian(q, link)
        if cols is not None:
            J = J[:, cols]
        s = jnp.linalg.svd(J, compute_uv=False)
        return 1.0 / (s[-1] + lambda_) - threshold

    def fn(x, params):
        qs = x.reshape(n_steps, n_dof_total)[:, :n_dof]
        return jax.vmap(err_one)(qs[steps_arr])

    band_starts = steps_arr * n_dof_total

    def banded_jac(x, params):
        qs = x.reshape(n_steps, n_dof_total)[:, :n_dof]
        g = jax.vmap(jax.grad(err_one))(qs[steps_arr])     # [S, n_dof]
        W = jnp.zeros((len(steps), n_dof_total), x.dtype)
        return W.at[:, :n_dof].set(g)

    return TermSet(name, Kind.COST_HINGE, fn, len(steps),
                   weight_fn=lambda p: jnp.asarray(coeff),
                   banded_jac=banded_jac, band_starts=band_starts,
                   band_width=n_dof_total)
