"""Time-parameterized terms (TT_USE_TIME): velocity/acceleration with a
1/dt column, and the total-trajectory-time term.

Reference semantics (``trajopt/src/kinematic_terms.cpp``):

* joint_vel + time (JointVelErrCalculator, kinematic_terms.cpp:427-442):
  ``vel[t] = (x[t+1] - x[t]) * inv_dt[t+1]`` and each (t, dof) produces TWO
  rows, upper = vel - target - upper_tol and lower = lower_tol - (vel -
  target) — "for equality terms tols are 0, so error is effectively
  doubled".
* joint_acc + time (JointAccErrCalculator, :473-488):
  ``acc[t] = 2 (vel[t+1] - vel[t]) / (inv_dt[t+1] + inv_dt[t+2])``
  (reproduced as-is, including the reference's own comment doubting it).
* total_time (TimeCostCalculator, :572-577): ``sum(1/inv_dt) - limit``;
  squared when limit == 0, hinge otherwise (TotalTimeTermInfo::hatch,
  problem_description.cpp:1863-1886).

The decision matrix is [n_steps, n_dof + 1]; the last column holds 1/dt
(TrajOptProb's time column, problem_description.cpp:553-592).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from trajopt_tpu.sqp.nlp import Kind, TermSet
from trajopt_tpu.terms.joint import _resolve


def joint_vel_time(
    n_steps: int,
    n_dof: int,
    *,
    is_cost: bool = True,
    targets=None,
    coeffs=None,
    upper_tols=None,
    lower_tols=None,
    first_step: int = 0,
    last_step: int = -1,
    name: str = "joint_vel_time",
) -> TermSet:
    """Velocity term with 1/dt scaling.  Always emits the doubled
    upper/lower rows like JointVelErrCalculator."""
    n_dt = n_dof + 1
    if last_step <= -1:
        last_step = n_steps - 1
    first, last = first_step, last_step
    n_t = last - first

    def rows(x, params):
        m = x.reshape(n_steps, n_dt)
        q = m[:, :n_dof]
        inv_dt = m[:, n_dof]
        t = _resolve(targets, params, n_dof, default=np.zeros(n_dof))
        up = _resolve(upper_tols, params, n_dof, default=np.zeros(n_dof))
        lo = _resolve(lower_tols, params, n_dof, default=np.zeros(n_dof))
        vel = (q[first + 1:last + 1] - q[first:last]) * \
            inv_dt[first + 1:last + 1, None]
        upper = vel - t[None, :] - up[None, :]
        lower = lo[None, :] - (vel - t[None, :])
        return jnp.concatenate([upper.reshape(-1), lower.reshape(-1)])

    n_rows = 2 * n_t * n_dof

    if is_cost:
        has_tols = upper_tols is not None or lower_tols is not None

        def weight_fn(params):
            c = _resolve(coeffs, params, n_dof, default=np.ones(n_dof))
            return jnp.tile(c, 2 * n_t)

        kind = Kind.COST_HINGE if has_tols else Kind.COST_SQ
        return TermSet(name, kind, rows, n_rows, weight_fn=weight_fn)

    def fn(x, params):
        c = _resolve(coeffs, params, n_dof, default=np.ones(n_dof))
        return rows(x, params) * jnp.tile(c, 2 * n_t)

    has_tols = upper_tols is not None or lower_tols is not None
    kind = Kind.CNT_INEQ if has_tols else Kind.CNT_EQ
    return TermSet(name, kind, fn, n_rows)


def joint_acc_time(
    n_steps: int,
    n_dof: int,
    *,
    is_cost: bool = True,
    limit: float = 0.0,
    coeffs=None,
    first_step: int = 0,
    last_step: int = -1,
    name: str = "joint_acc_time",
) -> TermSet:
    n_dt = n_dof + 1
    if last_step <= -1:
        last_step = n_steps - 1
    first, last = first_step, last_step
    n_t = last - first - 1

    def rows(x, params):
        m = x.reshape(n_steps, n_dt)
        q = m[first:last + 1, :n_dof]
        inv_dt = m[first:last + 1, n_dof]
        vel = (q[1:] - q[:-1]) * inv_dt[1:, None]
        vel_diff = vel[1:] - vel[:-1]
        acc = 2.0 * vel_diff / (inv_dt[1:-1] + inv_dt[2:])[:, None]
        return (acc - limit).reshape(-1)

    n_rows = n_t * n_dof
    if is_cost:
        def weight_fn(params):
            c = _resolve(coeffs, params, n_dof, default=np.ones(n_dof))
            return jnp.tile(c, n_t)

        return TermSet(name, Kind.COST_SQ, rows, n_rows, weight_fn=weight_fn)

    def fn(x, params):
        c = _resolve(coeffs, params, n_dof, default=np.ones(n_dof))
        return rows(x, params) * jnp.tile(c, n_t)

    return TermSet(name, Kind.CNT_EQ, fn, n_rows)


def total_time(
    n_steps: int,
    n_dof: int,
    *,
    is_cost: bool = True,
    coeff: float = 1.0,
    limit: float = 0.0,
    name: str = "total_time",
) -> TermSet:
    """sum of dt (= sum 1/inv_dt) relative to limit (TotalTimeTermInfo)."""
    n_dt = n_dof + 1

    def fn(x, params):
        inv_dt = x.reshape(n_steps, n_dt)[:, n_dof]
        return jnp.atleast_1d(jnp.sum(1.0 / inv_dt) - limit)

    hinge = not np.isclose(limit, 0.0)
    if is_cost:
        kind = Kind.COST_HINGE if hinge else Kind.COST_SQ
        return TermSet(name, kind, fn, 1,
                       weight_fn=lambda p: jnp.asarray(coeff))
    kind = Kind.CNT_INEQ if hinge else Kind.CNT_EQ
    return TermSet(name, kind, lambda x, p: fn(x, p) * coeff, 1)
