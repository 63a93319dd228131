"""Joint-space trajectory terms: position / velocity / acceleration / jerk,
each as cost (squared or hinge-band) or constraint (eq or ineq-band).

Re-creates the 16 hand-coded classes Joint{Pos,Vel,Acc,Jerk}{Eq,Ineq}{Cost,
Constraint} of the reference (``trajopt/src/trajectory_costs.cpp``) and the
``hatch`` dispatch of Joint*TermInfo (``trajopt/src/problem_description.cpp:
1037-1560``), vectorized over (step, dof) instead of per-variable expression
graphs.

Finite-difference stencils (trajectory_costs.cpp):
  vel[t]  =  x[t+1] - x[t]                      rows t in [first, last-1]
  acc[t]  =  x[t] - 2 x[t+1] + x[t+2]           rows t in [first, last-2]
  jerk[t] = -x[t] + 3 x[t+1] - 3 x[t+2] + x[t+3] rows t in [first, last-3]

Semantics per Joint*TermInfo docs (problem_description.hpp:445-583):
  * cost + zero tols      -> squared cost, per-dof coeffs weight the square
  * cost + tolerance band -> two hinge rows per (t, dof):
        coeff * (v - target - upper_tol)  and  coeff * (lower_tol - (v - target))
  * cnt  + zero tols      -> equality rows  coeff * (v - target)
  * cnt  + tolerance band -> two inequality rows (same forms as hinge)

``targets/coeffs/tols`` accept a concrete vector (baked into the problem
structure) or a params-dict key string (resolved per problem at solve time,
so goals batch under vmap).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from trajopt_tpu.sqp.nlp import Kind, TermSet

_STENCILS = {
    "pos": (np.array([1.0]), 0),
    "vel": (np.array([-1.0, 1.0]), 1),
    "acc": (np.array([1.0, -2.0, 1.0]), 2),
    "jerk": (np.array([-1.0, 3.0, -3.0, 1.0]), 3),
}


def _resolve(spec, params, n_dof, default=None):
    if spec is None:
        spec = default
    if isinstance(spec, str):
        v = jnp.asarray(params[spec])
    else:
        v = jnp.asarray(spec)
    return jnp.broadcast_to(v, (n_dof,))


def _fix_range(first: int, last: int, n_steps: int, span: int) -> tuple[int, int]:
    """Clamp/expand the step range the way the hatch functions do
    (e.g. JointVelTermInfo::hatch, problem_description.cpp:1208-1224)."""
    if last <= -1:
        last = n_steps - 1
    if first > n_steps - 1 - span:
        first = n_steps - 1 - span
    if last > n_steps - 1:
        last = n_steps - 1
    if last - first < span:
        last = first + span
    if last < first:
        first, last = last, first
    if first < 0 or last > n_steps - 1:
        raise ValueError(
            f"joint term range [{first}, {last}] needs span {span} within "
            f"{n_steps} steps")
    return first, last


def _deriv_rows(x, n_steps, n_dof_total, n_dof, deriv, first, last):
    """[n_t, n_dof] finite-difference values of the given derivative order."""
    stencil, span = _STENCILS[deriv]
    q = x.reshape(n_steps, n_dof_total)[:, :n_dof]
    n_t = last - first + 1 - span
    out = jnp.zeros((n_t, q.shape[1]), x.dtype)
    for k, s in enumerate(stencil):
        out = out + s * q[first + k: first + k + n_t]
    return out


def joint_term(
    deriv: str,
    is_cost: bool,
    n_steps: int,
    n_dof: int,
    *,
    targets=None,
    coeffs=None,
    upper_tols=None,
    lower_tols=None,
    first_step: int = 0,
    last_step: int = -1,
    n_dof_total: int | None = None,
    name: str | None = None,
) -> TermSet:
    """Build the TermSet for one Joint{Pos,Vel,Acc,Jerk}TermInfo.hatch()."""
    if deriv not in _STENCILS:
        raise ValueError(f"unknown joint derivative {deriv!r}")
    stencil, span = _STENCILS[deriv]
    n_dof_total = n_dof_total or n_dof
    first, last = _fix_range(first_step, last_step, n_steps, span)
    n_t = last - first + 1 - span
    name = name or f"joint_{deriv}"

    has_tols = _has_band(upper_tols) or _has_band(lower_tols)

    # Banded structure (structured-QP path): row (t_rel, j) touches columns
    # (first + t_rel + k) * n_dof_total + j for stencil taps k.
    band_width = (span + 1) * n_dof_total
    base_starts = np.repeat(
        (np.arange(first, first + n_t) * n_dof_total), n_dof)

    def _banded_rows(sign_coeffs):
        """[n_t * n_dof, band_width] windows with per-dof coeffs applied."""
        def bj(x, params):
            c = sign_coeffs(params)                       # [n_dof]
            W = jnp.zeros((n_t * n_dof, band_width), x.dtype)
            j_idx = np.tile(np.arange(n_dof), n_t)
            rows = np.arange(n_t * n_dof)
            for k, sv in enumerate(stencil):
                W = W.at[rows, k * n_dof_total + j_idx].set(
                    sv * jnp.tile(c, n_t))
            return W
        return bj

    def values(x, params):
        v = _deriv_rows(x, n_steps, n_dof_total, n_dof, deriv, first, last)
        t = _resolve(targets, params, n_dof, default=np.zeros(n_dof))
        return v - t[None, :]

    if not has_tols:
        if is_cost:
            # squared: weights carry the per-dof coeffs
            def fn(x, params):
                return values(x, params).reshape(-1)

            def weight_fn(params):
                c = _resolve(coeffs, params, n_dof, default=np.ones(n_dof))
                return jnp.tile(c, n_t)

            return TermSet(name, Kind.COST_SQ, fn, n_t * n_dof,
                           weight_fn=weight_fn, linear=True)

        def fn(x, params):
            c = _resolve(coeffs, params, n_dof, default=np.ones(n_dof))
            return (values(x, params) * c[None, :]).reshape(-1)

        return TermSet(
            name, Kind.CNT_EQ, fn, n_t * n_dof, linear=True,
            banded_jac=_banded_rows(
                lambda p: _resolve(coeffs, p, n_dof, default=np.ones(n_dof))),
            band_starts=base_starts, band_width=band_width)

    # Tolerance band: two rows (upper, lower) per (t, dof), coeff-scaled.
    def fn(x, params):
        diff = values(x, params)
        c = _resolve(coeffs, params, n_dof, default=np.ones(n_dof))
        up = _resolve(upper_tols, params, n_dof, default=np.zeros(n_dof))
        lo = _resolve(lower_tols, params, n_dof, default=np.zeros(n_dof))
        upper_rows = (diff - up[None, :]) * c[None, :]
        lower_rows = (lo[None, :] - diff) * c[None, :]
        return jnp.concatenate([upper_rows.reshape(-1), lower_rows.reshape(-1)])

    kind = Kind.COST_HINGE if is_cost else Kind.CNT_INEQ

    def banded_band(x, params):
        c = _resolve(coeffs, params, n_dof, default=np.ones(n_dof))
        up = _banded_rows(lambda p: c)(x, params)
        return jnp.concatenate([up, -up])   # upper rows then lower rows

    return TermSet(name, kind, fn, 2 * n_t * n_dof, linear=True,
                   banded_jac=banded_band,
                   band_starts=np.concatenate([base_starts, base_starts]),
                   band_width=band_width)


def _has_band(tols) -> bool:
    if tols is None:
        return False
    if isinstance(tols, str):
        return True
    return bool(np.any(np.asarray(tols) != 0.0))


# Convenience wrappers matching the reference term names -------------------

def joint_pos(n_steps, n_dof, is_cost=True, **kw) -> TermSet:
    return joint_term("pos", is_cost, n_steps, n_dof, **kw)


def joint_vel(n_steps, n_dof, is_cost=True, **kw) -> TermSet:
    return joint_term("vel", is_cost, n_steps, n_dof, **kw)


def joint_acc(n_steps, n_dof, is_cost=True, **kw) -> TermSet:
    return joint_term("acc", is_cost, n_steps, n_dof, **kw)


def joint_jerk(n_steps, n_dof, is_cost=True, **kw) -> TermSet:
    return joint_term("jerk", is_cost, n_steps, n_dof, **kw)
