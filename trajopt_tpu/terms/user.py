"""User-defined terms: arbitrary per-timestep error functions as costs or
constraints (UserDefinedTermInfo, trajopt problem_description.hpp:273-309).

The reference's UserDefinedTermInfo carries a ``VectorOfVector`` error
function (dof values at one step -> error vector) plus an optional analytic
Jacobian, hatched per step as CostFromErrFunc/ConstraintFromErrFunc with a
selectable penalty/constraint type (problem_description.cpp:599-660).  Here
the error function is any pure JAX callable ``err(q, params) -> [m]``;
Jacobians default to autodiff (exact, vs the reference's forward finite
differences) or a user-supplied analytic ``jac(q, params) -> [m, n_dof]``.

The JSON front end exposes this as term type ``user_defined`` resolving
``error_function`` / ``jacobian_function`` names from USER_FUNCTIONS
(register with :func:`register_user_function`) — a superset of the
reference, whose UserDefinedTermInfo::fromJson throws (C++-only API,
problem_description.cpp:594-597).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.sqp.nlp import Kind, TermSet

# name -> callable registry for the JSON hatch (RegisterMaker analog for
# plain error functions)
USER_FUNCTIONS: dict[str, Callable] = {}


def register_user_function(name: str):
    """Decorator: register an error/jacobian function for JSON resolution."""

    def deco(fn: Callable):
        USER_FUNCTIONS[name] = fn
        return fn

    return deco


_PENALTY_KINDS = {"squared": Kind.COST_SQ, "abs": Kind.COST_ABS,
                  "hinge": Kind.COST_HINGE}
_CNT_KINDS = {"eq": Kind.CNT_EQ, "ineq": Kind.CNT_INEQ}


def user_defined_term(
    error_fn: Callable,
    n_steps: int,
    n_dof: int,
    *,
    jac_fn: Callable | None = None,
    is_cost: bool = True,
    penalty_type: str = "squared",      # sco::PenaltyType (cost hatch)
    constraint_type: str = "eq",        # sco::ConstraintType (cnt hatch)
    coeffs=None,
    first_step: int = 0,
    last_step: int = -1,
    fixed_steps: Sequence[int] = (),
    n_dof_total: int | None = None,
    name: str | None = None,
) -> TermSet:
    """Hatch ``error_fn(q_t, params)`` over the selected timesteps
    (UserDefinedTermInfo::hatch, problem_description.cpp:599-660).

    The error row count is probed once at build time with zeros (static
    shapes).  ``coeffs`` scales rows like the reference's coeff vector.
    """
    n_dof_total = n_dof_total or n_dof
    if last_step <= -1:
        last_step = n_steps - 1
    steps = [t for t in range(first_step, last_step + 1)
             if t not in fixed_steps]
    steps_arr = np.asarray(steps)
    S = len(steps)
    if S == 0:
        raise ValueError("user_defined term selects no free timesteps")
    name = name or "user_defined"

    m = int(np.atleast_1d(
        np.asarray(jax.eval_shape(
            lambda q: jnp.atleast_1d(error_fn(q, {})),
            jax.ShapeDtypeStruct((n_dof,), jnp.float64)).shape)).prod())
    cfs = np.ones(m) if coeffs is None else np.broadcast_to(
        np.asarray(coeffs, float).reshape(-1), (m,))

    def rows_q(q, params):
        r = jnp.atleast_1d(jnp.asarray(error_fn(q, params)))
        if is_cost:
            return r
        return r * jnp.asarray(cfs, q.dtype)

    def fn(x, params):
        qs = x.reshape(n_steps, n_dof_total)[:, :n_dof]
        return jax.vmap(lambda q: rows_q(q, params))(qs[steps_arr]).reshape(-1)

    band_starts = np.repeat(steps_arr * n_dof_total, m)

    def _step_jacs(x, params):
        qs = x.reshape(n_steps, n_dof_total)[:, :n_dof]
        if jac_fn is not None:
            J = jax.vmap(lambda q: jnp.asarray(jac_fn(q, params)))(
                qs[steps_arr])
            if not is_cost:
                J = J * jnp.asarray(cfs, x.dtype)[None, :, None]
        else:
            J = jax.vmap(lambda q: jax.jacfwd(
                lambda qq: rows_q(qq, params))(q))(qs[steps_arr])
        return J                                        # [S, m, n_dof]

    def banded_jac(x, params):
        J = _step_jacs(x, params)
        W = jnp.zeros((S * m, n_dof_total), x.dtype)
        return W.at[:, :n_dof].set(J.reshape(S * m, n_dof))

    def jac(x, params):
        J = _step_jacs(x, params)                       # [S, m, n_dof]
        out = jnp.zeros((S, m, n_steps, n_dof_total), x.dtype)
        idx = jnp.asarray(steps_arr)
        out = out.at[jnp.arange(S), :, idx, :n_dof].set(J)
        return out.reshape(S * m, n_steps * n_dof_total)

    if is_cost:
        if penalty_type not in _PENALTY_KINDS:
            raise ValueError(f"penalty_type must be one of "
                             f"{sorted(_PENALTY_KINDS)}")
        kind = _PENALTY_KINDS[penalty_type]
        weight = lambda p: jnp.asarray(np.tile(cfs, S))  # noqa: E731
    else:
        if constraint_type not in _CNT_KINDS:
            raise ValueError(f"constraint_type must be one of "
                             f"{sorted(_CNT_KINDS)}")
        kind = _CNT_KINDS[constraint_type]
        weight = lambda p: jnp.asarray(1.0)  # noqa: E731

    return TermSet(name, kind, fn, S * m, weight_fn=weight,
                   jac_fn=jac, banded_jac=banded_jac,
                   band_starts=band_starts, band_width=n_dof_total)
