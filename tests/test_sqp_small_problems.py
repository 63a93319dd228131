"""SQP driver tests on textbook NLPs with known optima.

Mirrors trajopt_sco/test/small-problems-unit.cpp: quadratic sanity cases and
Hock-Schittkowski TP1/TP3/TP6/TP7 with the same initial points, expected
solutions, and solver-parameter overrides (small-problems-unit.cpp:49-172).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.qp.admm import ADMMConfig
from trajopt_tpu.sqp.nlp import Kind, Nlp, TermSet
from trajopt_tpu.sqp.params import SQPParams, SQPStatus
from trajopt_tpu.sqp.solver import make_solver

INF = float("inf")


def solve(nlp, x0, sqp=SQPParams()):
    n = nlp.n
    solver = make_solver(nlp, sqp=sqp)
    return solver(jnp.asarray(x0, jnp.float64),
                  jnp.full((n,), -INF), jnp.full((n,), INF), params={})


def test_quadratic_separable():
    # f = x0^2 + (x1-1)^2 + (x2-2)^2, start (3,4,5) -> (0,1,2)
    # small-problems-unit.cpp:48-64
    nlp = Nlp(n=3, term_sets=(
        TermSet("f", Kind.COST_GENERIC_FULL,
                lambda x, p: x[0] ** 2 + (x[1] - 1.0) ** 2 + (x[2] - 2.0) ** 2,
                n_rows=1),
    ))
    res = solve(nlp, [3.0, 4.0, 5.0],
                dataclasses.replace(SQPParams(), initial_trust_box_size=100.0))
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(res.x, [0.0, 1.0, 2.0], atol=1e-3)


def test_quadratic_nonseparable():
    # f = (x0-x1+3x2)^2 + (x0-1)^2 + (x2-2)^2 -> (1, 7, 2)
    # small-problems-unit.cpp:65-83
    nlp = Nlp(n=3, term_sets=(
        TermSet("f", Kind.COST_GENERIC_FULL,
                lambda x, p: (x[0] - x[1] + 3.0 * x[2]) ** 2
                + (x[0] - 1.0) ** 2 + (x[2] - 2.0) ** 2,
                n_rows=1),
    ))
    sqp = dataclasses.replace(
        SQPParams(), initial_trust_box_size=100.0,
        min_trust_box_size=1e-5, min_approx_improve=1e-6)
    res = solve(nlp, [3.0, 4.0, 5.0], sqp)
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(res.x, [1.0, 7.0, 2.0], atol=1e-2)


def _hs_params():
    # testProblem solver overrides (small-problems-unit.cpp:99-105)
    return dataclasses.replace(
        SQPParams(),
        max_iter=1000,
        min_trust_box_size=1e-5,
        min_approx_improve=1e-10,
        initial_merit_error_coeff=1.0,
        qp=ADMMConfig(eps_abs=1e-10, eps_rel=1e-10, max_iter=3000),
    )


def _hs_problem(f, g, cnt_kind, init, sol):
    nlp = Nlp(n=len(init), term_sets=(
        TermSet("f", Kind.COST_GENERIC_FULL, lambda x, p: f(x), n_rows=1),
        TermSet("g", cnt_kind, lambda x, p: g(x), n_rows=1),
    ))
    res = solve(nlp, init, _hs_params())
    assert int(res.status) == SQPStatus.CONVERGED, SQPStatus.NAMES[int(res.status)]
    np.testing.assert_allclose(res.x, sol, atol=1e-2)


def test_tp1():
    _hs_problem(
        lambda x: (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2,
        lambda x: jnp.array([-1.5 - x[1]]),
        Kind.CNT_INEQ, [-2.0, 1.0], [1.0, 1.0])


def test_tp3():
    _hs_problem(
        lambda x: x[1] + 1e-5 * (x[1] - x[0]) ** 2,
        lambda x: jnp.array([0.0 - x[1]]),
        Kind.CNT_INEQ, [10.0, 1.0], [0.0, 0.0])


def test_tp6():
    _hs_problem(
        lambda x: (1.0 - x[0]) ** 2,
        lambda x: jnp.array([10.0 * (x[1] - x[0] ** 2)]),
        Kind.CNT_EQ, [10.0, 1.0], [1.0, 1.0])


def test_tp7():
    _hs_problem(
        lambda x: jnp.log(1.0 + x[0] ** 2) - x[1],
        lambda x: jnp.array([(1.0 + x[0] ** 2) ** 2 + x[1] ** 2 - 4.0]),
        Kind.CNT_EQ, [2.0, 2.0], [0.0, float(np.sqrt(3.0))])


def test_squared_cost_term_set():
    # Least-squares path (Gauss-Newton convexification): fit x to targets
    # under an inequality keeping x0 <= 0.5.
    nlp = Nlp(n=2, term_sets=(
        TermSet("fit", Kind.COST_SQ,
                lambda x, p: x - jnp.array([1.0, 2.0]), n_rows=2),
        TermSet("cap", Kind.CNT_INEQ, lambda x, p: jnp.array([x[0] - 0.5]),
                n_rows=1),
    ))
    res = solve(nlp, [0.0, 0.0])
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(res.x, [0.5, 2.0], atol=1e-3)


def test_abs_and_hinge_cost_sets():
    # abs cost pulls x0 to 1 (weight 5 beats quadratic pull to 0);
    # hinge cost penalizes x1 > 0.25.
    nlp = Nlp(n=2, term_sets=(
        TermSet("quad", Kind.COST_SQ, lambda x, p: x - jnp.array([0.0, 1.0]),
                n_rows=2),
        TermSet("pull", Kind.COST_ABS, lambda x, p: jnp.array([x[0] - 1.0]),
                n_rows=1, weight_fn=lambda p: jnp.asarray(5.0)),
        TermSet("cap", Kind.COST_HINGE, lambda x, p: jnp.array([x[1] - 0.25]),
                n_rows=1, weight_fn=lambda p: jnp.asarray(100.0)),
    ))
    res = solve(nlp, [0.0, 0.0],
                dataclasses.replace(SQPParams(), initial_trust_box_size=10.0))
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(res.x, [1.0, 0.25], atol=1e-3)


def test_var_bounds_respected():
    nlp = Nlp(n=2, term_sets=(
        TermSet("fit", Kind.COST_SQ,
                lambda x, p: x - jnp.array([5.0, -5.0]), n_rows=2),
    ))
    solver = make_solver(nlp)
    res = solver(jnp.zeros(2, jnp.float64),
                 jnp.array([-1.0, -1.0]), jnp.array([1.0, 1.0]), params={})
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(res.x, [1.0, -1.0], atol=1e-4)


def test_vmap_batch_of_goals():
    # One structure, many goals: vmapped solve must match per-problem solves.
    nlp = Nlp(n=2, term_sets=(
        TermSet("fit", Kind.COST_SQ, lambda x, p: x - p["goal"], n_rows=2),
        TermSet("cap", Kind.CNT_INEQ, lambda x, p: jnp.array([x[0] - 0.5]),
                n_rows=1),
    ))
    solver = make_solver(nlp)
    goals = jnp.array([[1.0, 2.0], [-3.0, 0.5], [0.2, -0.7], [4.0, 4.0]])
    lb = jnp.full((2,), -INF)
    ub = jnp.full((2,), INF)
    batched = jax.jit(jax.vmap(lambda g: solver(jnp.zeros(2, jnp.float64),
                                                lb, ub, {"goal": g})))
    res = batched(goals)
    assert np.all(np.asarray(res.status) == SQPStatus.CONVERGED)
    expected = np.minimum(np.asarray(goals), [0.5, INF])
    np.testing.assert_allclose(res.x, expected, atol=1e-3)


def test_penalty_escalation_infeasible_start():
    # Start far outside the feasible set with a tiny initial merit coeff so
    # the penalty loop must escalate (optimizers.cpp:938-968).
    nlp = Nlp(n=1, term_sets=(
        TermSet("pull", Kind.COST_SQ, lambda x, p: x - 10.0, n_rows=1),
        TermSet("wall", Kind.CNT_INEQ, lambda x, p: x - 1.0, n_rows=1),
    ))
    sqp = dataclasses.replace(SQPParams(), initial_merit_error_coeff=0.01)
    res = solve(nlp, [9.0], sqp)
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(res.x, [1.0], atol=1e-3)
    assert float(res.merit_coeffs[0]) > 0.01  # escalated
