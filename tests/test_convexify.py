"""Convexification unit tests (hessian_gradient_unit.cpp +
expressions_unit.cpp analogs): the Gauss-Newton quadratic is symmetric PSD
and matches autodiff of the squared cost at the linearization point; model
values at the linearization point equal exact values; linearized
constraint rows reproduce function values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.sqp.nlp import (
    Kind, Nlp, TermSet, convexify, eval_exact_cnt_viols, eval_exact_costs,
    eval_model_cnt_viols, model_cost_total)

RNG = np.random.default_rng(4)


def _mk_nlp():
    # squared residuals, a hinge cost, an abs cost, eq + ineq constraints
    def r_sq(x, p):
        return jnp.array([x[0] ** 2 - x[1], x[1] * x[2], x[0] + 0.5])

    def r_hinge(x, p):
        return jnp.array([x[2] - 0.3])

    def r_abs(x, p):
        return jnp.array([x[0] - x[2]])

    def g_eq(x, p):
        return jnp.array([jnp.sin(x[0]) + x[1] - 0.7])

    def g_ineq(x, p):
        return jnp.array([x[0] * x[1] - 0.2, -x[2] - 1.0])

    return Nlp(n=3, term_sets=(
        TermSet("sq", Kind.COST_SQ, r_sq, 3,
                weight_fn=lambda p: jnp.array([1.0, 2.0, 0.5])),
        TermSet("hinge", Kind.COST_HINGE, r_hinge, 1,
                weight_fn=lambda p: jnp.asarray(3.0)),
        TermSet("abs", Kind.COST_ABS, r_abs, 1),
        TermSet("eq", Kind.CNT_EQ, g_eq, 1),
        TermSet("ineq", Kind.CNT_INEQ, g_ineq, 2),
    ))


def test_hessian_symmetric_psd():
    nlp = _mk_nlp()
    for _ in range(5):
        x = jnp.asarray(RNG.normal(size=3))
        m = convexify(nlp, x, {})
        P = np.asarray(m.P)
        np.testing.assert_allclose(P, P.T, atol=1e-12)
        w = np.linalg.eigvalsh(P)
        assert w.min() >= -1e-10


def test_model_matches_exact_at_linearization_point():
    nlp = _mk_nlp()
    x = jnp.asarray(RNG.normal(size=3))
    m = convexify(nlp, x, {})
    np.testing.assert_allclose(
        float(model_cost_total(nlp, m, x)),
        float(eval_exact_costs(nlp, x, {}).sum()), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(eval_model_cnt_viols(nlp, m, x)),
        np.asarray(eval_exact_cnt_viols(nlp, x, {})), atol=1e-10)


def test_quadratic_gradient_matches_gauss_newton():
    """grad of the model quadratic at x0 == Gauss-Newton gradient
    2 J' W r of the squared sets (gradient-correction check,
    hessian_gradient_unit.cpp)."""
    nlp = _mk_nlp()
    x = jnp.asarray(RNG.normal(size=3))
    m = convexify(nlp, x, {})
    grad_model = np.asarray(m.P @ x + m.q)

    sq = nlp.term_sets[0]
    r = sq.fn(x, {})
    J = jax.jacrev(lambda v: sq.fn(v, {}))(x)
    w = np.array([1.0, 2.0, 0.5])
    grad_gn = 2.0 * np.asarray(J).T @ (w * np.asarray(r))
    np.testing.assert_allclose(grad_model, grad_gn, atol=1e-10)


def test_constraint_rows_linearize_correctly():
    nlp = _mk_nlp()
    x = jnp.asarray(RNG.normal(size=3))
    m = convexify(nlp, x, {})
    # a(x0) = A x0 + b must equal g(x0); row gradients equal autodiff
    g_all = jnp.concatenate([
        nlp.term_sets[3].fn(x, {}), nlp.term_sets[4].fn(x, {})])
    np.testing.assert_allclose(np.asarray(m.A_cnt @ x + m.b_cnt),
                               np.asarray(g_all), atol=1e-12)
    J_eq = jax.jacrev(lambda v: nlp.term_sets[3].fn(v, {}))(x)
    np.testing.assert_allclose(np.asarray(m.A_cnt[:1]), np.asarray(J_eq),
                               atol=1e-12)


def test_model_is_first_order_accurate():
    nlp = _mk_nlp()
    x = jnp.asarray(RNG.normal(size=3))
    m = convexify(nlp, x, {})
    for _ in range(5):
        dx = 1e-4 * RNG.normal(size=3)
        x2 = x + jnp.asarray(dx)
        exact = float(eval_exact_costs(nlp, x2, {}).sum())
        model = float(model_cost_total(nlp, m, x2))
        assert abs(exact - model) < 5e-7  # second-order error at 1e-4 step
