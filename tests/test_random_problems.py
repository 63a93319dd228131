"""Randomized correctness: for strictly-convex quadratic problems with
random linear equality constraints, the SQP must match the analytic KKT
solution (a property-test sweep beyond the fixed textbook NLPs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.problem.trajectory import TrajOptProblem, stationary_init
from trajopt_tpu.sqp.nlp import Kind, TermSet
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.joint import joint_vel


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_random_eq_constrained_quadratic(seed):
    rng = np.random.default_rng(seed)
    T = int(rng.integers(4, 7))
    D = int(rng.integers(2, 4))
    n = T * D
    K = int(rng.integers(1, min(5, n // 2)))

    x_ref = rng.normal(size=(T, D))
    G = rng.normal(size=(K, n))
    x_feas = rng.normal(size=n)
    h = G @ x_feas

    # cost = sum ||vel||^2 + 0.1 ||x - x_ref||^2  (strictly convex)
    prob = TrajOptProblem(n_steps=T, n_dof=D,
                          joint_lower=np.full(D, -50.0),
                          joint_upper=np.full(D, 50.0))
    prob.add_term(joint_vel(T, D, is_cost=True))
    # per-(step, dof) reference targets need a custom squared term
    prob.add_term(TermSet(
        "ref", Kind.COST_SQ,
        lambda x, p: (x - jnp.asarray(x_ref.reshape(-1), x.dtype)),
        n, weight_fn=lambda p: jnp.asarray(0.1)))
    prob.add_term(TermSet(
        "eq", Kind.CNT_EQ,
        lambda x, p: jnp.asarray(G, x.dtype) @ x - jnp.asarray(h, x.dtype),
        K))

    res = prob.make_solve()(stationary_init(jnp.zeros(D), T))
    assert int(res.status) == SQPStatus.CONVERGED

    # analytic KKT solution of min x'Hx/2 - c'x st Gx=h
    # vel cost: sum_t ||x_{t+1}-x_t||^2 -> H_vel = 2 L'L (L = diff operator)
    L = np.zeros(((T - 1) * D, n))
    for t in range(T - 1):
        for j in range(D):
            L[t * D + j, (t + 1) * D + j] = 1.0
            L[t * D + j, t * D + j] = -1.0
    H = 2.0 * (L.T @ L) + 2.0 * 0.1 * np.eye(n)
    c = 2.0 * 0.1 * x_ref.reshape(-1)
    KKT = np.block([[H, G.T], [G, np.zeros((K, K))]])
    rhs = np.concatenate([c, h])
    sol = np.linalg.solve(KKT, rhs)[:n]

    np.testing.assert_allclose(np.asarray(res.x), sol, atol=2e-3)
    np.testing.assert_allclose(G @ np.asarray(res.x), h, atol=1e-3)
