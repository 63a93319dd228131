"""End-to-end structured (banded-ADMM) solver vs the dense path: same
trajectories on joint-only and collision problems."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_collision import boxbot_scene, spherebot_scene
from trajopt_tpu.problem.trajectory import TrajOptProblem, given_init, stationary_init
from trajopt_tpu.sqp.params import SQPParams, SQPStatus
from trajopt_tpu.terms.collision import collision_term
from trajopt_tpu.terms.joint import joint_pos, joint_vel


def _both(prob, init, params=None):
    params = params or {}
    d = prob.make_solve()(init, params)
    s = prob.make_solve(structured=True)(init, params)
    return d, s


def test_structured_matches_dense_joint_problem():
    n = 5
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets=np.array([1.5, -2.0]),
                            first_step=n - 1, last_step=n - 1))
    d, s = _both(prob, stationary_init(jnp.zeros(2), n))
    assert int(d.status) == SQPStatus.CONVERGED
    assert int(s.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(s.x), np.asarray(d.x), atol=1e-4)


def test_structured_matches_dense_collision_problem():
    sc = spherebot_scene()
    n = 4
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets="goal",
                            first_step=n - 1, last_step=n - 1))
    prob.add_term(collision_term(sc, n, margin=0.1, coeff=20.0, is_cost=False,
                                 fixed_steps=[0]))
    d, s = _both(prob, stationary_init(jnp.array([-2.0, 0.0]), n),
                 {"goal": jnp.array([2.0, 0.3])})
    assert int(d.status) == SQPStatus.CONVERGED
    assert int(s.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(s.x), np.asarray(d.x), atol=1e-3)


def test_structured_cast_with_hinge_cost():
    sc = boxbot_scene()
    n = 3
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0, n - 1])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    # hinge COST (penalty rows) + cnt rows together
    prob.add_term(collision_term(sc, n, margin=0.08, coeff=5.0, is_cost=True,
                                 evaluator="cast", fixed_steps=[0, n - 1]))
    prob.add_term(collision_term(sc, n, margin=0.05, coeff=20.0, is_cost=False,
                                 evaluator="cast", fixed_steps=[0, n - 1]))
    init = given_init(jnp.array([[-1.9, 0.0], [0.0, 1.2], [1.9, 0.0]]))
    d, s = _both(prob, init)
    assert int(d.status) == SQPStatus.CONVERGED
    assert int(s.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(s.x), np.asarray(d.x), atol=2e-3)


def test_structured_requires_banded_jacs():
    from trajopt_tpu.sqp.nlp import Kind, TermSet
    prob = TrajOptProblem(n_steps=2, n_dof=1, joint_lower=[-1],
                          joint_upper=[1])
    prob.add_term(TermSet("opaque", Kind.CNT_EQ,
                          lambda x, p: jnp.atleast_1d(jnp.sum(x)), 1))
    with pytest.raises(ValueError, match="banded_jac"):
        prob.make_solve(structured=True)
