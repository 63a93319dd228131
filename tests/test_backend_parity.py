"""Cross-backend trajectory parity: the jitted JAX solver vs the host
Python + native C++ QP reference driver must produce trajectories within
1e-3 joint-space tolerance (the BASELINE.json parity criterion applied to
our two independent execution paths, mirroring the backend-parameterized
tests of small-problems-unit.cpp:184)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_collision import boxbot_scene, spherebot_scene
from trajopt_tpu.problem.trajectory import TrajOptProblem, given_init, stationary_init
from trajopt_tpu.qp.native import available
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.sqp.reference_solver import solve_reference
from trajopt_tpu.terms.collision import collision_term
from trajopt_tpu.terms.joint import joint_pos, joint_vel

pytestmark = pytest.mark.skipif(not available(),
                                reason="native backend not buildable")


def _both(prob, init, params=None):
    params = params or {}
    jres = prob.make_solve()(init, params)
    nlp = prob.build()
    x0 = jnp.asarray(init).reshape(-1)
    lb, ub = prob.bounds(x0)
    rres = solve_reference(nlp, np.asarray(x0), np.asarray(lb), np.asarray(ub),
                           params)
    return jres, rres


def test_parity_joint_only():
    n = 5
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets=np.array([1.5, -2.0]),
                            first_step=n - 1, last_step=n - 1))
    jres, rres = _both(prob, stationary_init(jnp.zeros(2), n))
    assert int(jres.status) == SQPStatus.CONVERGED
    assert rres.status == SQPStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(jres.x), rres.x, atol=1e-3)


def test_parity_collision_problem():
    s = spherebot_scene()
    prob = TrajOptProblem(n_steps=1, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10])
    prob.add_term(collision_term(s, 1, margin=0.3, coeff=1.0, is_cost=True))
    prob.add_term(collision_term(s, 1, margin=0.2, coeff=1.0, is_cost=False))
    prob.add_term(joint_pos(1, 2, is_cost=True, targets=np.zeros(2),
                            first_step=0, last_step=0))
    jres, rres = _both(prob, given_init(jnp.array([[-0.75, 0.75]])))
    assert int(jres.status) == SQPStatus.CONVERGED
    assert rres.status == SQPStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(jres.x), rres.x, atol=1e-3)


def test_parity_cast_problem():
    s = boxbot_scene()
    n = 3
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0, n - 1])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(collision_term(s, n, margin=0.05, coeff=20.0, is_cost=False,
                                 evaluator="cast", fixed_steps=[0, n - 1]))
    init = given_init(jnp.array([[-1.9, 0.0], [0.0, 1.2], [1.9, 0.0]]))
    jres, rres = _both(prob, init)
    assert int(jres.status) == SQPStatus.CONVERGED
    assert rres.status == SQPStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(jres.x), rres.x, atol=1e-3)


def test_parity_all_execution_paths():
    """Every QP execution path (dense JAX ADMM, structured block-banded,
    block-banded + NS refresh, fused pallas kernel [interpret on CPU],
    native C++ host driver) must agree on the same problem within the
    1e-3 parity budget — the AllSolvers matrix of small-problems-unit.cpp
    applied to a collision problem."""
    import dataclasses

    from trajopt_tpu.qp.admm import ADMMConfig
    from trajopt_tpu.sqp.params import SQPParams

    s = spherebot_scene()
    n = 4
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets=np.array([2.0, 0.3]),
                            first_step=n - 1, last_step=n - 1))
    prob.add_term(collision_term(s, n, margin=0.1, coeff=20.0, is_cost=False,
                                 fixed_steps=[0]))
    init = stationary_init(jnp.array([-2.0, 0.0]), n)

    results = {"dense": prob.make_solve()(init, {})}
    results["structured"] = prob.make_solve(structured=True)(init, {})
    sqp_ns = dataclasses.replace(SQPParams(), qp=ADMMConfig(ns_refresh=True))
    results["ns"] = prob.make_solve(sqp_ns, structured=True)(init, {})
    sqp_pl = dataclasses.replace(SQPParams(), qp=ADMMConfig(use_pallas=True))
    results["pallas"] = prob.make_solve(sqp_pl, structured=True)(init, {})

    nlp = prob.build()
    x0 = jnp.asarray(init).reshape(-1)
    lb, ub = prob.bounds(x0)
    ref = solve_reference(nlp, np.asarray(x0), np.asarray(lb), np.asarray(ub),
                          {})
    assert ref.status == SQPStatus.CONVERGED
    for name, res in results.items():
        assert int(res.status) == SQPStatus.CONVERGED, name
        np.testing.assert_allclose(np.asarray(res.x), ref.x, atol=1e-3,
                                   err_msg=name)
