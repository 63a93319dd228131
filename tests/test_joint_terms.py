"""Joint-term tests: stencil values vs numpy, jacobians vs finite
differences, and small end-to-end joint-space solves.

Mirrors trajopt/test/joint_costs_unit.cpp (cost/cnt/tolerance matrix) and
the joint_{position,velocity,acceleration,jerk}_optimization_unit tests of
trajopt_optimizers/trajopt_sqp/test/.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.sqp.nlp import Kind, eval_exact_cnt_viols, eval_exact_costs
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.joint import joint_acc, joint_jerk, joint_pos, joint_vel
from trajopt_tpu.problem.trajectory import (
    TrajOptProblem, given_init, interpolated_init, stationary_init)

T, D = 6, 3
RNG = np.random.default_rng(0)
X = jnp.asarray(RNG.normal(size=(T, D)))


def numpy_derivs(x):
    x = np.asarray(x)
    vel = x[1:] - x[:-1]
    acc = x[:-2] - 2 * x[1:-1] + x[2:]
    jerk = -x[:-3] + 3 * x[1:-2] - 3 * x[2:-1] + x[3:]
    return vel, acc, jerk


def test_stencil_values_match_numpy():
    vel, acc, jerk = numpy_derivs(X)
    for name, term, ref in [
        ("vel", joint_vel(T, D, is_cost=False), vel),
        ("acc", joint_acc(T, D, is_cost=False), acc),
        ("jerk", joint_jerk(T, D, is_cost=False), jerk),
    ]:
        r = term.fn(X.reshape(-1), {})
        np.testing.assert_allclose(r, ref.reshape(-1), atol=1e-12, err_msg=name)


def test_jacobians_match_finite_difference():
    for term in [
        joint_pos(T, D, is_cost=False, targets=np.zeros(D)),
        joint_vel(T, D, is_cost=False),
        joint_acc(T, D, is_cost=False),
        joint_jerk(T, D, is_cost=False),
        joint_vel(T, D, is_cost=False, upper_tols=np.full(D, 0.1),
                  lower_tols=np.full(D, -0.1)),
    ]:
        x = X.reshape(-1)
        J = jax.jacrev(lambda v: term.fn(v, {}))(x)
        eps = 1e-6
        J_fd = np.zeros_like(np.asarray(J))
        for i in range(x.shape[0]):
            xp = x.at[i].add(eps)
            xm = x.at[i].add(-eps)
            J_fd[:, i] = (term.fn(xp, {}) - term.fn(xm, {})) / (2 * eps)
        np.testing.assert_allclose(J, J_fd, atol=1e-6, err_msg=term.name)


def test_squared_cost_value_semantics():
    # cost = sum_t sum_j c_j (vel - target)^2 (trajectory_costs.cpp:257-295)
    coeffs = np.array([1.0, 2.0, 3.0])
    targets = np.array([0.1, 0.0, -0.2])
    term = joint_vel(T, D, is_cost=True, coeffs=coeffs, targets=targets)
    from trajopt_tpu.sqp.nlp import Nlp
    nlp = Nlp(n=T * D, term_sets=(term,))
    got = float(eval_exact_costs(nlp, X.reshape(-1), {})[0])
    vel, _, _ = numpy_derivs(X)
    want = float(np.sum(coeffs * (vel - targets) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_ineq_cnt_band_violations():
    # Constraint band: violation only outside [lower, upper] tols.
    up = np.full(D, 0.5)
    lo = np.full(D, -0.5)
    term = joint_vel(T, D, is_cost=False, upper_tols=up, lower_tols=lo)
    from trajopt_tpu.sqp.nlp import Nlp
    nlp = Nlp(n=T * D, term_sets=(term,))
    vel, _, _ = numpy_derivs(X)
    want = np.sum(np.maximum(vel - 0.5, 0.0)) + np.sum(np.maximum(-0.5 - vel, 0.0))
    got = float(eval_exact_cnt_viols(nlp, X.reshape(-1), {})[0])
    np.testing.assert_allclose(got, want, rtol=1e-9)


def _solve(prob, init, params=None):
    solve = prob.make_solve()
    return solve(init, params or {})


def test_vel_cost_with_endpoint_cnt_gives_straight_line():
    # The box_cast_test.json joint part: vel cost + pos cnt at last step +
    # fixed step 0 -> interior point is the midpoint.
    prob = TrajOptProblem(
        n_steps=3, n_dof=2,
        joint_lower=[-10, -10], joint_upper=[10, 10],
        fixed_steps=[0],
    )
    prob.add_term(joint_vel(3, 2, is_cost=True, coeffs=[1.0, 1.0]))
    prob.add_term(joint_pos(3, 2, is_cost=False, targets=np.array([1.9, 3.8]),
                            first_step=2, last_step=2))
    init = given_init(jnp.array([[-1.9, 0.0], [0.0, 1.9], [1.9, 3.8]]))
    res = _solve(prob, init)
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(3, 2)
    np.testing.assert_allclose(traj[0], [-1.9, 0.0], atol=1e-6)
    np.testing.assert_allclose(traj[2], [1.9, 3.8], atol=1e-4)
    np.testing.assert_allclose(traj[1], [0.0, 1.9], atol=1e-3)


def test_velocity_limit_constraint_enforced():
    # 7 steps from 0 to 3 with |vel| <= 0.51: feasible (6 gaps * 0.51 > 3).
    n, d = 7, 1
    prob = TrajOptProblem(n_steps=n, n_dof=d, joint_lower=[-10], joint_upper=[10],
                          fixed_steps=[0])
    prob.add_term(joint_vel(n, d, is_cost=True))
    prob.add_term(joint_pos(n, d, is_cost=False, targets=np.array([3.0]),
                            first_step=n - 1, last_step=n - 1))
    prob.add_term(joint_vel(n, d, is_cost=False, upper_tols=np.array([0.51]),
                            lower_tols=np.array([-0.51])))
    init = stationary_init(jnp.zeros(1), n)
    res = _solve(prob, init)
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(n, d)
    vels = np.diff(traj, axis=0)
    assert np.all(np.abs(vels) <= 0.51 + 1e-3)
    np.testing.assert_allclose(traj[-1], [3.0], atol=1e-3)


def test_acc_cost_smooths_trajectory():
    n, d = 8, 1
    prob = TrajOptProblem(n_steps=n, n_dof=d, joint_lower=[-10], joint_upper=[10],
                          fixed_steps=[0, n - 1])
    prob.add_term(joint_acc(n, d, is_cost=True, coeffs=[10.0]))
    init = given_init(jnp.asarray(RNG.normal(size=(n, d))))
    init = init.at[0, 0].set(0.0).at[-1, 0].set(1.0)
    res = _solve(prob, init)
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(n, d)
    acc = traj[:-2] - 2 * traj[1:-1] + traj[2:]
    assert np.max(np.abs(acc)) < 1e-3  # minimum-acc path between fixed ends


def test_interpolated_init_shape_and_endpoints():
    tr = interpolated_init(jnp.zeros(3), jnp.ones(3) * 2.0, 5)
    assert tr.shape == (5, 3)
    np.testing.assert_allclose(tr[0], 0.0)
    np.testing.assert_allclose(tr[-1], 2.0)
    np.testing.assert_allclose(tr[2], 1.0)


def test_batched_goal_solves():
    n, d = 4, 2
    prob = TrajOptProblem(n_steps=n, n_dof=d, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, d, is_cost=True))
    prob.add_term(joint_pos(n, d, is_cost=False, targets="goal",
                            first_step=n - 1, last_step=n - 1))
    solve = prob.make_solve()
    goals = jnp.array([[1.0, -1.0], [2.0, 0.5], [-0.3, 3.0]])
    init = stationary_init(jnp.zeros(d), n)
    res = jax.jit(jax.vmap(lambda g: solve(init, {"goal": g})))(goals)
    assert np.all(np.asarray(res.status) == SQPStatus.CONVERGED)
    final = np.asarray(res.x).reshape(3, n, d)[:, -1, :]
    np.testing.assert_allclose(final, np.asarray(goals), atol=1e-3)


def test_build_validates_term_shapes():
    """A term sized for the wrong n_dof_total fails fast at build()."""
    import pytest
    prob = TrajOptProblem(n_steps=3, n_dof=2, joint_lower=[-1, -1],
                          joint_upper=[1, 1], use_time=True)
    # built WITHOUT n_dof_total: expects a 3x2 matrix, problem is 3x3
    prob.add_term(joint_vel(3, 2, is_cost=True))
    with pytest.raises(ValueError, match="n_dof_total"):
        prob.build()
