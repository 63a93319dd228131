"""use_time term tests: time-scaled velocity, acceleration, total-time
(the with-time paths of joint_costs_unit.cpp and interface_unit.cpp's
TT_USE_TIME cases)."""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.problem.trajectory import TrajOptProblem, given_init, stationary_init
from trajopt_tpu.sqp.nlp import Nlp, eval_exact_costs
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.joint import joint_pos
from trajopt_tpu.terms.time import joint_acc_time, joint_vel_time, total_time

T, D = 5, 2


def make_x(dt=0.5):
    rng = np.random.default_rng(3)
    q = rng.normal(size=(T, D))
    inv = np.full((T, 1), 1.0 / dt)
    return jnp.asarray(np.concatenate([q, inv], axis=1)).reshape(-1), q, dt


def test_vel_time_values():
    x, q, dt = make_x()
    term = joint_vel_time(T, D, is_cost=False)
    r = np.asarray(term.fn(x, {}))
    vel = (q[1:] - q[:-1]) / dt
    n = vel.size
    np.testing.assert_allclose(r[:n], vel.reshape(-1), atol=1e-12)
    np.testing.assert_allclose(r[n:], -vel.reshape(-1), atol=1e-12)


def test_acc_time_values():
    x, q, dt = make_x()
    term = joint_acc_time(T, D, is_cost=False)
    r = np.asarray(term.fn(x, {}))
    vel = (q[1:] - q[:-1]) / dt
    acc = 2.0 * (vel[1:] - vel[:-1]) / (2.0 / dt)  # reference formula
    np.testing.assert_allclose(r, acc.reshape(-1), atol=1e-12)


def test_total_time_value():
    x, q, dt = make_x()
    term = total_time(T, D, is_cost=False, limit=1.0)
    r = np.asarray(term.fn(x, {}))
    np.testing.assert_allclose(r, [T * dt - 1.0], atol=1e-12)


def test_min_time_solve():
    """Minimize total time subject to velocity limits: dt shrinks until the
    velocity bound binds (the TT_USE_TIME planning pattern)."""
    n, d = 4, 1
    prob = TrajOptProblem(n_steps=n, n_dof=d, joint_lower=[-10], joint_upper=[10],
                          use_time=True, dt_lower=0.01, dt_upper=20.0,
                          fixed_steps=[0])
    prob.add_term(joint_pos(n, d, is_cost=False, targets=np.array([3.0]),
                            first_step=n - 1, last_step=n - 1,
                            n_dof_total=d + 1))
    # velocity magnitude <= 2.0 via time-scaled band rows
    prob.add_term(joint_vel_time(n, d, is_cost=False,
                                 upper_tols=np.array([2.0]),
                                 lower_tols=np.array([-2.0])))
    prob.add_term(total_time(n, d, is_cost=True, coeff=5.0))
    init = stationary_init(jnp.zeros(1), n, dt=1.0)
    res = prob.make_solve()(init)
    assert int(res.status) == SQPStatus.CONVERGED
    m = np.asarray(res.x).reshape(n, d + 1)
    np.testing.assert_allclose(m[-1, 0], 3.0, atol=1e-3)
    vels = np.diff(m[:, 0]) * m[1:, 1]
    assert np.all(np.abs(vels) <= 2.0 + 1e-3)
    # time should have shrunk toward the velocity-limit bound
    total = np.sum(1.0 / m[:, 1])
    assert total < 4.0  # init total was 4x1.0; 3 rad at vel 2 needs 1.5s+


def test_vel_time_squared_cost_jacobian():
    x, q, dt = make_x()
    term = joint_vel_time(T, D, is_cost=True, coeffs=np.array([1.0, 2.0]))
    J = jax.jacrev(lambda v: term.fn(v, {}))(x)
    eps = 1e-6
    for i in range(x.shape[0]):
        fd = (term.fn(x.at[i].add(eps), {}) - term.fn(x.at[i].add(-eps), {})) / (2 * eps)
        np.testing.assert_allclose(J[:, i], fd, atol=1e-5)
