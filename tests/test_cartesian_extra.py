"""Cart-line, IK-constraint, dynamic-pose, and user-defined term tests
(cartesian_line_unit.cpp / inverse_kinematics_constraint tests /
UserDefinedTermInfo analog)."""

import jax.numpy as jnp
import numpy as np

from tests.test_kinematics import RRBOT, rr_fk
from trajopt_tpu.kinematics.ik import solve_ik
from trajopt_tpu.problem.trajectory import TrajOptProblem, stationary_init
from trajopt_tpu.sqp.nlp import Kind, TermSet
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.cartesian import cart_line, dynamic_cart_pose, ik_constraint
from trajopt_tpu.terms.joint import joint_vel


def test_ik_solver_reaches_target():
    target_q = np.array([0.7, -0.9])
    target_p = rr_fk(*target_q)
    q, err = solve_ik(RRBOT, "ee_link", np.eye(3), target_p,
                      np.array([0.1, 0.1]), pos_only=True)
    _, p = RRBOT.fk(q)
    np.testing.assert_allclose(p[RRBOT.link_id("ee_link")], target_p,
                               atol=1e-5)


def test_ik_constraint_term():
    target_q = np.array([0.5, 0.4])
    target_p = rr_fk(*target_q)
    prob = TrajOptProblem(n_steps=1, n_dof=2, joint_lower=RRBOT.lower,
                          joint_upper=RRBOT.upper)
    prob.add_term(ik_constraint(RRBOT, "ee_link", 1, 0, pos_only=True,
                                target=target_p, q_seed=np.array([0.3, 0.3])))
    res = prob.make_solve()(stationary_init(jnp.array([0.0, 0.0]), 1))
    assert int(res.status) == SQPStatus.CONVERGED
    _, p = RRBOT.fk(res.x.reshape(2))
    np.testing.assert_allclose(p[RRBOT.link_id("ee_link")], target_p, atol=1e-3)


def test_cart_line_constraint():
    # Constrain the ee to a line between two reachable points; a joint_pos
    # cost pulls toward a config whose ee is off the line.
    pa = rr_fk(0.4, 0.3)
    pb = rr_fk(0.9, -0.2)
    prob = TrajOptProblem(n_steps=1, n_dof=2, joint_lower=RRBOT.lower,
                          joint_upper=RRBOT.upper)
    prob.add_term(cart_line(RRBOT, "ee_link", 1, 0, line_start=pa, line_end=pb,
                            indices=[0, 1, 2]))
    from trajopt_tpu.terms.joint import joint_pos
    prob.add_term(joint_pos(1, 2, is_cost=True, targets=np.array([0.1, 1.2]),
                            first_step=0, last_step=0))
    res = prob.make_solve()(stationary_init(jnp.array([0.5, 0.1]), 1))
    assert int(res.status) == SQPStatus.CONVERGED
    _, p = RRBOT.fk(res.x.reshape(2))
    ee = np.asarray(p[RRBOT.link_id("ee_link")])
    # distance from ee to segment must be ~0
    ab = pb - pa
    t = np.clip(np.dot(ee - pa, ab) / np.dot(ab, ab), 0, 1)
    np.testing.assert_allclose(ee, pa + t * ab, atol=1e-3)


def test_dynamic_cart_pose_two_links():
    # Keep ee_link at a fixed offset pose relative to link_1 (a moving
    # frame): equivalent to pinning joint_2 so that the relative pose
    # matches the target offset.
    prob = TrajOptProblem(n_steps=1, n_dof=2, joint_lower=RRBOT.lower,
                          joint_upper=RRBOT.upper)
    # relative pose of ee in link_1 frame when q2 = 0: x = 1.0 + 0.8
    prob.add_term(dynamic_cart_pose(RRBOT, "ee_link", "link_1", 1, 0,
                                    is_cost=False,
                                    target_tcp=np.array([1.8, 0.0, 0.0]),
                                    indices=[0, 1, 2]))
    res = prob.make_solve()(stationary_init(jnp.array([0.7, 0.5]), 1))
    assert int(res.status) == SQPStatus.CONVERGED
    q = np.asarray(res.x)
    np.testing.assert_allclose(q[1], 0.0, atol=1e-4)  # q2 driven to zero


def test_user_defined_term():
    """UserDefinedTermInfo analog (problem_description.hpp:273-309): any
    pure residual function becomes a term."""

    def my_error(x, params):
        # keep the sum of joints equal to the param value
        return jnp.atleast_1d(jnp.sum(x) - params["total"])

    prob = TrajOptProblem(n_steps=1, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10])
    prob.add_term(TermSet("user", Kind.CNT_EQ, my_error, 1))
    from trajopt_tpu.terms.joint import joint_pos
    prob.add_term(joint_pos(1, 2, is_cost=True, targets=np.zeros(2),
                            first_step=0, last_step=0))
    res = prob.make_solve()(stationary_init(jnp.array([2.0, 2.0]), 1),
                            params={"total": 1.0})
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(res.x).sum(), 1.0, atol=1e-4)
    np.testing.assert_allclose(res.x, [0.5, 0.5], atol=1e-3)
