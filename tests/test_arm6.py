"""6-DOF industrial arm (arm6) model: FK sanity, IK, and a shelf-scene
planning solve — second serial-arm family beyond arm7."""

import jax.numpy as jnp
import numpy as np

from trajopt_tpu.collision.check import check_trajectory
from trajopt_tpu.kinematics.ik import solve_ik
from trajopt_tpu.models.robots import arm6, arm6_scene
from trajopt_tpu.problem.trajectory import TrajOptProblem, interpolated_init
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.cartesian import cart_pose
from trajopt_tpu.terms.collision import collision_term
from trajopt_tpu.terms.joint import joint_pos, joint_vel

HOME = np.array([0.0, -1.2, 1.6, -0.4, 1.57, 0.0])


def test_arm6_fk_reach():
    tree = arm6()
    assert tree.n_dof == 6
    R, p = tree.fk(jnp.zeros(6))
    tool = np.asarray(p[tree.link_id("tool0")])
    # straight-up config: z = 0.163 + 0.425 + 0.392, y-offsets summed
    np.testing.assert_allclose(tool[2], 0.163 + 0.425 + 0.392 + 0.1,
                               atol=1e-9)


def test_arm6_ik():
    tree = arm6()
    R, p = tree.fk(jnp.asarray(HOME))
    target = np.asarray(p[tree.link_id("tool0")]) + np.array([0.05, 0.05, -0.05])
    q, err = solve_ik(tree, "tool0", np.eye(3), target,
                      jnp.asarray(HOME), pos_only=True)
    _, p2 = tree.fk(q)
    np.testing.assert_allclose(np.asarray(p2[tree.link_id("tool0")]),
                               target, atol=1e-4)


def test_arm6_shelf_planning():
    tree = arm6()
    scene = arm6_scene()
    n = 6
    goal = np.array([0.9, -1.0, 1.4, -0.4, 1.57, 0.3])
    prob = TrajOptProblem(n_steps=n, n_dof=6, joint_lower=tree.lower,
                          joint_upper=tree.upper, fixed_steps=[0])
    prob.add_term(joint_vel(n, 6, is_cost=True, coeffs=np.full(6, 5.0)))
    prob.add_term(joint_pos(n, 6, is_cost=False, targets=goal,
                            first_step=n - 1, last_step=n - 1))
    prob.add_term(collision_term(scene, n, margin=0.02, coeff=20.0,
                                 is_cost=False, fixed_steps=[0]))
    init = interpolated_init(jnp.asarray(HOME), jnp.asarray(goal), n)
    res = prob.make_solve()(init)
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(n, 6)
    for q in traj:
        assert float(jnp.min(scene.distances(jnp.asarray(q)))) >= 0.02 - 1e-3
