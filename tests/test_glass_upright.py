"""Glass-upright e2e (BASELINE config: '7-DOF arm glass-upright: cartesian
pose constraint + orientation-upright cost'): move the tool between two
poses while keeping its axis vertical (roll/pitch error costs every step),
with collision constraints active."""

import jax.numpy as jnp
import numpy as np

from trajopt_tpu.models.benchmarks import ARM7_GOAL, ARM7_HOME
from trajopt_tpu.models.robots import arm7, arm7_scene
from trajopt_tpu.problem.trajectory import TrajOptProblem, interpolated_init
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.cartesian import cart_pose
from trajopt_tpu.terms.collision import collision_term
from trajopt_tpu.terms.joint import joint_pos, joint_vel
from trajopt_tpu.kinematics.transforms import rotvec_from_matrix


def test_glass_upright_solve():
    tree = arm7()
    scene = arm7_scene()
    n = 6
    tool = tree.link_id("tool0")
    R_home, p_home = tree.fk(jnp.asarray(ARM7_HOME))
    R_goal, p_goal = tree.fk(jnp.asarray(ARM7_GOAL))
    R_up = np.asarray(R_home[tool])  # reference 'upright' orientation

    prob = TrajOptProblem(n_steps=n, n_dof=7, joint_lower=tree.lower,
                          joint_upper=tree.upper, fixed_steps=[0])
    prob.add_term(joint_vel(n, 7, is_cost=True, coeffs=np.full(7, 5.0)))
    # goal: tool POSITION only — orientation belongs to the upright cost
    # (a joint-space goal would pin a tilted final configuration)
    prob.add_term(cart_pose(tree, "tool0", n, n - 1, is_cost=False,
                            target=np.asarray(p_goal[tool]),
                            indices=[0, 1, 2], name="goal_pos"))
    # orientation-upright cost at every interior step: roll/pitch error
    # about the reference orientation (yaw stays free: index 5 excluded)
    for t in range(1, n):
        prob.add_term(cart_pose(tree, "tool0", n, t, is_cost=True,
                                target=(R_up, np.zeros(3)),
                                indices=[3, 4], coeffs=[10.0, 10.0],
                                name=f"upright_t{t}"))
    prob.add_term(collision_term(scene, n, margin=0.02, coeff=20.0,
                                 is_cost=False, fixed_steps=[0]))

    init = interpolated_init(jnp.asarray(ARM7_HOME), jnp.asarray(ARM7_GOAL), n)
    res = prob.make_solve()(init)
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(n, 7)
    _, p_end = tree.fk(jnp.asarray(traj[-1]))
    np.testing.assert_allclose(np.asarray(p_end[tool]),
                               np.asarray(p_goal[tool]), atol=1e-3)

    # uprightness: roll/pitch deviation from the reference orientation
    # small at every step (the init deviates because base rotation with
    # bent wrist tilts the tool)
    max_tilt = 0.0
    for q in traj:
        R, _ = tree.fk(jnp.asarray(q))
        rv = np.asarray(rotvec_from_matrix(jnp.asarray(R_up).T @ R[tool]))
        max_tilt = max(max_tilt, float(np.abs(rv[:2]).max()))
    assert max_tilt < 0.15  # radians; init tilt is substantially larger

    # collision margins respected at all steps
    for q in traj:
        assert float(jnp.min(scene.distances(jnp.asarray(q)))) >= 0.02 - 1e-3


def test_glass_upright_structured_path():
    """Cartesian terms provide banded_jac, so cart-goal problems run on
    the structured (block-banded) QP path and match the dense path."""
    tree = arm7()
    scene = arm7_scene()
    n = 5
    tool = tree.link_id("tool0")
    R_home, _ = tree.fk(jnp.asarray(ARM7_HOME))
    _, p_goal = tree.fk(jnp.asarray(ARM7_GOAL))
    R_up = np.asarray(R_home[tool])

    prob = TrajOptProblem(n_steps=n, n_dof=7, joint_lower=tree.lower,
                          joint_upper=tree.upper, fixed_steps=[0])
    prob.add_term(joint_vel(n, 7, is_cost=True, coeffs=np.full(7, 5.0)))
    prob.add_term(cart_pose(tree, "tool0", n, n - 1, is_cost=False,
                            target=np.asarray(p_goal[tool]),
                            indices=[0, 1, 2], name="goal_pos"))
    for t in range(1, n):
        prob.add_term(cart_pose(tree, "tool0", n, t, is_cost=True,
                                target=(R_up, np.zeros(3)),
                                indices=[3, 4], coeffs=[10.0, 10.0],
                                name=f"upright_t{t}"))
    prob.add_term(collision_term(scene, n, margin=0.02, coeff=20.0,
                                 is_cost=False, fixed_steps=[0]))

    init = interpolated_init(jnp.asarray(ARM7_HOME), jnp.asarray(ARM7_GOAL), n)
    res_d = prob.make_solve()(init)
    res_s = prob.make_solve(structured=True)(init)
    assert int(res_d.status) == SQPStatus.CONVERGED
    assert int(res_s.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(res_s.x), np.asarray(res_d.x),
                               atol=2e-3)
    traj = np.asarray(res_s.x).reshape(n, 7)
    _, p_end = tree.fk(jnp.asarray(traj[-1]))
    np.testing.assert_allclose(np.asarray(p_end[tool]),
                               np.asarray(p_goal[tool]), atol=1e-3)
