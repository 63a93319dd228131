"""Kinematic-TREE (not chain) support: a dual-arm robot with a shared
torso — FK for both branches, dual-arm coordination via dynamic_cart_pose,
and fixed_dofs pinning (the kinematic-tree cases the reference delegates
to tesseract JointGroups)."""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.kinematics.chain import build_tree
from trajopt_tpu.kinematics.urdf import parse_urdf
from trajopt_tpu.problem.trajectory import TrajOptProblem, stationary_init
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.cartesian import dynamic_cart_pose
from trajopt_tpu.terms.joint import joint_pos, joint_vel

DUAL = build_tree(parse_urdf("""
<robot name="dual_arm">
  <link name="torso"/>
  <link name="l_upper"/><link name="l_hand"/>
  <link name="r_upper"/><link name="r_hand"/>
  <joint name="l_shoulder" type="revolute">
    <parent link="torso"/><child link="l_upper"/>
    <origin xyz="0 0.3 1.0"/><axis xyz="0 0 1"/>
    <limit lower="-3.1" upper="3.1"/></joint>
  <joint name="l_elbow" type="revolute">
    <parent link="l_upper"/><child link="l_hand"/>
    <origin xyz="0.5 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3.1" upper="3.1"/></joint>
  <joint name="r_shoulder" type="revolute">
    <parent link="torso"/><child link="r_upper"/>
    <origin xyz="0 -0.3 1.0"/><axis xyz="0 0 1"/>
    <limit lower="-3.1" upper="3.1"/></joint>
  <joint name="r_elbow" type="revolute">
    <parent link="r_upper"/><child link="r_hand"/>
    <origin xyz="0.5 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3.1" upper="3.1"/></joint>
</robot>"""))


def test_tree_fk_branches_independent():
    q = jnp.array([0.5, 0.3, -0.7, 0.2])
    R, p = DUAL.fk(q)
    # left branch depends only on q0,q1; right only on q2,q3
    J = jax.jacfwd(lambda v: DUAL.fk(v)[1][DUAL.link_id("l_hand")])(q)
    np.testing.assert_allclose(np.asarray(J)[:, 2:], 0.0, atol=1e-12)
    J = jax.jacfwd(lambda v: DUAL.fk(v)[1][DUAL.link_id("r_hand")])(q)
    np.testing.assert_allclose(np.asarray(J)[:, :2], 0.0, atol=1e-12)
    # analytic: l_hand at shoulder + 0.5*(cos, sin) chain
    lh = np.asarray(p[DUAL.link_id("l_hand")])
    np.testing.assert_allclose(
        lh, [0.5 * np.cos(0.5), 0.3 + 0.5 * np.sin(0.5), 1.0], atol=1e-12)


def test_ancestor_masks_per_branch():
    l_id = DUAL.link_id("l_hand")
    r_id = DUAL.link_id("r_hand")
    assert list(DUAL.ancestor[l_id]) == [True, True, False, False]
    assert list(DUAL.ancestor[r_id]) == [False, False, True, True]


def test_dual_arm_coordination():
    """Keep the two hands at a fixed relative pose (carrying an object
    together) while the left arm moves to a target: the right arm must
    follow."""
    n = 1
    prob = TrajOptProblem(n_steps=n, n_dof=4, joint_lower=DUAL.lower,
                          joint_upper=DUAL.upper)
    prob.add_term(joint_pos(n, 4, is_cost=True,
                            targets=np.array([0.8, 0.2, 0.0, 0.0]),
                            coeffs=np.array([10.0, 10.0, 0.01, 0.01]),
                            first_step=0, last_step=0))
    # hands coincide in position (object grasped by both)
    prob.add_term(dynamic_cart_pose(DUAL, "l_hand", "r_hand", n, 0,
                                    is_cost=False, indices=[0, 1, 2]))
    res = prob.make_solve()(stationary_init(jnp.array([0.3, 0.1, -0.3, -0.1]), n))
    assert int(res.status) == SQPStatus.CONVERGED
    q = res.x.reshape(4)
    R, p = DUAL.fk(q)
    lh = np.asarray(p[DUAL.link_id("l_hand")])
    np.testing.assert_allclose(lh, np.asarray(p[DUAL.link_id("r_hand")]),
                               atol=1e-3)
    # hands can only meet on the two shoulder-circle intersections
    # (x = +-0.4, y = 0 in the torso plane); the start biases toward +x
    np.testing.assert_allclose(np.abs(lh[0]), 0.4, atol=1e-3)
    np.testing.assert_allclose(lh[1], 0.0, atol=1e-3)


def test_fixed_dofs_pinned():
    """fixed_dofs freezes a column of the trajectory (pd.cpp:485-530)."""
    n = 4
    prob = TrajOptProblem(n_steps=n, n_dof=4, joint_lower=DUAL.lower,
                          joint_upper=DUAL.upper, fixed_steps=[0],
                          fixed_dofs=[2, 3])
    prob.add_term(joint_vel(n, 4, is_cost=True))
    prob.add_term(joint_pos(n, 4, is_cost=False,
                            targets=np.array([1.0, 0.5, 0.9, 0.9]),
                            coeffs=np.array([1.0, 1.0, 0.0, 0.0]),
                            first_step=n - 1, last_step=n - 1))
    init = stationary_init(jnp.array([0.0, 0.0, 0.2, -0.2]), n)
    res = prob.make_solve()(init)
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(n, 4)
    np.testing.assert_allclose(traj[:, 2], 0.2, atol=1e-9)   # pinned
    np.testing.assert_allclose(traj[:, 3], -0.2, atol=1e-9)  # pinned
    np.testing.assert_allclose(traj[-1, :2], [1.0, 0.5], atol=1e-3)


def test_dual_arm_inter_arm_collision_avoidance():
    """Self-collision between the two BRANCHES of the tree: spheres on both
    hands, left hand sweeps through the right arm's workspace — the solver
    must find a trajectory where the hands never come within the margin
    (the PR2-class whole-body self-collision case; adjacency pruning must
    NOT remove the inter-branch pair)."""
    from trajopt_tpu.collision.check import check_trajectory
    from trajopt_tpu.collision.world import CollisionScene
    from trajopt_tpu.terms.collision import collision_term

    scene = CollisionScene(DUAL)
    scene.add_link_sphere("l_hand", 0.15)
    scene.add_link_sphere("r_hand", 0.15)
    # hands are NOT adjacent links (different branches) -> candidate pair
    assert scene.n_pairs == 1

    n = 8
    prob = TrajOptProblem(n_steps=n, n_dof=4, joint_lower=DUAL.lower,
                          joint_upper=DUAL.upper, fixed_steps=[0])
    prob.add_term(joint_vel(n, 4, is_cost=True))
    # left arm sweeps from "up" to "down" THROUGH the right hand's pose;
    # infinite tolerance bands free the right arm to dodge (tolerance-band
    # semantics of JointPosTermInfo)
    prob.add_term(joint_pos(n, 4, is_cost=False,
                            targets=np.array([-1.2, 0.0, 0.6, 0.0]),
                            upper_tols=np.array([0.0, 0.0, 10.0, 10.0]),
                            lower_tols=np.array([0.0, 0.0, -10.0, -10.0]),
                            first_step=n - 1, last_step=n - 1))
    prob.add_term(collision_term(scene, n, margin=0.05, coeff=20.0,
                                 is_cost=False, evaluator="cast",
                                 fixed_steps=[0]))
    init = stationary_init(jnp.array([1.2, 0.0, 0.6, 0.0]), n)
    # sweeping the left arm with the right arm parked violates the margin
    d_mid = scene.distances(jnp.array([-0.55, 0.0, 0.6, 0.0]))
    assert float(d_mid.min()) < 0.05

    res = prob.make_solve(structured=True)(init, {})
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(n, 4)
    ok, dmin = check_trajectory(scene, traj, margin=0.0, substeps=8)
    assert ok, dmin
