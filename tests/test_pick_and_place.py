"""Pick-and-place with external axis + attach/detach (BASELINE config #4):
an 8-DOF rail-mounted arm reaches a pick pose, attaches a carried box to
its tool, and plans a place motion where the carried geometry must clear
the post (cast collision)."""

import os

import jax.numpy as jnp
import numpy as np

from trajopt_tpu.collision.check import check_trajectory
from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.kinematics.chain import build_tree
from trajopt_tpu.kinematics.urdf import load_urdf
from trajopt_tpu.problem.trajectory import TrajOptProblem, interpolated_init
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.collision import collision_term
from trajopt_tpu.terms.joint import joint_pos, joint_vel

DATA = os.path.join(os.path.dirname(__file__), "..", "trajopt_tpu", "data")


def rail_tree():
    return build_tree(load_urdf(os.path.join(DATA, "arm7_rail.urdf")))


def rail_scene(tree, carrying: bool):
    s = CollisionScene(tree, check_self_collision=False)
    s.add_link_capsule("link_2", 0.08, [0, 0, 0.10], [0, 0, 0.36])
    s.add_link_capsule("link_4", 0.07, [0, 0, 0.0], [0, 0, 0.36])
    s.add_link_sphere("link_7", 0.05, [0, 0, 0.08])
    if carrying:
        # attached part on the tool (attach = new link geometry)
        s.add_link_box("tool0", [0.06, 0.06, 0.10], center=(0, 0, 0.12),
                       name="carried_part")
    s.add_world_box("post", [0.05, 0.05, 0.30], [0.39, 0.03, 1.00])
    return s


PICK = np.array([0.0, -0.5, 1.0, 0.0, -1.2, 0.0, 0.8, 0.0])   # rail at 0
PLACE = np.array([0.6, 0.9, 1.0, 0.0, -1.2, 0.0, 0.8, 0.0])   # rail shifted


def _plan(tree, scene, start, goal, n=4):
    prob = TrajOptProblem(n_steps=n, n_dof=8, joint_lower=tree.lower,
                          joint_upper=tree.upper, fixed_steps=[0])
    prob.add_term(joint_vel(n, 8, is_cost=True, coeffs=np.full(8, 5.0)))
    prob.add_term(joint_pos(n, 8, is_cost=False, targets=goal,
                            first_step=n - 1, last_step=n - 1))
    prob.add_term(collision_term(scene, n, margin=0.02, coeff=20.0,
                                 is_cost=False, evaluator="cast",
                                 fixed_steps=[0], lvs_substeps=2))
    init = interpolated_init(jnp.asarray(start), jnp.asarray(goal), n)
    res = prob.make_solve()(init)
    return res


def test_rail_tree_has_8_dof():
    tree = rail_tree()
    assert tree.n_dof == 8
    assert tree.active_joint_names[0] == "rail"


def test_pick_then_place_with_attached_part():
    tree = rail_tree()

    # Attach adds collision pairs (pick phase solved implicitly: the empty
    # scene is a strict geometric subset, covered by the carry solve).
    scene_empty = rail_scene(tree, carrying=False)
    scene_carry = rail_scene(tree, carrying=True)
    assert scene_carry.n_pairs > scene_empty.n_pairs  # attach added pairs

    # Carry the attached part from pick to place across the post.
    res2 = _plan(tree, scene_carry, PICK, PLACE)
    assert int(res2.status) == SQPStatus.CONVERGED
    traj2 = np.asarray(res2.x).reshape(-1, 8)
    ok, dmin = check_trajectory(scene_carry, traj2, substeps=6)
    assert ok, dmin
    # the rail moved (external axis did real work)
    assert abs(traj2[-1, 0] - traj2[0, 0]) > 0.3
