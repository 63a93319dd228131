"""trajopt_tpu: TPU-native trajectory optimization.

Top-level convenience exports; see README.md for the architecture and the
component map to the reference (tesseract-robotics/trajopt).
"""

from trajopt_tpu.collision.check import check_trajectory
from trajopt_tpu.collision.sdf_grid import SdfGrid, bake_sdf
from trajopt_tpu.collision.world import CollGeom, CollisionScene, scene_from_urdf
from trajopt_tpu.kinematics.chain import KinematicTree, build_tree
from trajopt_tpu.kinematics.ik import solve_ik
from trajopt_tpu.kinematics.srdf import (SrdfModel, group_state_vector,
                                         load_srdf, parse_srdf,
                                         resolve_group_joints)
from trajopt_tpu.kinematics.urdf import load_urdf, parse_urdf
from trajopt_tpu.problem.json_io import (
    Environment, construct_problem, load_problem_file, register_term_type)
from trajopt_tpu.problem.mpc import make_mpc_step
from trajopt_tpu.problem.trajectory import (
    TrajOptProblem, given_init, interpolated_init, stationary_init)
from trajopt_tpu.sqp.nlp import Kind, Nlp, TermSet
from trajopt_tpu.sqp.params import SQPParams, SQPStatus
from trajopt_tpu.sqp.solver import SQPResult, make_solver
from trajopt_tpu.terms.cartesian import (
    avoid_singularity, cart_line, cart_pose, cart_vel, dynamic_cart_pose,
    ik_constraint)
from trajopt_tpu.terms.collision import collision_term
from trajopt_tpu.terms.joint import joint_acc, joint_jerk, joint_pos, joint_vel
from trajopt_tpu.terms.time import joint_acc_time, joint_vel_time, total_time
from trajopt_tpu.utils.debug import dump_failed_qps

__version__ = "0.1.0"

__all__ = [
    "CollGeom", "CollisionScene", "Environment", "KinematicTree", "Kind",
    "Nlp", "SQPParams", "SQPResult", "SQPStatus", "SdfGrid", "TermSet",
    "TrajOptProblem", "avoid_singularity", "bake_sdf", "build_tree",
    "cart_line", "cart_pose", "cart_vel", "check_trajectory",
    "collision_term", "construct_problem", "dynamic_cart_pose", "given_init",
    "ik_constraint", "interpolated_init", "joint_acc", "joint_acc_time",
    "joint_jerk", "joint_pos", "joint_vel", "joint_vel_time",
    "load_problem_file", "load_urdf", "make_mpc_step", "make_solver",
    "parse_urdf", "register_term_type", "scene_from_urdf", "solve_ik",
    "stationary_init", "total_time",
]
