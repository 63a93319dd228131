"""Bundled robot models: kinematic trees + collision scenes.

Counterpart of the reference's URDF/SRDF fixtures (boxbot, spherebot,
arm_around_table / PR2 in ``trajopt_common/data/``), built from our own
self-authored URDFs + programmatic sphere/capsule collision decompositions.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.kinematics.chain import KinematicTree, build_tree
from trajopt_tpu.kinematics.urdf import load_urdf

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")


@functools.lru_cache
def rrbot() -> KinematicTree:
    return build_tree(load_urdf(os.path.join(DATA_DIR, "rrbot.urdf")))


@functools.lru_cache
def boxbot() -> KinematicTree:
    return build_tree(load_urdf(os.path.join(DATA_DIR, "boxbot.urdf")))


@functools.lru_cache
def spherebot() -> KinematicTree:
    # boxbot kinematics with a sphere body is the spherebot fixture's shape
    return build_tree(load_urdf(os.path.join(DATA_DIR, "boxbot.urdf")))


@functools.lru_cache
def arm7() -> KinematicTree:
    return build_tree(load_urdf(os.path.join(DATA_DIR, "arm7.urdf")))


@functools.lru_cache
def arm6() -> KinematicTree:
    """6-DOF industrial-style arm (UR-class geometry)."""
    return build_tree(load_urdf(os.path.join(DATA_DIR, "arm6.urdf")))


def arm6_scene(shelf: bool = True) -> CollisionScene:
    """arm6 capsule decomposition + a shelf obstacle scene."""
    tree = arm6()
    s = CollisionScene(tree, check_self_collision=False)
    s.add_link_capsule("upper_arm_link", 0.06, [0, -0.13, 0.05],
                       [0, -0.13, 0.40])
    s.add_link_capsule("forearm_link", 0.05, [0, 0, 0.05], [0, 0, 0.37])
    s.add_link_sphere("wrist_2_link", 0.05)
    s.add_link_sphere("tool0", 0.04)
    if shelf:
        # a shelf plate the wrist must duck under when reaching across
        s.add_world_box("shelf", [0.25, 0.25, 0.02], [0.45, 0.0, 0.55])
        s.add_world_box("wall", [0.02, 0.4, 0.4], [0.7, 0.0, 0.45])
    return s


@functools.lru_cache
def pr2ish() -> KinematicTree:
    """PR2-class whole-body fixture: prismatic torso lift + 7R right arm
    (8 DOF) with a tucked fixed left arm and head (the reference's
    pr2.urdf / arm_around_table robot class)."""
    return build_tree(load_urdf(os.path.join(DATA_DIR, "pr2ish.urdf")))


def pr2ish_scene(world_objects: bool = True) -> CollisionScene:
    """pr2ish capsule/sphere body decomposition with self-collision ON, in
    the arm-around-table scene (table slab + leg + side cabinet).

    The candidate-pair set is PR2-class rich (90+ pairs): right-arm links
    vs torso/head/base/tucked-left-arm plus world objects — the scene
    shape of the reference's planning benchmark
    (solve_benchmarks.cpp:48-61, arm_around_table.json)."""
    tree = pr2ish()
    s = CollisionScene(tree, check_self_collision=True)
    # body
    s.add_link_box("base_link", [0.33, 0.33, 0.15], [0.0, 0.0, 0.15])
    s.add_link_capsule("torso_link", 0.16, [0.0, 0.0, -0.35],
                       [0.0, 0.0, 0.25])
    s.add_link_sphere("head_link", 0.16)
    # right arm: capsules along the structural segments + joint spheres
    s.add_link_sphere("r_shoulder_pan_link", 0.10, [0.05, 0.0, 0.0])
    s.add_link_capsule("r_upper_arm_link", 0.08, [0.08, 0.0, 0.0],
                       [0.38, 0.0, 0.0])
    s.add_link_sphere("r_elbow_flex_link", 0.07)
    s.add_link_capsule("r_forearm_link", 0.06, [0.05, 0.0, 0.0],
                       [0.30, 0.0, 0.0])
    s.add_link_sphere("r_wrist_roll_link", 0.055)
    s.add_link_capsule("r_gripper_link", 0.035, [0.02, -0.04, 0.0],
                       [0.14, -0.02, 0.0], name="r_finger_l")
    s.add_link_capsule("r_gripper_link", 0.035, [0.02, 0.04, 0.0],
                       [0.14, 0.02, 0.0], name="r_finger_r")
    # tucked left arm (rigid group riding the lift; internal pairs prune)
    s.add_link_capsule("l_upper_arm_link", 0.08, [0.08, 0.0, 0.0],
                       [0.38, 0.0, 0.0])
    s.add_link_capsule("l_forearm_link", 0.06, [0.05, 0.0, 0.0],
                       [0.30, 0.0, 0.0])
    s.add_link_sphere("l_gripper_link", 0.05, [0.08, 0.0, 0.0])
    if world_objects:
        # table the arm must reach around (slab + center leg), and a
        # cabinet wall on the robot's right that blocks wide swings
        s.add_world_box("table_top", [0.30, 0.65, 0.03], [0.80, -0.05, 0.62])
        s.add_world_box("table_leg", [0.05, 0.05, 0.30], [0.80, 0.0, 0.30])
        s.add_world_box("cabinet", [0.30, 0.03, 0.35], [0.45, -0.90, 1.00])
    # ACM: trivially-always-close neighbours (SRDF <disable_collisions>
    # role) — shoulder/upper-arm vs torso, head vs torso handled by
    # adjacency; elbow sphere vs its own capsules overlap by construction
    for a, b in [("r_shoulder_pan_link", "r_upper_arm_link"),
                 ("r_upper_arm_link", "r_forearm_link"),
                 ("r_upper_arm_link", "r_elbow_flex_link"),
                 ("r_elbow_flex_link", "r_forearm_link"),
                 ("r_forearm_link", "r_wrist_roll_link"),
                 ("r_wrist_roll_link", "r_gripper_link"),
                 ("r_forearm_link", "r_gripper_link"),
                 ("r_shoulder_pan_link", "torso_link"),
                 ("r_upper_arm_link", "torso_link"),
                 ("l_upper_arm_link", "torso_link"),
                 ("l_forearm_link", "torso_link"),
                 ("l_gripper_link", "torso_link"),
                 ("l_forearm_link", "head_link"),
                 ("base_link", "torso_link")]:
        s.disabled_link_pairs.add(frozenset((a, b)))
    return s


def arm7_scene(world_objects: bool = True) -> CollisionScene:
    """arm7 with a capsule decomposition of its links, optionally in the
    'table scene' (table slab + a post obstacle) used by the benchmark
    configs ('7-DOF basic-cartesian table scene', BASELINE.json)."""
    tree = arm7()
    s = CollisionScene(tree, check_self_collision=False)
    # Capsules along each structural segment (z-offsets match arm7.urdf).
    s.add_link_capsule("base_link", 0.10, [0, 0, 0.0], [0, 0, 0.30])
    s.add_link_capsule("link_2", 0.08, [0, 0, 0.10], [0, 0, 0.36])
    s.add_link_capsule("link_4", 0.07, [0, 0, 0.0], [0, 0, 0.36])
    s.add_link_capsule("link_6", 0.06, [0, 0, 0.0], [0, 0, 0.10])
    s.add_link_sphere("link_7", 0.05, [0, 0, 0.08])
    if world_objects:
        # Table slab below the workspace and a vertical post crossing the
        # benchmark swing arc (tool arc: radius ~0.38 at z~1.13 between
        # ARM7_HOME and ARM7_GOAL) so collision constraints are active.
        s.add_world_box("table", [0.35, 0.5, 0.05], [0.55, 0.0, 0.25])
        s.add_world_box("post", [0.05, 0.05, 0.30], [0.39, 0.03, 1.00])
    # The base capsule can't reach the world objects but pairs with them
    # are harmless; disable base-vs-table to mirror an ACM entry.
    s.disabled_pairs.add(("base_link_capsule", "table"))
    s.disabled_pairs.add(("base_link_capsule", "post"))
    return s
