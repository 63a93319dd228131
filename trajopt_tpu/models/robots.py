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
