"""URDF parser edge cases: defaults, unsupported constructs, geometry
import, malformed documents."""

import numpy as np
import pytest

from trajopt_tpu.collision.world import scene_from_urdf
from trajopt_tpu.kinematics.chain import build_tree
from trajopt_tpu.kinematics.urdf import parse_urdf


def test_defaults_and_limits():
    m = parse_urdf("""
    <robot name="r"><link name="a"/><link name="b"/>
      <joint name="j" type="revolute">
        <parent link="a"/><child link="b"/>
      </joint></robot>""")
    j = m.joints[0]
    assert j.axis == (1.0, 0.0, 0.0)      # URDF default axis
    assert j.origin_xyz == (0.0, 0.0, 0.0)
    assert j.lower == -np.inf and j.upper == np.inf  # no <limit>


def test_continuous_joint_is_revolute_unlimited():
    m = parse_urdf("""
    <robot name="r"><link name="a"/><link name="b"/>
      <joint name="j" type="continuous">
        <parent link="a"/><child link="b"/><axis xyz="0 0 1"/>
      </joint></robot>""")
    t = build_tree(m)
    assert t.n_dof == 1
    assert t.lower[0] == -np.inf


def test_unsupported_joint_type_raises():
    with pytest.raises(ValueError, match="unsupported joint"):
        parse_urdf("""
        <robot name="r"><link name="a"/><link name="b"/>
          <joint name="j" type="wobbly">
            <parent link="a"/><child link="b"/>
          </joint></robot>""")


def test_not_urdf_raises():
    with pytest.raises(ValueError, match="not a URDF"):
        parse_urdf("<launch></launch>")


def test_multiple_roots_rejected():
    m = parse_urdf("""
    <robot name="r"><link name="a"/><link name="b"/><link name="c"/>
      <joint name="j" type="fixed">
        <parent link="a"/><child link="b"/>
      </joint></robot>""")  # link c is a second root
    with pytest.raises(ValueError, match="single root"):
        build_tree(m)


def test_collision_geometry_import():
    m = parse_urdf("""
    <robot name="r"><link name="base"/>
      <link name="l">
        <collision><origin xyz="0 0 0.5"/>
          <geometry><cylinder radius="0.1" length="0.6"/></geometry>
        </collision>
        <collision><geometry><sphere radius="0.2"/></geometry></collision>
        <collision><geometry><box size="0.2 0.4 0.6"/></geometry></collision>
      </link>
      <joint name="j" type="revolute">
        <parent link="base"/><child link="l"/><axis xyz="0 0 1"/>
        <limit lower="-1" upper="1"/>
      </joint></robot>""")
    tree = build_tree(m)
    scene = scene_from_urdf(tree, m)
    kinds = sorted(g.kind for g in scene.geoms)
    assert kinds == ["box", "capsule", "sphere"]
    cap = next(g for g in scene.geoms if g.kind == "capsule")
    np.testing.assert_allclose(cap.ea, [0, 0, 0.2])   # 0.5 - 0.6/2
    np.testing.assert_allclose(cap.eb, [0, 0, 0.8])
    box = next(g for g in scene.geoms if g.kind == "box")
    assert box.params == (0.1, 0.2, 0.3)  # half extents
