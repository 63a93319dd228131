"""SRDF parser: group resolution (chain/joint/link/subgroup members),
group states, and the allowed-collision matrix wired into the collision
scene's candidate-pair enumeration.

Mirrors how the reference consumes SRDF: tesseract builds JointGroups from
SRDF groups and seeds contact managers' ACM from <disable_collisions>
(fixtures at /root/reference/trajopt_common/data/*.srdf, consumed at e.g.
trajopt/test/cast_cost_unit.cpp:45-57).
"""

import numpy as np
import pytest

from trajopt_tpu.collision.world import scene_from_urdf
from trajopt_tpu.kinematics.chain import build_tree
from trajopt_tpu.kinematics.srdf import (group_state_vector, parse_srdf,
                                         resolve_group_joints)
from trajopt_tpu.kinematics.urdf import parse_urdf

URDF = """
<robot name="r3">
  <link name="base"><collision><geometry><sphere radius="0.1"/></geometry></collision></link>
  <link name="l1"><collision><geometry><sphere radius="0.1"/></geometry></collision></link>
  <link name="l2"><collision><geometry><sphere radius="0.1"/></geometry></collision></link>
  <link name="tool"><collision><geometry><sphere radius="0.1"/></geometry></collision></link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/><axis xyz="0 0 1"/>
    <origin xyz="0 0 0.5"/><limit lower="-1" upper="1"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/><axis xyz="0 1 0"/>
    <origin xyz="0 0 0.5"/><limit lower="-2" upper="2"/>
  </joint>
  <joint name="jt" type="fixed">
    <parent link="l2"/><child link="tool"/><origin xyz="0 0 0.2"/>
  </joint>
</robot>
"""

SRDF = """
<robot name="r3">
  <group name="arm">
    <chain base_link="base" tip_link="tool"/>
  </group>
  <group name="wrist">
    <joint name="j2"/>
    <joint name="jt"/>
  </group>
  <group name="by_links">
    <link name="l1"/>
    <link name="l2"/>
  </group>
  <group name="nested">
    <group name="wrist"/>
    <joint name="j1"/>
  </group>
  <group_state name="home" group="arm">
    <joint name="j1" value="0.25"/>
    <joint name="j2" value="-0.5"/>
  </group_state>
  <disable_collisions link1="base" link2="l2" reason="Never"/>
</robot>
"""


def test_group_resolution_orders():
    m = parse_urdf(URDF)
    s = parse_srdf(SRDF)
    # chain: base->tip order, fixed joints dropped
    assert resolve_group_joints(m, s, "arm") == ["j1", "j2"]
    # explicit joints: fixed joints dropped
    assert resolve_group_joints(m, s, "wrist") == ["j2"]
    # links resolve to the joint whose child they are
    assert resolve_group_joints(m, s, "by_links") == ["j1", "j2"]
    # subgroups merge after direct members, deduped
    assert resolve_group_joints(m, s, "nested") == ["j1", "j2"]


def test_group_drives_build_tree():
    m = parse_urdf(URDF)
    s = parse_srdf(SRDF)
    t = build_tree(m, active_joints=resolve_group_joints(m, s, "arm"))
    assert t.n_dof == 2
    assert list(t.lower) == [-1, -2] and list(t.upper) == [1, 2]


def test_group_state_vector():
    m = parse_urdf(URDF)
    s = parse_srdf(SRDF)
    np.testing.assert_allclose(group_state_vector(m, s, "home"), [0.25, -0.5])


def test_disable_collisions_prunes_pairs():
    m = parse_urdf(URDF)
    s = parse_srdf(SRDF)
    t = build_tree(m)
    with_acm = scene_from_urdf(t, m, srdf=s)
    without = scene_from_urdf(t, m)
    names_with = {(a.link, b.link) for a, b in with_acm.pairs()}
    names_without = {(a.link, b.link) for a, b in without.pairs()}
    assert ("base", "l2") in names_without or ("l2", "base") in names_without
    assert ("base", "l2") not in names_with and ("l2", "base") not in names_with
    # only that one pair removed
    assert len(names_without) - len(names_with) == 1


def test_errors():
    m = parse_urdf(URDF)
    s = parse_srdf(SRDF)
    with pytest.raises(KeyError, match="nope"):
        s.group("nope")
    with pytest.raises(ValueError, match="no chain"):
        # tip not below base
        resolve_group_joints(
            m, parse_srdf("""<robot name="r3"><group name="bad">
                 <chain base_link="tool" tip_link="base"/></group></robot>"""),
            "bad")
    with pytest.raises(ValueError, match="root element"):
        parse_srdf("<launch/>")
    with pytest.raises(ValueError, match="no active"):
        resolve_group_joints(
            m, parse_srdf("""<robot name="r3"><group name="empty">
                 <joint name="jt"/></group></robot>"""),
            "empty")
