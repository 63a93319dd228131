"""Verbatim reference-fixture conformance: parse the reference's URDF/SRDF
robots and JSON problem documents byte-for-byte (zero edits) through this
framework's loaders, solve, and verify collision-free results with the
independent dense checker.

Mirrors trajopt/test/{simple_collision_unit,cast_cost_unit,planning_unit}
.cpp, which build tesseract Environments from trajopt_common/data/ and
construct problems via ConstructProblem(json, env)
(problem_description.cpp:272-307, 544-551).

Tests skip when /root/reference is not present (the framework itself has
no reference dependency).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.collision.world import scene_from_urdf
from trajopt_tpu.kinematics.chain import build_tree
from trajopt_tpu.kinematics.srdf import load_srdf, resolve_group_joints
from trajopt_tpu.kinematics.urdf import load_urdf
from trajopt_tpu.problem.json_io import Environment, construct_problem
from trajopt_tpu.sqp.params import SQPStatus

REF_DATA = "/root/reference/trajopt_common/data"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DATA),
                                reason="reference data not available")


def _load_doc(name):
    with open(f"{REF_DATA}/config/{name}") as f:
        return json.load(f)


def _env_from_reference(urdf_name, srdf_name, group):
    model = load_urdf(f"{REF_DATA}/{urdf_name}")
    srdf = load_srdf(f"{REF_DATA}/{srdf_name}")
    active = resolve_group_joints(model, srdf, group)
    tree = build_tree(model, active_joints=active)
    scene = scene_from_urdf(tree, model, srdf,
                            package_map={"trajopt_common":
                                         os.path.dirname(REF_DATA)})
    return Environment(tree=tree, scene=scene), model, scene


def test_simple_collision_test_json_verbatim():
    """simple_collision_test.json on the verbatim spherebot fixture
    (simple_collision_unit.cpp): spherebot pulled into the test spheres by
    a joint_pos cost, pushed out by the 0.2 collision constraint."""
    env, model, scene = _env_from_reference("spherebot.urdf",
                                            "spherebot.srdf", "manipulator")
    assert env.tree.n_dof == 2
    doc = _load_doc("simple_collision_test.json")
    jp = construct_problem(doc, env)
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    q = jnp.asarray(np.asarray(res.x).reshape(2))
    # the 0.2 dist_pen constraint is satisfied against every test sphere
    assert float(jnp.min(scene.distances(q))) >= 0.2 - 1e-3
    # and the goal pull keeps the robot near the origin cluster
    assert float(jnp.linalg.norm(q)) < 2.0


def test_box_cast_test_json_verbatim():
    """box_cast_test.json on the verbatim boxbot fixture
    (cast_cost_unit.cpp:60-118): the straight-line init sweeps THROUGH the
    obstacle between steps; the cast cost must push the path around it.
    Verified with a dense interpolated check (the checkTrajectory role)."""
    env, model, scene = _env_from_reference("boxbot.urdf", "boxbot.srdf",
                                            "manipulator")
    assert env.tree.n_dof == 2
    doc = _load_doc("box_cast_test.json")
    jp = construct_problem(doc, env)
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(3, 2)
    # fixed first step honored
    np.testing.assert_allclose(traj[0], [-1.9, 0.0], atol=1e-9)
    # goal constraint
    np.testing.assert_allclose(traj[2], [1.9, 3.8], atol=1e-3)
    # continuous collision-free: dense interpolation between steps
    for g in range(2):
        for k in range(41):
            f = k / 40.0
            q = traj[g] + f * (traj[g + 1] - traj[g])
            assert float(jnp.min(scene.distances(jnp.asarray(q)))) > -1e-6


def test_arm_around_table_json_verbatim():
    """arm_around_table.json on the verbatim PR2 fixture
    (planning_unit.cpp:108-141): 7-DOF right arm, 6 steps, cast collision
    cost, joint goal constraint.  The init sweeps the arm through the
    table; the reference requires OPT_CONVERGED and a collision-free
    final trajectory under an LVS-0.05 continuous check
    (LONGEST_VALID_SEGMENT_LENGTH, planning_unit.cpp:37, margin 0)."""
    env, model, scene = _env_from_reference("arm_around_table.urdf",
                                            "pr2.srdf", "right_arm")
    assert env.tree.n_dof == 7
    doc = _load_doc("arm_around_table.json")
    jp = construct_problem(doc, env)
    assert jp.prob.n_steps == 6

    # The SOLVE compiles first: XLA:CPU on parts of the fleet crashes
    # when one process accumulates many compilations before a very large
    # one (CLAUDE.md known host bug), so the big program goes first and
    # the verification below is ONE jitted batched query.
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(6, 7)
    # fixed first step + goal constraint (pd.cpp fixed_timesteps)
    np.testing.assert_allclose(
        traj[0], [-1.832, -0.332, -1.011, -1.437, -1.1, -1.926, 3.074],
        atol=1e-9)
    np.testing.assert_allclose(
        traj[5], [0.062, 1.287, 0.1, -1.554, -3.011, -0.268, 2.988],
        atol=5e-3)

    init = np.asarray(doc["init_info"]["data"], float)
    # f32 verification (same assertions): the f64 swept-query program
    # took ~8.5 min of XLA:CPU compile on the 2-CPU CI host — half the
    # whole test; f32 matches bench.py's verify path and the clearance
    # scale (~0.025) sits 4 orders above f32 noise.
    gap_mins = _lvs_swept_gap_mins(scene,
                                   np.stack([init, traj]).astype(np.float32))
    # the reference first asserts the INIT trajectory IS in collision...
    assert float(gap_mins[0].min()) < 0.0
    # ...and the solved one collision-free under its continuous check
    # (LVS 0.05, margin 0) on every gap
    assert float(gap_mins[1].min()) >= -1e-6, gap_mins[1]


def _lvs_swept_gap_mins(scene, trajs, check_len=0.05):
    """[B, n_gaps] min swept clearance per gap for a batch of
    trajectories, LVS-subdivided at the reference checkTrajectory's
    longest_valid_segment_length (0.05) — ONE jitted batched query."""
    trajs = np.asarray(trajs)
    max_disp = float(np.max(np.linalg.norm(np.diff(trajs, axis=1), axis=2)))
    n_sub = max(1, int(np.ceil(max_disp / check_len)))
    fr = np.linspace(0.0, 1.0, n_sub + 1)
    fa = jnp.asarray(fr[:-1])
    fb = jnp.asarray(fr[1:])

    def gap_min(a, b):
        dq = b - a
        d = jax.vmap(lambda x, y: scene.swept_distances(
            a + x * dq, a + y * dq))(fa.astype(a.dtype), fb.astype(a.dtype))
        return jnp.min(d)

    def lane(tr):
        return jax.vmap(gap_min)(tr[:-1], tr[1:])

    return np.asarray(jax.jit(jax.vmap(lane))(jnp.asarray(trajs)))


def test_repo_arm_table_config_loads():
    """The repo's own bundled config exercises the same loader (VERDICT:
    trajopt_tpu/data/config/arm_table.json was loaded by no test)."""
    import trajopt_tpu
    path = os.path.join(os.path.dirname(trajopt_tpu.__file__), "data",
                        "config", "arm_table.json")
    if not os.path.exists(path):
        pytest.skip("bundled arm_table.json not present")
    from trajopt_tpu.models.benchmarks import ARM7_HOME
    from trajopt_tpu.models.robots import arm7, arm7_scene
    from trajopt_tpu.problem.json_io import load_problem_file
    env = Environment(tree=arm7(), scene=arm7_scene(),
                      current_state=np.asarray(ARM7_HOME))
    jp = load_problem_file(path, env)
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
