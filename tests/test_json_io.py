"""JSON front-end tests: schema parsing, strict unknown-field rejection,
term dispatch, init trajectories, opt_info overrides — the interface_unit
/ json-construction-path analog (trajopt/test/interface_unit.cpp).

Fixture documents are written fresh against the schema of
ProblemConstructionInfo::fromJson (problem_description.cpp:272-307).
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_collision import boxbot_scene, spherebot_scene
from trajopt_tpu.problem.json_io import Environment, construct_problem
from trajopt_tpu.sqp.params import SQPStatus

SIMPLE_COLLISION_DOC = {
    "basic_info": {"n_steps": 1, "manip": "manipulator"},
    "costs": [
        {"type": "collision",
         "params": {"coeffs": 1, "dist_pen": 0.3, "evaluator_type": 1,
                    "longest_valid_segment_length": 0.05}},
        {"type": "joint_pos", "name": "joint0",
         "params": {"coeffs": [1, 1], "targets": [0.0, 0.0],
                    "first_step": 0, "last_step": 0}},
    ],
    "constraints": [
        {"type": "collision",
         "params": {"coeffs": 1, "dist_pen": 0.2, "evaluator_type": 1,
                    "longest_valid_segment_length": 0.05}},
    ],
    "init_info": {"type": "given_traj", "data": [[-0.75, 0.75]]},
}

CAST_DOC = {
    "basic_info": {"n_steps": 3, "manip": "manipulator",
                   "fixed_timesteps": [0, 2]},
    "costs": [
        {"type": "joint_vel", "name": "jvel0",
         "params": {"coeffs": [1, 1], "targets": [0, 0]}},
    ],
    "constraints": [
        {"type": "collision",
         "params": {"coeffs": 20, "dist_pen": 0.05, "evaluator_type": 3,
                    "fixed_steps": [0, 2]}},
    ],
    "init_info": {"type": "given_traj",
                  "data": [[-1.9, 0.0], [0.0, 1.2], [1.9, 0.0]]},
}


def test_simple_collision_json_solve():
    scene = spherebot_scene()
    env = Environment(tree=scene.tree, scene=scene)
    jp = construct_problem(SIMPLE_COLLISION_DOC, env)
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    d = float(scene.distances(res.x.reshape(2))[0])
    assert d >= 0.2 - 1e-3


def test_cast_json_solve():
    scene = boxbot_scene()
    env = Environment(tree=scene.tree, scene=scene)
    jp = construct_problem(CAST_DOC, env)
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    from trajopt_tpu.collision.check import check_trajectory
    ok, dmin = check_trajectory(scene, np.asarray(res.x).reshape(3, 2))
    assert ok, dmin


def test_unknown_field_rejected():
    doc = dict(SIMPLE_COLLISION_DOC)
    doc["bogus_section"] = {}
    scene = spherebot_scene()
    with pytest.raises(ValueError, match="bogus_section"):
        construct_problem(doc, Environment(tree=scene.tree, scene=scene))


def test_unknown_term_param_rejected():
    doc = json.loads(json.dumps(SIMPLE_COLLISION_DOC))
    doc["costs"][1]["params"]["nonsense"] = 1
    scene = spherebot_scene()
    with pytest.raises(ValueError, match="nonsense"):
        construct_problem(doc, Environment(tree=scene.tree, scene=scene))


def test_stationary_and_interpolated_init():
    scene = spherebot_scene()
    env = Environment(tree=scene.tree, scene=scene,
                      current_state=np.array([1.0, 2.0]))
    doc = {
        "basic_info": {"n_steps": 4, "manip": "m"},
        "costs": [{"type": "joint_vel", "params": {"coeffs": [1, 1]}}],
        "init_info": {"type": "stationary"},
    }
    jp = construct_problem(doc, env)
    np.testing.assert_allclose(np.asarray(jp.init_traj),
                               np.tile([1.0, 2.0], (4, 1)))
    doc["init_info"] = {"type": "joint_interpolated", "endpoint": [3.0, 4.0]}
    jp = construct_problem(doc, env)
    np.testing.assert_allclose(np.asarray(jp.init_traj)[-1], [3.0, 4.0])
    np.testing.assert_allclose(np.asarray(jp.init_traj)[0], [1.0, 2.0])


def test_opt_info_overrides():
    scene = spherebot_scene()
    doc = {
        "basic_info": {"n_steps": 1, "manip": "m"},
        "opt_info": {"max_iter": 7, "cnt_tolerance": 1e-3,
                     "trust_box_size": 0.5},
        "costs": [{"type": "joint_pos",
                   "params": {"targets": [0, 0], "first_step": 0,
                              "last_step": 0}}],
    }
    jp = construct_problem(doc, Environment(tree=scene.tree, scene=scene))
    assert jp.sqp.max_iter == 7
    assert jp.sqp.cnt_tolerance == 1e-3
    assert jp.sqp.initial_trust_box_size == 0.5


def test_cart_pose_json_term():
    from trajopt_tpu.models.robots import rrbot
    tree = rrbot()
    env = Environment(tree=tree, current_state=np.array([0.1, 0.1]))
    target_q = np.array([0.8, -0.6])
    import tests.test_kinematics as tk
    target_p = tk.rr_fk(*target_q)
    doc = {
        "basic_info": {"n_steps": 1, "manip": "m"},
        "constraints": [
            {"type": "cart_pose",
             "params": {"timestep": 0, "source_frame": "ee_link",
                        "target_frame": "base_link",
                        "target_frame_offset_xyz": list(target_p),
                        "rot_coeffs": [0, 0, 0]}},
        ],
        "init_info": {"type": "stationary"},
    }
    jp = construct_problem(doc, env)
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    _, p = tree.fk(res.x.reshape(2))
    np.testing.assert_allclose(p[tree.link_id("ee_link")], target_p, atol=1e-3)


def test_dynamic_cart_pose_json_term():
    """dynamic_cart_pose hatches from JSON (the reference registers
    DynamicCartPoseTermInfo under that name, problem_description.cpp:53,
    312) with source/target frame offsets applied."""
    from trajopt_tpu.models.robots import rrbot
    tree = rrbot()
    env = Environment(tree=tree, current_state=np.array([0.7, 0.5]))
    doc = {
        "basic_info": {"n_steps": 1, "manip": "m"},
        "constraints": [
            {"type": "dynamic_cart_pose",
             "params": {"timestep": 0, "source_frame": "ee_link",
                        "target_frame": "link_1",
                        # relative pose of ee in link_1 frame when q2 = 0
                        "target_frame_offset_xyz": [1.8, 0.0, 0.0],
                        "rot_coeffs": [0, 0, 0]}},
        ],
        "init_info": {"type": "stationary"},
    }
    jp = construct_problem(doc, env)
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    q = np.asarray(res.x)
    np.testing.assert_allclose(q[1], 0.0, atol=1e-4)  # q2 driven to zero

    # a static target_frame is a config error for the dynamic term
    bad = {
        "basic_info": {"n_steps": 1, "manip": "m"},
        "constraints": [
            {"type": "dynamic_cart_pose",
             "params": {"timestep": 0, "source_frame": "ee_link",
                        "target_frame": "base_link"}},
        ],
        "init_info": {"type": "stationary"},
    }
    with pytest.raises(ValueError, match="static"):
        construct_problem(bad, env)


def test_cart_pose_source_frame_offset_json():
    """source_frame_offset_xyz shifts the controlled point (TCP) — the
    reference applies both frame offsets (problem_description.cpp:726-766);
    previously the field was accepted but silently ignored."""
    from trajopt_tpu.models.robots import rrbot
    tree = rrbot()
    env = Environment(tree=tree, current_state=np.array([0.1, 0.1]))
    target_q = np.array([0.8, -0.6])
    # place the TCP 0.1 beyond the ee along its local x; target = that
    # point's world position at target_q
    import jax.numpy as jnp
    R, p = tree.fk(jnp.asarray(target_q))
    eid = tree.link_id("ee_link")
    tcp_world = np.asarray(p[eid]) + np.asarray(R[eid]) @ np.array([0.1, 0, 0])
    doc = {
        "basic_info": {"n_steps": 1, "manip": "m"},
        "constraints": [
            {"type": "cart_pose",
             "params": {"timestep": 0, "source_frame": "ee_link",
                        "source_frame_offset_xyz": [0.1, 0.0, 0.0],
                        "target_frame_offset_xyz": list(tcp_world),
                        "rot_coeffs": [0, 0, 0]}},
        ],
        "init_info": {"type": "stationary"},
    }
    jp = construct_problem(doc, env)
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    R2, p2 = tree.fk(res.x.reshape(2))
    got = np.asarray(p2[eid]) + np.asarray(R2[eid]) @ np.array([0.1, 0, 0])
    np.testing.assert_allclose(got, tcp_world, atol=1e-3)


def test_use_time_json_problem():
    """basic_info.use_time routes joint_vel to its 1/dt variant and enables
    total_time (arm_around_table_time.json pattern)."""
    scene = spherebot_scene()
    env = Environment(tree=scene.tree, scene=scene,
                      current_state=np.array([0.0, 0.0]))
    doc = {
        "basic_info": {"n_steps": 4, "manip": "m", "use_time": True,
                       "dt_lower_lim": 0.05, "dt_upper_lim": 5.0,
                       "fixed_timesteps": [0]},
        "costs": [
            {"type": "total_time", "params": {"coeff": 5.0}},
        ],
        "constraints": [
            {"type": "joint_vel",
             "params": {"upper_tols": [2.0, 2.0], "lower_tols": [-2.0, -2.0]}},
            {"type": "joint_pos",
             "params": {"targets": [3.0, 0.0], "first_step": 3,
                        "last_step": 3}},
        ],
        "init_info": {"type": "stationary", "dt": 1.0},
    }
    jp = construct_problem(doc, env)
    assert jp.prob.use_time
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    m = np.asarray(res.x).reshape(4, 3)
    np.testing.assert_allclose(m[-1, :2], [3.0, 0.0], atol=1e-3)
    vels = np.abs(np.diff(m[:, 0]) * m[1:, 2])
    assert np.all(vels <= 2.0 + 1e-3)


def test_custom_term_registry():
    """RegisterMaker analog: user-registered term types hatch from JSON."""
    from trajopt_tpu.problem.json_io import register_term_type
    from trajopt_tpu.sqp.nlp import Kind, TermSet

    @register_term_type("sum_to")
    def _build(prob, env, params, is_cost, name):
        total = float(params["total"])
        prob.add_term(TermSet(name, Kind.CNT_EQ,
                              lambda x, p: jnp.atleast_1d(jnp.sum(x) - total),
                              1))

    scene = spherebot_scene()
    doc = {
        "basic_info": {"n_steps": 1, "manip": "m"},
        "costs": [{"type": "joint_pos",
                   "params": {"targets": [0, 0], "first_step": 0,
                              "last_step": 0}}],
        "constraints": [{"type": "sum_to", "params": {"total": 1.0}}],
    }
    jp = construct_problem(doc, Environment(tree=scene.tree, scene=scene))
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(res.x).sum(), 1.0, atol=1e-4)


def test_yaml_problem_file(tmp_path):
    import os
    scene = spherebot_scene()
    env = Environment(tree=scene.tree, scene=scene,
                      current_state=np.array([0.5, 0.5]))
    yaml_doc = """
basic_info:
  n_steps: 3
  manip: m
costs:
  - type: joint_vel
    params:
      coeffs: [1, 1]
constraints:
  - type: joint_pos
    params:
      targets: [1.0, -1.0]
      first_step: 2
      last_step: 2
init_info:
  type: stationary
"""
    path = os.path.join(tmp_path, "prob.yaml")
    with open(path, "w") as f:
        f.write(yaml_doc)
    from trajopt_tpu.problem.json_io import load_problem_file
    jp = load_problem_file(path, env)
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(res.x).reshape(3, 2)[-1],
                               [1.0, -1.0], atol=1e-3)


def test_convex_solver_backend_selection():
    """basic_info.convex_solver = 'native' routes to the host reference
    driver + C++ QP (TRAJOPT_CONVEX_SOLVER analog)."""
    from trajopt_tpu.qp.native import available
    if not available():
        pytest.skip("native backend unavailable")
    scene = spherebot_scene()
    doc = json.loads(json.dumps(SIMPLE_COLLISION_DOC))
    doc["basic_info"]["convex_solver"] = "native"
    jp = construct_problem(doc, Environment(tree=scene.tree, scene=scene))
    assert jp.backend == "native"
    res = jp.solve()
    assert res.status == SQPStatus.CONVERGED
    d = float(scene.distances(jnp.asarray(res.x))[0])
    assert d >= 0.2 - 1e-3


def test_avoid_singularity_json_term():
    from trajopt_tpu.models.robots import rrbot
    tree = rrbot()
    doc = {
        "basic_info": {"n_steps": 1, "manip": "m"},
        "costs": [
            {"type": "avoid_singularity",
             "params": {"link": "ee_link", "lambda": 1e-3, "coeffs": 2.0}},
            {"type": "joint_pos",
             "params": {"targets": [0.5, 0.5], "first_step": 0,
                        "last_step": 0}},
        ],
        "init_info": {"type": "stationary"},
    }
    env = Environment(tree=tree, current_state=np.array([0.5, 0.5]))
    jp = construct_problem(doc, env)
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED


def test_collision_pairs_and_buffer_json():
    """`pairs` per-link-pair coeff/dist_pen overrides
    (problem_description.cpp:1700-1710) + use_weighted_sum +
    safety_margin_buffer flow through to the term."""
    scene = spherebot_scene()
    env = Environment(tree=scene.tree, scene=scene)
    doc = {
        "basic_info": {"n_steps": 1, "manip": "manipulator"},
        "costs": [
            {"type": "joint_pos",
             "params": {"targets": [0.0, 0.0], "first_step": 0,
                        "last_step": 0}},
        ],
        "constraints": [
            {"type": "collision",
             "params": {"coeffs": 1, "dist_pen": 0.2, "evaluator_type": 1,
                        "safety_margin_buffer": 0.05,
                        "use_weighted_sum": True,
                        "pairs": [{"link": "ball",
                                   "pair": ["obstacle"],
                                   "coeffs": 3.0, "dist_pen": 0.4}]}},
        ],
        "init_info": {"type": "given_traj", "data": [[-0.75, 0.75]]},
    }
    jp = construct_problem(doc, env)
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    # overridden margin 0.4 is enforced (base 0.2 would allow closer)
    d = float(scene.distances(jnp.asarray(np.asarray(res.x)))[0])
    assert d >= 0.4 - 1e-3


def test_collision_per_timestep_vectors_json():
    scene = spherebot_scene()
    env = Environment(tree=scene.tree, scene=scene)
    doc = {
        "basic_info": {"n_steps": 3, "manip": "manipulator"},
        "costs": [{"type": "joint_vel", "params": {"coeffs": [1, 1]}}],
        "constraints": [
            {"type": "collision",
             "params": {"coeffs": [1, 1, 1], "dist_pen": [0.2, 0.3, 0.2],
                        "evaluator_type": 1}},
            {"type": "joint_pos",
             "params": {"targets": [-0.9, 0.9], "first_step": 0,
                        "last_step": 0}},
        ],
        "init_info": {"type": "given_traj",
                      "data": [[-0.9, 0.9], [-0.8, 0.85], [-0.75, 0.8]]},
    }
    jp = construct_problem(doc, env)
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(3, 2)
    # middle step must honor the larger 0.3 margin
    d1 = float(scene.distances(jnp.asarray(traj[1]))[0])
    assert d1 >= 0.3 - 1e-3


def test_contact_test_type_rejected_loudly():
    scene = spherebot_scene()
    env = Environment(tree=scene.tree, scene=scene)
    doc = dict(SIMPLE_COLLISION_DOC)
    doc["constraints"] = [
        {"type": "collision",
         "params": {"coeffs": 1, "dist_pen": 0.2, "evaluator_type": 1,
                    "contact_test_type": 1}},
    ]
    with pytest.raises(ValueError, match="contact_test_type"):
        construct_problem(doc, env)


def test_num_threads_rejected_loudly():
    scene = spherebot_scene()
    env = Environment(tree=scene.tree, scene=scene)
    doc = dict(SIMPLE_COLLISION_DOC)
    doc["opt_info"] = {"num_threads": 8}
    with pytest.raises(ValueError, match="num_threads"):
        construct_problem(doc, env)


def test_user_defined_json_term():
    """JSON `user_defined` type resolving registered functions (superset of
    UserDefinedTermInfo, whose fromJson throws — pd.cpp:594-597)."""
    from trajopt_tpu.terms.user import register_user_function

    @register_user_function("sum_to_param")
    def _sum_err(q, params):
        return jnp.atleast_1d(jnp.sum(q) - 1.0)

    scene = boxbot_scene()
    env = Environment(tree=scene.tree, scene=scene)
    doc = {
        "basic_info": {"n_steps": 1, "manip": "manipulator"},
        "costs": [
            {"type": "joint_pos",
             "params": {"targets": [0.0, 0.0], "first_step": 0,
                        "last_step": 0}},
        ],
        "constraints": [
            {"type": "user_defined",
             "params": {"error_function": "sum_to_param",
                        "constraint_type": "eq"}},
        ],
        "init_info": {"type": "given_traj", "data": [[2.0, 2.0]]},
    }
    jp = construct_problem(doc, env)
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(res.x).sum(), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=1e-3)


def test_max_time_limit_native_backend():
    scene = spherebot_scene()
    env = Environment(tree=scene.tree, scene=scene)
    doc = dict(SIMPLE_COLLISION_DOC)
    doc = json.loads(json.dumps(SIMPLE_COLLISION_DOC))
    doc["basic_info"]["convex_solver"] = "native"
    doc["opt_info"] = {"max_time": 0.0}
    jp = construct_problem(doc, env)
    res = jp.solve()
    assert int(res.status) == SQPStatus.TIME_LIMIT


def test_log_results_writes_csv(tmp_path):
    scene = spherebot_scene()
    env = Environment(tree=scene.tree, scene=scene)
    doc = json.loads(json.dumps(SIMPLE_COLLISION_DOC))
    doc["opt_info"] = {"log_results": True, "log_dir": str(tmp_path)}
    jp = construct_problem(doc, env)
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    solver_log = (tmp_path / "trajopt_solver.log").read_text()
    assert solver_log.startswith("iteration,")
    assert len(solver_log.splitlines()) >= 2
    assert (tmp_path / "trajopt_vars.log").exists()
