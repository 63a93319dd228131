"""Collision tests: distance kernels vs hand values, gradient checks, and
end-to-end solves (simple_collision / cast tunneling analogs of
trajopt/test/simple_collision_unit.cpp and cast_cost_unit.cpp) verified by
an independent dense checker.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.collision import geometry as geom
from trajopt_tpu.collision.check import check_trajectory
from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.kinematics.chain import build_tree
from trajopt_tpu.kinematics.urdf import parse_urdf
from trajopt_tpu.problem.trajectory import TrajOptProblem, given_init, stationary_init
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.collision import collision_term
from trajopt_tpu.terms.joint import joint_pos, joint_vel

V = jnp.asarray


# ----------------------------------------------------------- kernel tests

def test_sphere_sphere():
    d = geom.sphere_sphere(V([0.0, 0, 0]), 0.5, V([2.0, 0, 0]), 0.3)
    np.testing.assert_allclose(d, 1.2, atol=1e-9)
    d = geom.sphere_sphere(V([0.0, 0, 0]), 0.5, V([0.4, 0, 0]), 0.3)
    np.testing.assert_allclose(d, -0.4, atol=1e-9)  # penetration


def test_point_box_sdf_inside_outside():
    h = V([1.0, 1.0, 1.0])
    np.testing.assert_allclose(geom.point_box_sdf(V([2.0, 0, 0]), h), 1.0)
    np.testing.assert_allclose(geom.point_box_sdf(V([2.0, 2.0, 0.0]), h),
                               np.sqrt(2.0), atol=1e-9)
    np.testing.assert_allclose(geom.point_box_sdf(V([0.5, 0.0, 0.0]), h), -0.5)


def test_capsule_capsule_crossing():
    # Perpendicular crossing segments, 1 apart in z
    d = geom.capsule_capsule(V([-1.0, 0, 0]), V([1.0, 0, 0]), 0.2,
                             V([0.0, -1, 1]), V([0.0, 1, 1]), 0.3)
    np.testing.assert_allclose(d, 0.5, atol=1e-6)


def test_segment_box_min_over_t():
    # Segment passing diagonally over a unit box at z=2: closest at mid
    h = V([1.0, 1.0, 1.0])
    d = geom.segment_box(V([-3.0, 0, 2.0]), V([3.0, 0, 2.0]),
                         jnp.eye(3), jnp.zeros(3), h)
    np.testing.assert_allclose(d, 1.0, atol=1e-6)
    # Segment that dips through the box -> penetration
    d = geom.segment_box(V([-3.0, 0, 0.0]), V([3.0, 0, 0.0]),
                         jnp.eye(3), jnp.zeros(3), h)
    np.testing.assert_allclose(d, -1.0, atol=1e-4)


def test_box_box_aabb():
    d = geom.box_box_axis_aligned(jnp.eye(3), V([0.0, 0, 0]), V([0.5, 0.5, 0.5]),
                                  jnp.eye(3), V([2.0, 0, 0]), V([0.5, 0.5, 0.5]))
    np.testing.assert_allclose(d, 1.0, atol=1e-9)
    d = geom.box_box_axis_aligned(jnp.eye(3), V([0.0, 0, 0]), V([0.5, 0.5, 0.5]),
                                  jnp.eye(3), V([0.6, 0, 0]), V([0.5, 0.5, 0.5]))
    np.testing.assert_allclose(d, -0.4, atol=1e-9)


def test_distance_gradients_finite_and_match_fd():
    h = V([1.0, 0.8, 0.6])

    cases = [
        lambda c: geom.sphere_box(c, 0.2, jnp.eye(3), jnp.zeros(3), h),
        lambda c: geom.sphere_sphere(c, 0.2, V([1.5, 0.2, -0.3]), 0.4),
        lambda c: geom.capsule_box(c, c + V([0.5, 0.1, 0.0]), 0.1,
                                   jnp.eye(3), jnp.zeros(3), h),
    ]
    for f in cases:
        for c0 in [V([2.0, 0.3, 0.1]), V([-1.7, 1.2, 0.4])]:
            g = jax.grad(f)(c0)
            assert np.all(np.isfinite(np.asarray(g)))
            eps = 1e-6
            for i in range(3):
                fd = (f(c0.at[i].add(eps)) - f(c0.at[i].add(-eps))) / (2 * eps)
                np.testing.assert_allclose(g[i], fd, atol=1e-5)


# ------------------------------------------------------------ scene setup

SPHEREBOT = build_tree(parse_urdf("""
<robot name="spherebot">
  <link name="world"/><link name="xc"/><link name="ball"/>
  <joint name="x" type="prismatic"><parent link="world"/><child link="xc"/>
    <axis xyz="1 0 0"/><limit lower="-10" upper="10"/></joint>
  <joint name="y" type="prismatic"><parent link="xc"/><child link="ball"/>
    <axis xyz="0 1 0"/><limit lower="-10" upper="10"/></joint>
</robot>"""))

BOXBOT = build_tree(parse_urdf("""
<robot name="boxbot">
  <link name="world"/><link name="xc"/><link name="box"/>
  <joint name="x" type="prismatic"><parent link="world"/><child link="xc"/>
    <axis xyz="1 0 0"/><limit lower="-10" upper="10"/></joint>
  <joint name="y" type="prismatic"><parent link="xc"/><child link="box"/>
    <axis xyz="0 1 0"/><limit lower="-10" upper="10"/></joint>
</robot>"""))


def spherebot_scene():
    s = CollisionScene(SPHEREBOT)
    s.add_link_sphere("ball", 0.25)
    s.add_world_box("obstacle", [0.5, 0.5, 0.5], [0.0, 0.0, 0.0])
    return s


def boxbot_scene():
    s = CollisionScene(BOXBOT)
    s.add_link_box("box", [0.5, 0.5, 0.5])
    s.add_world_box("obstacle", [0.5, 0.5, 0.5], [0.0, 0.0, 0.0])
    return s


def test_scene_distances():
    s = spherebot_scene()
    d = s.distances(V([-2.0, 0.0]))
    np.testing.assert_allclose(d, [1.25], atol=1e-9)  # 2 - 0.5 - 0.25
    d = s.distances(V([0.0, 0.0]))
    np.testing.assert_allclose(d, [-0.75], atol=1e-9)


def test_swept_distance_catches_tunneling():
    s = spherebot_scene()
    q0, q1 = V([-2.0, 0.0]), V([2.0, 0.0])
    # Both endpoints clear of the obstacle, sweep goes straight through it.
    assert float(s.distances(q0)[0]) > 1.0
    assert float(s.distances(q1)[0]) > 1.0
    assert float(s.swept_distances(q0, q1)[0]) < -0.7


# -------------------------------------------------------------- e2e tests

def test_simple_collision_solve():
    """simple_collision_test.json analog: 1 step, pulled to the obstacle
    center by a joint_pos cost, pushed out by collision cost + cnt."""
    s = spherebot_scene()
    prob = TrajOptProblem(n_steps=1, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10])
    prob.add_term(collision_term(s, 1, margin=0.3, coeff=1.0, is_cost=True))
    prob.add_term(collision_term(s, 1, margin=0.2, coeff=1.0, is_cost=False))
    prob.add_term(joint_pos(1, 2, is_cost=True, targets=np.zeros(2),
                            first_step=0, last_step=0))
    res = prob.make_solve()(given_init(jnp.array([[-0.75, 0.75]])))
    assert int(res.status) == SQPStatus.CONVERGED
    d = float(s.distances(res.x.reshape(2))[0])
    assert d >= 0.2 - 1e-3  # constraint margin respected


def test_discrete_collision_push_out_of_initial_collision():
    """Initial trajectory in collision; discrete collision cost + joint
    terms produce a collision-free path (simple boxbot world)."""
    s = boxbot_scene()
    n = 5
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0, n - 1])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(collision_term(s, n, margin=0.05, coeff=20.0, is_cost=False,
                                 fixed_steps=[0, n - 1]))
    init = given_init(jnp.array([[-2.5, 0.4], [-1.25, 0.2], [0.0, 0.0],
                                 [1.25, 0.2], [2.5, 0.4]]))
    assert float(jnp.min(s.distances(init[2]))) < 0  # starts in collision
    res = prob.make_solve()(init)
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(n, 2)
    for q in traj:
        assert float(jnp.min(s.distances(jnp.asarray(q)))) >= 0.05 - 1e-3


def test_cast_collision_prevents_tunneling():
    """cast_cost_unit analog: step states are collision-free but the sweep
    tunnels; the cast term must detect and push the path around."""
    s = boxbot_scene()
    n = 3
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0, n - 1])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(collision_term(s, n, margin=0.05, coeff=20.0, is_cost=False,
                                 evaluator="cast", fixed_steps=[0, n - 1]))
    init = given_init(jnp.array([[-1.9, 0.0], [0.0, 1.2], [1.9, 0.0]]))
    # endpoints + middle are discrete-collision-free:
    for q in init:
        assert float(jnp.min(s.distances(q))) > 0.0
    # ... but the swept path is not:
    ok0, d0 = check_trajectory(s, np.asarray(init))
    assert not ok0
    res = prob.make_solve()(init)
    assert int(res.status) == SQPStatus.CONVERGED
    ok, dmin = check_trajectory(s, np.asarray(res.x).reshape(n, 2))
    assert ok, f"trajectory still in collision (dmin={dmin})"


def test_lvs_discrete_equivalent_protection():
    """LVS-discrete with enough substeps also prevents the tunnel.

    Uses the sphere robot: its Euclidean distance field is plateau-free, so
    interpolated-substate sampling has useful gradients everywhere.  (For
    box robots passing deep through box obstacles, discrete sampling's MTV
    is axis-locked near corners — the reference's cast evaluator exists for
    exactly that reason, and so does ours: see
    test_cast_collision_prevents_tunneling.)
    """
    s = spherebot_scene()
    n = 3
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0, n - 1])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(collision_term(s, n, margin=0.05, coeff=20.0, is_cost=False,
                                 evaluator="lvs_discrete", lvs_substeps=16,
                                 fixed_steps=[0, n - 1]))
    init = given_init(jnp.array([[-1.9, 0.0], [0.0, 0.3], [1.9, 0.0]]))
    ok0, _ = check_trajectory(s, np.asarray(init))
    assert not ok0  # the interpolated path passes through the obstacle
    res = prob.make_solve()(init)
    assert int(res.status) == SQPStatus.CONVERGED
    ok, dmin = check_trajectory(s, np.asarray(res.x).reshape(n, 2))
    assert ok, f"dmin={dmin}"


def test_batched_collision_solves_with_random_obstacles():
    """vmap over per-problem obstacle positions via params-keyed scene...
    (obstacle position is baked in the scene; batching here varies the
    goal instead, exercising vmapped collision solves)."""
    s = spherebot_scene()
    n = 4
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets="goal",
                            first_step=n - 1, last_step=n - 1))
    prob.add_term(collision_term(s, n, margin=0.1, coeff=20.0, is_cost=False,
                                 fixed_steps=[0]))
    solve = prob.make_solve()
    goals = jnp.array([[2.0, 0.3], [1.5, -1.5], [2.5, 1.0]])
    init = stationary_init(jnp.array([-2.0, 0.0]), n)
    res = jax.jit(jax.vmap(lambda g: solve(init, {"goal": g})))(goals)
    assert np.all(np.asarray(res.status) == SQPStatus.CONVERGED)
    for b in range(3):
        traj = np.asarray(res.x[b]).reshape(n, 2)
        np.testing.assert_allclose(traj[-1], goals[b], atol=1e-3)
        for q in traj:
            assert float(jnp.min(s.distances(jnp.asarray(q)))) >= 0.1 - 1e-3


def test_structured_jacobian_matches_full_autodiff():
    """The per-step/per-gap scatter Jacobians must equal jacrev through the
    full trajectory vector."""
    s = boxbot_scene()
    n = 4
    x = jnp.asarray(np.random.default_rng(5).normal(size=(n * 2,)) * 1.5)
    for term in [
        collision_term(s, n, margin=0.05, coeff=3.0, is_cost=False,
                       fixed_steps=[0]),
        collision_term(s, n, margin=0.05, coeff=3.0, is_cost=False,
                       evaluator="cast", lvs_substeps=3),
        collision_term(s, n, margin=0.05, is_cost=True,
                       evaluator="lvs_discrete", lvs_substeps=2),
    ]:
        J_full = jax.jacrev(lambda v: term.fn(v, {}))(x)
        J_struct = term.jac_fn(x, {})
        np.testing.assert_allclose(J_struct, J_full, atol=1e-9,
                                   err_msg=term.name)


def test_boxbox_scene_first_use_under_tracing():
    """The box-box kernel-selection decision (_boxbox_aligned) computes a
    zero-config FK; a FRESH scene whose first distances() call happens
    inside a trace (jax.eval_shape during TrajOptProblem term validation)
    must not leak tracers into that static decision (regression: round-5
    TracerArrayConversionError via np.asarray on staged FK)."""
    s = boxbot_scene()  # fresh; no eager call primes the caches
    shape = jax.eval_shape(lambda q: s.distances(q), V([0.0, 0.0]))
    assert shape.shape == (s.n_pairs,)
    # and the result after tracing matches an eagerly-primed scene
    d_traced = jax.jit(s.distances)(V([3.0, 0.0]))
    d_eager = boxbot_scene().distances(V([3.0, 0.0]))
    np.testing.assert_allclose(d_traced, d_eager, atol=1e-12)
