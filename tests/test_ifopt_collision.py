"""Facade collision constraints: the ifopt component model's
Discrete/ContinuousCollisionConstraint classes (reference
trajopt_ifopt/src/constraints/collision/*.cpp) — gradient correctness on
single-member link pairs (weighted average degenerates to the exact
gradient), fixed-size row semantics on multi-member pairs, and a
facade-built end-to-end cast problem (the box_cast scenario assembled
through Problem/NodesVariables instead of TrajOptProblem)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.ifopt import (ContinuousCollisionConstraint,
                               DiscreteCollisionConstraint,
                               FunctionalConstraint, Node, NodesVariables,
                               Problem, SquaredCost, _VarReader)
from trajopt_tpu.models.robots import boxbot
from trajopt_tpu.sqp.params import SQPParams, SQPStatus


def _boxbot_scene(n_obstacles: int = 1) -> CollisionScene:
    scene = CollisionScene(boxbot())
    scene.add_link_sphere("boxbot_link", 0.25)
    for i in range(n_obstacles):
        scene.add_world_box(f"obstacle{i}", [0.5, 0.5, 0.5],
                            [0.0, 1.9 * i, 0.0])
    return scene


def _trajectory_problem(scene, n_steps, q_init, lvs_substeps=1,
                        margin=0.05, max_num_cnt=None):
    """Facade assembly: NodesVariables trajectory + joint_vel squared cost
    + per-gap continuous collision constraints."""
    prob = Problem()
    nodes = []
    for t in range(n_steps):
        nd = Node(f"step{t}")
        nd.add_var("position", 2)
        nodes.append(nd)
    nv = prob.add_variable_set(NodesVariables(
        "trajectory", nodes, np.asarray(q_init).reshape(-1),
        lower=-10.0, upper=10.0))
    vel = FunctionalConstraint(
        2 * (n_steps - 1), "joint_vel",
        lambda v: (v["trajectory"].reshape(n_steps, 2)[1:]
                   - v["trajectory"].reshape(n_steps, 2)[:-1]).reshape(-1))
    prob.add_cost_set(SquaredCost(vel, weights=5.0))
    for t in range(n_steps - 1):
        prob.add_constraint_set(ContinuousCollisionConstraint(
            scene, nv.node_var(t, "position"), nv.node_var(t + 1, "position"),
            margin=margin, coeff=20.0, lvs_substeps=lvs_substeps,
            max_num_cnt=max_num_cnt, name=f"collision{t}"))
    return prob, nv


def _reader(prob, x):
    return _VarReader(jnp.asarray(x), prob._by_name)


def test_discrete_rows_and_fd_gradient():
    """One geom pair per link pair: weighted average == exact gradient, so
    the analytic jacobian must match finite differences."""
    scene = _boxbot_scene()
    prob = Problem()
    from trajopt_tpu.ifopt import VariableSet
    vs = prob.add_variable_set(VariableSet("q", np.array([0.8, 0.6])))
    cs = DiscreteCollisionConstraint(scene, vs.var(), margin=0.1, coeff=20.0)
    assert cs.rows == 1  # one link pair in the scene
    x = np.array([0.8, 0.6])
    v = np.asarray(cs.values(_reader(prob, x)))
    d = float(scene.distances(jnp.asarray(x)).min())
    np.testing.assert_allclose(v, 20.0 * (0.1 - d), atol=1e-10)
    J = np.asarray(cs.jacobian(_reader(prob, x)))
    eps = 1e-6
    for i in range(2):
        dx = np.zeros(2)
        dx[i] = eps
        vp = np.asarray(cs.values(_reader(prob, x + dx)))
        vm = np.asarray(cs.values(_reader(prob, x - dx)))
        np.testing.assert_allclose(J[:, i], (vp - vm) / (2 * eps),
                                   rtol=1e-4, atol=1e-6)


def test_continuous_fd_gradient_and_lvs():
    # A SPHERE obstacle keeps the swept witness point unique (a straight
    # sweep past a box face has a flat minimum where the analytic cc-time
    # gradient split and the FD subgradient legitimately differ); the
    # asymmetric sweep stays 0.1 inside the margin band so the weighting
    # is active.
    scene = CollisionScene(boxbot())
    scene.add_link_sphere("boxbot_link", 0.25)
    scene.add_world_sphere("obstacle", 0.5, [0.3, 0.0, 0.0])
    prob = Problem()
    from trajopt_tpu.ifopt import VariableSet
    vs = prob.add_variable_set(VariableSet("q", np.array([-1.5, 0.65,
                                                          1.5, 0.85])))
    from trajopt_tpu.ifopt import Var
    v0 = Var(0, 2, "q0")
    v1 = Var(2, 2, "q1")
    for n_sub in (1, 4):
        cs = ContinuousCollisionConstraint(scene, v0, v1, margin=0.05,
                                           coeff=20.0, lvs_substeps=n_sub)
        x = np.asarray(vs.init)
        J = np.asarray(cs.jacobian(_reader(prob, x)))
        assert J.shape == (1, 4)
        eps = 1e-6
        fd = np.zeros((1, 4))
        for i in range(4):
            dx = np.zeros(4)
            dx[i] = eps
            vp = np.asarray(cs.values(_reader(prob, x + dx)))
            vm = np.asarray(cs.values(_reader(prob, x - dx)))
            fd[:, i] = (vp - vm) / (2 * eps)
        np.testing.assert_allclose(J, fd, rtol=1e-4, atol=1e-6)


def test_fixed_size_rows_multi_pair():
    """max_num_cnt caps rows at the worst link pairs; values are the
    per-link-pair worst member errors."""
    scene = _boxbot_scene(n_obstacles=3)
    prob = Problem()
    from trajopt_tpu.ifopt import VariableSet
    vs = prob.add_variable_set(VariableSet("q", np.array([0.4, 0.0])))
    full = DiscreteCollisionConstraint(scene, vs.var(), margin=0.1,
                                       coeff=20.0, max_num_cnt=None)
    assert full.rows == 3
    capped = DiscreteCollisionConstraint(scene, vs.var(), margin=0.1,
                                         coeff=20.0, max_num_cnt=2)
    assert capped.rows == 2
    vf = np.sort(np.asarray(full.values(_reader(prob, vs.init))))[::-1]
    vc = np.sort(np.asarray(capped.values(_reader(prob, vs.init))))[::-1]
    np.testing.assert_allclose(vc, vf[:2], atol=1e-12)
    J = np.asarray(capped.jacobian(_reader(prob, vs.init)))
    assert J.shape == (2, 2)
    assert np.any(J != 0.0)


def test_facade_cast_problem_end_to_end():
    """The box_cast scenario through the facade: straight-line init sweeps
    THROUGH the obstacle between steps; the continuous collision
    constraints must push the path around it (cast_cost_unit.cpp:60-118
    assembled via the component model)."""
    scene = _boxbot_scene()
    n_steps = 3
    init = np.array([[-1.9, 0.0], [0.0, 0.0], [1.9, 0.0]])
    prob, nv = _trajectory_problem(scene, n_steps, init, lvs_substeps=3)
    # pin endpoints (the fixed_timesteps role)
    ends = FunctionalConstraint(
        4, "endpoints",
        lambda v: jnp.concatenate([
            v["trajectory"].reshape(n_steps, 2)[0] - jnp.asarray([-1.9, 0.0]),
            v["trajectory"].reshape(n_steps, 2)[-1] - jnp.asarray([1.9, 0.0]),
        ]))
    prob.add_constraint_set(ends)
    res, values = prob.solve(SQPParams())
    assert int(res.status) == SQPStatus.CONVERGED
    traj = values["trajectory"].reshape(n_steps, 2)
    np.testing.assert_allclose(traj[0], [-1.9, 0.0], atol=1e-6)
    np.testing.assert_allclose(traj[2], [1.9, 0.0], atol=1e-6)
    # dense interpolated swept check (the checkTrajectory role)
    for g in range(n_steps - 1):
        for k in range(41):
            f = k / 40.0
            q = traj[g] + f * (traj[g + 1] - traj[g])
            assert float(jnp.min(scene.distances(jnp.asarray(q)))) > -1e-4, \
                (g, k, traj)


def test_weighted_average_jacobian_hand_formula():
    """Multi-member link pair: the row jacobian equals the hand-computed
    error-weighted average of member gradients
    (weighted_average_methods.cpp:31-108)."""
    tree = boxbot()
    scene = CollisionScene(tree)
    # two geoms on the same link -> 2 members in one link pair
    scene.add_link_sphere("boxbot_link", 0.25)
    scene.add_link_sphere("boxbot_link", 0.15, center=[0.3, 0.0, 0.0],
                          name="boxbot_link_sphere2")
    scene.add_world_box("obstacle", [0.5, 0.5, 0.5], [0.0, 0.0, 0.0])
    prob = Problem()
    from trajopt_tpu.ifopt import VariableSet
    vs = prob.add_variable_set(VariableSet("q", np.array([0.9, 0.4])))
    cs = DiscreteCollisionConstraint(scene, vs.var(), margin=0.6, coeff=2.0,
                                     safety_margin_buffer=0.05)
    assert cs.rows == 1
    q = jnp.asarray(vs.init)
    d, J = scene.distances_and_jac(q)
    d = np.asarray(d)
    J = np.asarray(J)
    err = 2.0 * (0.6 - d)
    w = np.maximum(err + 2.0 * 0.05, 0.0)
    expect_val = err.max()
    expect_jac = (w[:, None] * (-2.0 * J)).sum(0) / w.sum()
    np.testing.assert_allclose(
        np.asarray(cs.values(_reader(prob, vs.init))), [expect_val],
        atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(cs.jacobian(_reader(prob, vs.init)))[0], expect_jac,
        atol=1e-10)
