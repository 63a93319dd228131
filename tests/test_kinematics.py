"""Kinematics tests: analytic FK, geometric Jacobian vs autodiff, rotation
log robustness, and Cartesian-term optimization (numerical IK +
cart-position), mirroring trajopt/test/kinematic_costs_unit.cpp,
numerical_ik_unit.cpp, and cart_position_optimization_unit.cpp.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.kinematics.chain import build_tree
from trajopt_tpu.kinematics.transforms import (
    axis_angle_matrix, rotvec_from_matrix, rpy_matrix, transform_error)
from trajopt_tpu.kinematics.urdf import load_urdf
from trajopt_tpu.problem.trajectory import (
    TrajOptProblem, interpolated_init, stationary_init)
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.cartesian import avoid_singularity, cart_pose, cart_vel
from trajopt_tpu.terms.joint import joint_vel

DATA = os.path.join(os.path.dirname(__file__), "..", "trajopt_tpu", "data")
RRBOT = build_tree(load_urdf(os.path.join(DATA, "rrbot.urdf")))
BOXBOT = build_tree(load_urdf(os.path.join(DATA, "boxbot.urdf")))


def rr_fk(q0, q1):
    return np.array([np.cos(q0) + 0.8 * np.cos(q0 + q1),
                     np.sin(q0) + 0.8 * np.sin(q0 + q1),
                     0.6])


def test_fk_matches_analytic_rr():
    for q in [(0.0, 0.0), (0.3, -0.5), (1.2, 2.0), (-2.5, 0.7)]:
        R, p = RRBOT.fk(jnp.asarray(q))
        ee = RRBOT.link_id("ee_link")
        np.testing.assert_allclose(p[ee], rr_fk(*q), atol=1e-12)
        np.testing.assert_allclose(R[ee], rpy_matrix(np.array([0, 0, q[0] + q[1]])),
                                   atol=1e-12)


def test_fk_prismatic_boxbot():
    R, p = BOXBOT.fk(jnp.array([1.5, -2.0]))
    np.testing.assert_allclose(p[BOXBOT.link_id("boxbot_link")],
                               [1.5, -2.0, 0.0], atol=1e-12)


def test_geometric_jacobian_matches_autodiff():
    rng = np.random.default_rng(1)
    for tree, link in [(RRBOT, "ee_link"), (RRBOT, "link_2"),
                       (BOXBOT, "boxbot_link")]:
        lid = tree.link_id(link)
        for _ in range(3):
            q = jnp.asarray(rng.uniform(-2, 2, tree.n_dof))
            J = tree.jacobian(q, link)
            Jp_ad = jax.jacfwd(lambda v: tree.fk(v)[1][lid])(q)
            np.testing.assert_allclose(J[:3], Jp_ad, atol=1e-10)
            # angular part: dR R^T = [w]_x per column
            JR = jax.jacfwd(lambda v: tree.fk(v)[0][lid])(q)
            R, _ = tree.fk(q)
            for j in range(tree.n_dof):
                W = JR[:, :, j] @ R[lid].T
                w = jnp.array([W[2, 1], W[0, 2], W[1, 0]])
                np.testing.assert_allclose(J[3:, j], w, atol=1e-10)


def test_rotvec_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(20):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        for angle in [1e-9, 1e-6, 0.5, 2.0, np.pi - 1e-7, np.pi]:
            R = axis_angle_matrix(jnp.asarray(axis), angle)
            rv = np.asarray(rotvec_from_matrix(R))
            got_angle = np.linalg.norm(rv)
            np.testing.assert_allclose(got_angle, angle, atol=1e-6)
            if angle > 1e-6:
                # axis may flip at exactly pi
                d = min(np.linalg.norm(rv / got_angle - axis),
                        np.linalg.norm(rv / got_angle + axis))
                tol = 1e-6 if angle < np.pi - 1e-6 else 1e-3
                assert d < tol


def test_transform_error_zero_when_equal():
    R = axis_angle_matrix(jnp.array([0.0, 0.0, 1.0]), 0.7)
    p = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(transform_error(R, p, R, p), 0.0, atol=1e-12)


def test_numerical_ik_solve():
    """One-step problem: cart_pose EQ constraint drives rrbot to a target
    (numerical_ik_unit.cpp analog)."""
    target_q = np.array([0.8, -0.6])
    target_p = rr_fk(*target_q)
    prob = TrajOptProblem(n_steps=1, n_dof=2, joint_lower=RRBOT.lower,
                          joint_upper=RRBOT.upper)
    prob.add_term(cart_pose(RRBOT, "ee_link", 1, 0, is_cost=False,
                            target=target_p, indices=[0, 1, 2]))
    res = prob.make_solve()(stationary_init(jnp.array([0.1, 0.1]), 1))
    assert int(res.status) == SQPStatus.CONVERGED
    R, p = RRBOT.fk(res.x.reshape(2))
    np.testing.assert_allclose(p[RRBOT.link_id("ee_link")], target_p, atol=1e-4)


def test_cart_position_optimization():
    """10-step trajectory, start fixed, final pose constrained
    (cart_position_optimization_unit.cpp analog)."""
    n = 10
    start = np.array([0.0, 0.5])
    goal_q = np.array([1.0, -0.4])
    goal_p = rr_fk(*goal_q)
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=RRBOT.lower,
                          joint_upper=RRBOT.upper, fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(cart_pose(RRBOT, "ee_link", n, n - 1, is_cost=False,
                            target=goal_p, indices=[0, 1, 2]))
    res = prob.make_solve()(stationary_init(jnp.asarray(start), n))
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(n, 2)
    np.testing.assert_allclose(traj[0], start, atol=1e-8)
    _, p = RRBOT.fk(jnp.asarray(traj[-1]))
    np.testing.assert_allclose(p[RRBOT.link_id("ee_link")], goal_p, atol=1e-4)


def test_cart_pose_cost_abs_pulls_toward_target():
    target_q = np.array([-0.3, 0.9])
    target_p = rr_fk(*target_q)
    prob = TrajOptProblem(n_steps=1, n_dof=2, joint_lower=RRBOT.lower,
                          joint_upper=RRBOT.upper)
    prob.add_term(cart_pose(RRBOT, "ee_link", 1, 0, is_cost=True,
                            target=target_p, indices=[0, 1, 2],
                            coeffs=[10.0, 10.0, 10.0]))
    res = prob.make_solve()(stationary_init(jnp.array([0.0, 0.5]), 1))
    assert int(res.status) == SQPStatus.CONVERGED
    _, p = RRBOT.fk(res.x.reshape(2))
    np.testing.assert_allclose(p[RRBOT.link_id("ee_link")], target_p, atol=1e-3)


def test_cart_vel_limit():
    n = 9  # 8 gaps x 0.3 > the 1.74 per-axis ee travel: feasible
    goal_q = np.array([1.2, 0.3])
    goal_p = rr_fk(*goal_q)
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=RRBOT.lower,
                          joint_upper=RRBOT.upper, fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(cart_pose(RRBOT, "ee_link", n, n - 1, is_cost=False,
                            target=goal_p, indices=[0, 1, 2]))
    prob.add_term(cart_vel(RRBOT, "ee_link", n, max_displacement=0.3))
    res = prob.make_solve()(stationary_init(jnp.array([0.0, 0.0]), n))
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(n, 2)
    ps = np.stack([np.asarray(RRBOT.fk(jnp.asarray(q))[1][RRBOT.link_id("ee_link")])
                   for q in traj])
    disp = np.linalg.norm(np.diff(ps, axis=0), axis=1)
    assert np.all(np.abs(np.diff(ps, axis=0)) <= 0.3 + 1e-3)


def test_avoid_singularity_cost_improves_sigma_min():
    # A short-link arm has nearly-parallel Jacobian columns near q1=0
    # (sigma_min < 0.1 activates the hinge threshold of
    # AvoidSingularityErrCalculator); the cost should push sigma_min up.
    from trajopt_tpu.kinematics.urdf import parse_urdf
    tiny = parse_urdf("""
    <robot name="tiny_rr">
      <link name="base"/><link name="l1"/><link name="l2"/><link name="tip"/>
      <joint name="j1" type="revolute"><parent link="base"/><child link="l1"/>
        <axis xyz="0 0 1"/><limit lower="-3.14" upper="3.14"/></joint>
      <joint name="j2" type="revolute"><parent link="l1"/><child link="l2"/>
        <origin xyz="0.05 0 0"/><axis xyz="0 0 1"/>
        <limit lower="-3.14" upper="3.14"/></joint>
      <joint name="jt" type="fixed"><parent link="l2"/><child link="tip"/>
        <origin xyz="0.05 0 0"/></joint>
    </robot>""")
    tree = build_tree(tiny)
    n = 1
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=tree.lower,
                          joint_upper=tree.upper)
    prob.add_term(avoid_singularity(tree, "tip", n, coeff=5.0))
    q0 = jnp.array([0.5, 0.02])

    def smin(q):
        return float(jnp.linalg.svd(tree.jacobian(q, "tip"),
                                    compute_uv=False)[-1])

    assert smin(q0) < 0.1  # hinge active at the start
    res = prob.make_solve()(stationary_init(q0, n))
    assert smin(res.x.reshape(2)) > smin(q0)


def test_fk_consts_first_built_inside_trace():
    """Regression: the scan-form FK's cached constants must be host-side
    numpy even when fk() is FIRST invoked inside a jit trace (jnp ops would
    be staged there and np.stack over tracers raised
    TracerArrayConversionError — seen via TrajOptProblem._validate_terms's
    eval_shape on the pr2ish cast term)."""
    from trajopt_tpu.models.robots import pr2ish

    tree = pr2ish()
    assert len(tree.joints) >= 10  # uses the scan path
    # fresh instance so no cache is populated by other tests
    tree = build_tree(load_urdf(os.path.join(
        os.path.dirname(pr2ish.__wrapped__.__code__.co_filename),
        "..", "data", "pr2ish.urdf")))
    q = jnp.zeros(tree.n_dof)
    R_t, p_t = jax.jit(tree.fk)(q)  # first call: inside trace
    tree2 = build_tree(load_urdf(os.path.join(
        os.path.dirname(pr2ish.__wrapped__.__code__.co_filename),
        "..", "data", "pr2ish.urdf")))
    R_e, p_e = tree2.fk(q)          # eager reference
    np.testing.assert_allclose(np.asarray(R_t), np.asarray(R_e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_t), np.asarray(p_e), atol=1e-6)
