"""Typed facade constraint classes (trajopt_tpu/ifopt/constraints.py):
value/Jacobian formula checks against the reference semantics
(trajopt_ifopt/src/constraints/*.cpp) and one facade-built SOLVE per
class."""

import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu import ifopt as ifo
from trajopt_tpu.kinematics.transforms import transform_error
from trajopt_tpu.models.robots import arm6, rrbot
from trajopt_tpu.sqp.params import SQPParams, SQPStatus


def _traj_problem(n_nodes, n_dof, init):
    """Problem with one trajectory variable set of per-node q Vars."""
    p = ifo.Problem()
    nodes = []
    for _ in range(n_nodes):
        nd = ifo.Node()
        nd.add_var("q", n_dof)
        nodes.append(nd)
    nv = p.add_variable_set(ifo.NodesVariables(
        "traj", nodes, init=np.asarray(init, float).reshape(-1)))
    pvars = [nv.node_var(t, "q") for t in range(n_nodes)]
    return p, nv, pvars


def test_joint_pos_constraint_solve():
    tgt = np.array([0.3, -0.7])
    p, nv, pvars = _traj_problem(3, 2, np.zeros(6))
    p.add_constraint_set(ifo.JointPosConstraint(tgt, pvars))
    res, values = p.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(values["traj"].reshape(3, 2),
                               np.tile(tgt, (3, 1)), atol=1e-5)


def test_joint_vel_values_and_solve():
    # values formula: v_seg = q_{seg+1} - q_seg, scaled by coeffs
    p, nv, pvars = _traj_problem(4, 2, np.arange(8.0))
    c = ifo.JointVelConstraint(np.zeros(2), pvars, coeffs=2.0)
    x = jnp.arange(8.0)
    v = np.asarray(c.values(ifo._VarReader(x, {"traj": nv})))
    np.testing.assert_allclose(v, np.full(6, 4.0))  # (q1-q0)=2 * coeff 2

    # solve: fixed endpoints + velocity target spreads motion evenly
    p2, nv2, pv2 = _traj_problem(4, 1, [0.0, 0.1, 0.2, 0.9])
    p2.add_constraint_set(ifo.JointPosConstraint([0.0], [pv2[0]],
                                                 name="start"))
    p2.add_constraint_set(ifo.JointPosConstraint([0.9], [pv2[-1]],
                                                 name="end"))
    p2.add_cost_set(ifo.SquaredCost(
        ifo.JointVelConstraint([0.0], pv2), weights=1.0))
    res, values = p2.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(values["traj"], [0.0, 0.3, 0.6, 0.9],
                               atol=1e-4)


def test_joint_accel_reference_formula():
    """Forward rows + the reference's backward tail rows
    (joint_acceleration_constraint.cpp getValues)."""
    n, d = 5, 1
    q = np.array([0.0, 1.0, 4.0, 9.0, 16.0])  # q_t = t^2 -> accel 2
    p, nv, pvars = _traj_problem(n, d, q)
    c = ifo.JointAccelConstraint(np.zeros(1), pvars)
    v = np.asarray(c.values(ifo._VarReader(jnp.asarray(q), {"traj": nv})))
    expect = np.array([
        q[2] - 2 * q[1] + q[0],
        q[3] - 2 * q[2] + q[1],
        q[4] - 2 * q[3] + q[2],
        q[1] - 2 * q[2] + q[3],   # i = n-2 backward
        q[2] - 2 * q[3] + q[4],   # i = n-1 backward
    ])
    np.testing.assert_allclose(v, expect)
    assert c.rows == n * d

    # solve: zero-accel target on free middle nodes -> linear ramp
    p2, nv2, pv2 = _traj_problem(5, 1, [0.0, 0.3, 0.1, 0.9, 2.0])
    p2.add_constraint_set(ifo.JointPosConstraint([0.0], [pv2[0]],
                                                 name="start"))
    p2.add_constraint_set(ifo.JointPosConstraint([2.0], [pv2[-1]],
                                                 name="end"))
    p2.add_cost_set(ifo.SquaredCost(
        ifo.JointAccelConstraint([0.0], pv2), weights=1.0))
    res, values = p2.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(values["traj"], [0.0, 0.5, 1.0, 1.5, 2.0],
                               atol=1e-3)


def test_joint_jerk_reference_formula():
    n = 6
    q = np.arange(6.0) ** 3  # cubic -> jerk 6
    p, nv, pvars = _traj_problem(n, 1, q)
    c = ifo.JointJerkConstraint(np.zeros(1), pvars)
    v = np.asarray(c.values(ifo._VarReader(jnp.asarray(q), {"traj": nv})))
    fwd = [-q[i] + 3 * q[i + 1] - 3 * q[i + 2] + q[i + 3]
           for i in range(n - 3)]
    tail = [q[i] - 3 * q[i - 1] + 3 * q[i - 2] - q[i - 3]
            for i in range(n - 3, n)]
    np.testing.assert_allclose(v, fwd + tail)
    np.testing.assert_allclose(v[:n - 3], 6.0)

    # solve smoke: jerk-squared cost + endpoints stays feasible
    p2, nv2, pv2 = _traj_problem(6, 1, np.linspace(0, 1, 6))
    p2.add_constraint_set(ifo.JointPosConstraint([0.0], [pv2[0]],
                                                 name="start"))
    p2.add_constraint_set(ifo.JointPosConstraint([1.0], [pv2[-1]],
                                                 name="end"))
    p2.add_cost_set(ifo.SquaredCost(
        ifo.JointJerkConstraint([0.0], pv2), weights=1.0))
    res, values = p2.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(values["traj"][0], 0.0, atol=1e-5)
    np.testing.assert_allclose(values["traj"][-1], 1.0, atol=1e-5)


def test_coeff_validation_matches_reference():
    p, nv, pvars = _traj_problem(3, 2, np.zeros(6))
    with pytest.raises(ValueError):
        ifo.JointVelConstraint(np.zeros(2), pvars, coeffs=-1.0)
    with pytest.raises(ValueError):
        ifo.JointVelConstraint(np.zeros(2), pvars, coeffs=[1.0, 2.0, 3.0])
    with pytest.raises(ValueError):
        ifo.JointVelConstraint(np.zeros(2), [pvars[0]])  # needs >= 2 vars
    # reference default coeff for velocity is 5
    c = ifo.JointVelConstraint(np.zeros(2), pvars)
    np.testing.assert_allclose(c.coeffs, 5.0)


def test_cart_pos_constraint_solve():
    tree = rrbot()
    # target = FK at a known configuration
    q_tgt = jnp.asarray([0.6, -0.4])
    R, p_ = tree.fk(q_tgt)
    ee = tree.n_links - 1
    target = (np.asarray(R[ee]), np.asarray(p_[ee]))

    prob = ifo.Problem()
    vs = prob.add_variable_set(ifo.VariableSet("q", np.array([0.1, 0.1])))
    link_name = tree.link_names[ee]
    cs = prob.add_constraint_set(ifo.CartPosConstraint(
        tree, link_name, vs.var(), target))
    assert cs.rows == 6
    res, values = prob.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    Rs, ps = tree.fk(jnp.asarray(values["q"]))
    err = transform_error(jnp.asarray(target[0]), jnp.asarray(target[1]),
                          Rs[ee], ps[ee])
    assert float(jnp.max(jnp.abs(err))) < 1e-4


def test_cart_pos_indices_and_coeffs():
    tree = rrbot()
    ee = tree.n_links - 1
    link_name = tree.link_names[ee]
    vs_var = ifo.Var(0, 2, "q")
    cs = ifo.CartPosConstraint(tree, link_name, vs_var,
                               (np.eye(3), np.zeros(3)),
                               indices=[0, 1, 2], coeffs=[2.0, 2.0, 2.0])
    assert cs.rows == 3
    x = jnp.asarray([0.3, 0.2])
    v = np.asarray(cs.values(ifo._VarReader(x, {})))
    R, p_ = tree.fk(x)
    e6 = transform_error(jnp.eye(3), jnp.zeros(3), R[ee], p_[ee])
    np.testing.assert_allclose(v, 2.0 * np.asarray(e6)[:3], atol=1e-12)


def test_cart_line_constraint_solve():
    tree = rrbot()
    ee = tree.n_links - 1
    link_name = tree.link_names[ee]
    # line through two reachable FK positions (identity orientation is
    # not reachable for the planar arm, so constrain position rows only)
    Ra, pa = tree.fk(jnp.asarray([0.4, -0.2]))
    Rb, pb = tree.fk(jnp.asarray([0.9, -0.5]))
    start = (np.asarray(Ra[ee]), np.asarray(pa[ee]))
    end = (np.asarray(Rb[ee]), np.asarray(pb[ee]))

    prob = ifo.Problem()
    vs = prob.add_variable_set(ifo.VariableSet("q", np.array([0.6, -0.3])))
    prob.add_constraint_set(ifo.CartLineConstraint(
        tree, link_name, vs.var(), start, end, indices=[0, 1, 2]))
    res, values = prob.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    # the solution's ee position lies on the segment (within tol)
    Rs, ps = tree.fk(jnp.asarray(values["q"]))
    p_sol = np.asarray(ps[ee])
    ab = end[1] - start[1]
    t = np.clip(np.dot(p_sol - start[1], ab) / np.dot(ab, ab), 0, 1)
    assert np.linalg.norm(p_sol - (start[1] + t * ab)) < 1e-3


def test_inverse_kinematics_constraint_solve():
    tree = arm6()
    ee = tree.n_links - 1
    link_name = tree.link_names[ee]
    q_true = jnp.asarray([0.3, -0.5, 0.4, 0.2, -0.3, 0.1])
    R, p_ = tree.fk(q_true)
    target = (np.asarray(R[ee]), np.asarray(p_[ee]))

    prob = ifo.Problem()
    vs = prob.add_variable_set(ifo.VariableSet("q", np.zeros(6)))
    cs = prob.add_constraint_set(ifo.InverseKinematicsConstraint(
        tree, link_name, vs.var(), target, q_seed=np.full(6, 0.1)))
    res, values = prob.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    # the solve lands on the IK solution, whose FK matches the target
    Rs, ps = tree.fk(jnp.asarray(values["q"]))
    assert float(jnp.linalg.norm(ps[ee] - jnp.asarray(target[1]))) < 1e-3
