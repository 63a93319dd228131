"""ifopt-style OO component model facade (trajopt_tpu.ifopt).

Mirrors the reference new-stack tests: variable sets / Var handles
(variable_sets_unit.cpp), cost wrappers (cost_wrappers_unit.cpp), and a
numerical-IK-style end-to-end solve (trajopt_sqp/test/numerical_ik_unit.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu import ifopt as ifo
from trajopt_tpu.sqp.params import SQPParams, SQPStatus


def test_variable_sets_and_var_handles():
    p = ifo.Problem()
    a = p.add_variable_set(ifo.VariableSet("a", np.array([1.0, 2.0]),
                                           lower=-5.0, upper=5.0))
    b = p.add_variable_set(ifo.VariableSet("b", np.array([3.0])))
    assert p.n == 3
    assert a.var().start == 0 and b.var().start == 2
    with pytest.raises(ValueError):
        p.add_variable_set(ifo.VariableSet("a", np.zeros(1)))
    x0 = p.initial_values()
    np.testing.assert_allclose(x0, [1.0, 2.0, 3.0])
    lo, hi = p.bounds()
    np.testing.assert_allclose(lo, [-5.0, -5.0, -np.inf])


def test_nodes_variables_trajectory_layout():
    nodes = []
    for _ in range(4):
        nd = ifo.Node()
        nd.add_var("q", 2)
        nd.add_var("dt", 1)
        nodes.append(nd)
    nv = ifo.NodesVariables("traj", nodes, init=np.arange(12, dtype=float))
    p = ifo.Problem()
    p.add_variable_set(nv)
    v = nv.node_var(2, "dt")
    assert (v.start, v.size) == (8, 1)
    with pytest.raises(KeyError):
        nv.node_var(0, "nope")
    # Var.value slices the flat vector
    x = jnp.arange(12.0)
    np.testing.assert_allclose(np.asarray(v.value(x)), [8.0])


class _Target(ifo.ConstraintSet):
    """x - target == 0 (equality rows)."""

    def __init__(self, vs, target):
        super().__init__(rows=len(target), name="target",
                         bounds=[ifo.Bounds.equality(t) for t in target])
        self._vs = vs

    def values(self, vars):  # noqa: A002
        return vars[self._vs.name]


def test_equality_constraint_lowering_and_solve():
    p = ifo.Problem()
    vs = p.add_variable_set(ifo.VariableSet("x", np.zeros(3)))
    p.add_constraint_set(_Target(vs, [1.0, -2.0, 0.5]))
    # quadratic cost pulls elsewhere; constraint must win
    p.add_cost_set(ifo.SquaredCost(
        ifo.FunctionalConstraint(3, "origin", lambda v: v["x"],
                                 ifo.Bounds.equality(0.0)), weights=1.0))
    res, values = p.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(values["x"], [1.0, -2.0, 0.5], atol=1e-4)


def test_inequality_bounds_lowering():
    p = ifo.Problem()
    p.add_variable_set(ifo.VariableSet("x", np.array([3.0, -3.0])))
    # -1 <= x_i <= 1 via a ConstraintSet (not var bounds)
    p.add_constraint_set(ifo.FunctionalConstraint(
        2, "box", lambda v: v["x"], ifo.Bounds(-1.0, 1.0)))
    p.add_cost_set(ifo.SquaredCost(
        ifo.FunctionalConstraint(
            2, "pull", lambda v: v["x"] - jnp.asarray([5.0, -5.0]),
            ifo.Bounds.equality(0.0))))
    res, values = p.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(values["x"], [1.0, -1.0], atol=1e-4)


def test_cost_wrappers_values():
    """SquaredCost / AbsoluteCost compute sum w_i e_i^p of bounds errors
    (costs/squared_cost.cpp:31-38)."""
    cs = ifo.FunctionalConstraint(3, "c", lambda v: v["x"],
                                  ifo.Bounds(-1.0, 1.0))
    e = cs.bounds_errors(jnp.asarray([0.5, 2.0, -3.0]))
    np.testing.assert_allclose(np.asarray(e), [0.0, 1.0, -2.0])
    sq = ifo.SquaredCost(cs, weights=[1.0, 2.0, 3.0])
    np.testing.assert_allclose(sq.weights, [1.0, 2.0, 3.0])
    ab = ifo.AbsoluteCost(cs, weights=-2.0)  # weights taken |.|
    np.testing.assert_allclose(ab.weights, [2.0, 2.0, 2.0])


def test_absolute_cost_drives_solution():
    p = ifo.Problem()
    p.add_variable_set(ifo.VariableSet("x", np.array([4.0])))
    p.add_cost_set(ifo.AbsoluteCost(
        ifo.FunctionalConstraint(1, "t", lambda v: v["x"] - 1.5,
                                 ifo.Bounds.equality(0.0))))
    res, values = p.solve()
    np.testing.assert_allclose(values["x"], [1.5], atol=1e-3)


def test_numerical_ik_style_end_to_end():
    """Facade version of numerical_ik_unit: find joints whose FK pose hits a
    target, one-step trajectory, joint limits as variable bounds."""
    from trajopt_tpu.models.benchmarks import ARM7_HOME
    from trajopt_tpu.models.robots import arm7

    tree = arm7()
    target = np.asarray([0.35, 0.25, 0.55])

    p = ifo.Problem()
    vs = p.add_variable_set(ifo.VariableSet(
        "q", np.asarray(ARM7_HOME), lower=tree.lower, upper=tree.upper))

    class IK(ifo.ConstraintSet):
        def __init__(self):
            super().__init__(rows=3, name="ik",
                             bounds=[ifo.Bounds.equality(t) for t in target])

        def values(self, vars):  # noqa: A002
            q = vars["q"]
            _, p = tree.fk(q)
            return p[-1]

    p.add_constraint_set(IK())
    p.add_cost_set(ifo.SquaredCost(
        ifo.FunctionalConstraint(
            7, "posture", lambda v: v["q"] - jnp.asarray(ARM7_HOME),
            ifo.Bounds.equality(0.0)), weights=0.01))
    res, values = p.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    pos = np.asarray(tree.fk(jnp.asarray(values["q"]))[1][-1])
    np.testing.assert_allclose(pos, target, atol=1e-3)
