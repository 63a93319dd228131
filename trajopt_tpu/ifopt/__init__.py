"""ifopt-style object-oriented component model over the functional core.

Mirrors the reference's new-stack NLP component model — the vendored ifopt
fork in ``trajopt_ifopt/core`` (``Component``/``Variables``/
``ConstraintSet``/``CostTerm``/``Problem``, ``core/problem.h:96``) and its
variable sets (``Var``/``Node``/``NodesVariables``,
``variable_sets/var.h:52-92``, ``node.h:50``, ``nodes_variables.h:46``) —
as a thin facade that *lowers* to :class:`trajopt_tpu.sqp.nlp.Nlp` term
sets.  The reference's ``Composite`` aggregation machinery does not exist:
:class:`Problem` aggregates directly and the SQP consumes flat arrays.

Semantics kept from the reference:

* A ``ConstraintSet`` exposes rows with per-row interval ``Bounds``
  (kEquality / BoundSmallerZero / BoundGreaterZero / NoBound as in
  ``core/bounds.h``); lowering turns equality rows into CNT_EQ residuals
  and finite interval sides into CNT_INEQ rows.
* ``SquaredCost`` / ``AbsoluteCost`` wrap a constraint set into a cost on
  its *bounds violation* with per-row weights, exactly like
  ``costs/squared_cost.cpp`` (cost = sum_i w_i e_i^2 with
  e = calcBoundsErrors) and ``costs/absolute_cost.cpp``.
* ``Problem`` stacks variable sets in insertion order; components read
  variable values by set name / Var handle.

TPU-native differences: values/Jacobians are pure jax functions of the
flat decision vector (Jacobians via jacrev unless an analytic
``jacobian`` is provided), bounds are static numpy, everything lowers to
static-shaped term sets solved by the batched trust-region SQP.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.sqp.nlp import Kind, Nlp, TermSet
from trajopt_tpu.sqp.params import SQPParams
from trajopt_tpu.sqp.solver import make_solver

__all__ = [
    "Bounds", "BoundsEquality", "BoundSmallerZero", "BoundGreaterZero",
    "NoBound", "Var", "Node", "NodesVariables", "VariableSet",
    "ConstraintSet", "CostTerm", "SquaredCost", "AbsoluteCost", "Problem",
    "DiscreteCollisionConstraint", "ContinuousCollisionConstraint",
    "JointPosConstraint", "JointVelConstraint", "JointAccelConstraint",
    "JointJerkConstraint", "CartPosConstraint", "CartLineConstraint",
    "InverseKinematicsConstraint",
]


@dataclasses.dataclass(frozen=True)
class Bounds:
    """Per-row interval bound (core/bounds.h)."""

    lower: float = -np.inf
    upper: float = np.inf

    @staticmethod
    def equality(v: float) -> "Bounds":
        return Bounds(v, v)


BoundsEquality = Bounds(0.0, 0.0)
BoundSmallerZero = Bounds(-np.inf, 0.0)
BoundGreaterZero = Bounds(0.0, np.inf)
NoBound = Bounds(-np.inf, np.inf)


@dataclasses.dataclass(frozen=True)
class Var:
    """A contiguous block of decision variables with a global start index
    (variable_sets/var.h:52-92)."""

    start: int
    size: int
    name: str = ""

    def value(self, x: jax.Array) -> jax.Array:
        return jax.lax.dynamic_slice_in_dim(x, self.start, self.size)


class Node:
    """One timestep owning named Vars (variable_sets/node.h:50)."""

    def __init__(self, name: str = "node"):
        self.name = name
        self._specs: list[tuple[str, int]] = []

    def add_var(self, name: str, size: int) -> None:
        self._specs.append((name, size))

    @property
    def size(self) -> int:
        return sum(s for _, s in self._specs)


class VariableSet:
    """A named block of variables with bounds and initial values
    (ifopt ``Variables``)."""

    def __init__(self, name: str, init: np.ndarray,
                 lower: np.ndarray | float = -np.inf,
                 upper: np.ndarray | float = np.inf):
        self.name = name
        self.init = np.asarray(init, np.float64).reshape(-1)
        n = self.init.shape[0]
        self.lower = np.broadcast_to(np.asarray(lower, np.float64), (n,))
        self.upper = np.broadcast_to(np.asarray(upper, np.float64), (n,))
        self.start = 0  # assigned by Problem

    @property
    def size(self) -> int:
        return self.init.shape[0]

    def var(self) -> Var:
        return Var(self.start, self.size, self.name)


class NodesVariables(VariableSet):
    """Whole-trajectory variable set: one Node per timestep
    (variable_sets/nodes_variables.h:46-87)."""

    def __init__(self, name: str, nodes: Sequence[Node],
                 init: np.ndarray,
                 lower: np.ndarray | float = -np.inf,
                 upper: np.ndarray | float = np.inf):
        super().__init__(name, init, lower, upper)
        self.nodes = list(nodes)
        sizes = [nd.size for nd in self.nodes]
        if sum(sizes) != self.size:
            raise ValueError(
                f"nodes total {sum(sizes)} vars != init size {self.size}")
        self._offsets = np.concatenate([[0], np.cumsum(sizes)])

    def node_var(self, node_idx: int, var_name: str) -> Var:
        nd = self.nodes[node_idx]
        off = int(self._offsets[node_idx])
        for nm, sz in nd._specs:
            if nm == var_name:
                return Var(self.start + off, sz, f"{self.name}[{node_idx}].{nm}")
            off += sz
        raise KeyError(f"node {node_idx} has no var {var_name!r}")


class _VarReader:
    """Read-only view of the flat decision vector by set name / Var."""

    def __init__(self, x: jax.Array, sets: dict[str, VariableSet]):
        self._x = x
        self._sets = sets

    def get(self, key: "str | Var") -> jax.Array:
        if isinstance(key, Var):
            return key.value(self._x)
        vs = self._sets[key]
        return jax.lax.dynamic_slice_in_dim(self._x, vs.start, vs.size)

    __getitem__ = get

    @property
    def flat(self) -> jax.Array:
        return self._x


class ConstraintSet:
    """Rows g(x) with per-row interval bounds (core/constraint_set.h:92).

    Subclass and implement ``values(vars) -> [rows]``; optionally override
    ``jacobian(vars) -> [rows, n]`` (default: jax.jacrev of values).
    ``bounds`` may be one Bounds (broadcast) or a per-row list.
    """

    def __init__(self, rows: int, name: str,
                 bounds: "Bounds | Sequence[Bounds]" = BoundsEquality):
        self.rows = rows
        self.name = name
        if isinstance(bounds, Bounds):
            bounds = [bounds] * rows
        if len(bounds) != rows:
            raise ValueError(f"{name}: {len(bounds)} bounds for {rows} rows")
        self.lower = np.asarray([b.lower for b in bounds], np.float64)
        self.upper = np.asarray([b.upper for b in bounds], np.float64)

    def values(self, vars: _VarReader) -> jax.Array:  # noqa: A002
        raise NotImplementedError

    jacobian: Callable | None = None

    # -- reference utility: calcBoundsErrors (utils/ifopt_utils.h) --
    def bounds_errors(self, v: jax.Array) -> jax.Array:
        lo = jnp.asarray(self.lower, v.dtype)
        hi = jnp.asarray(self.upper, v.dtype)
        return jnp.maximum(v - hi, 0.0) + jnp.minimum(v - lo, 0.0)


class FunctionalConstraint(ConstraintSet):
    """ConstraintSet from a plain callable (UserDefined analog)."""

    def __init__(self, rows: int, name: str, fn: Callable,
                 bounds: "Bounds | Sequence[Bounds]" = BoundsEquality):
        super().__init__(rows, name, bounds)
        self._fn = fn

    def values(self, vars: _VarReader) -> jax.Array:  # noqa: A002
        return self._fn(vars)


class CostTerm:
    """Scalar cost component (core/cost_term.h)."""

    def __init__(self, name: str):
        self.name = name

    def cost(self, vars: _VarReader) -> jax.Array:  # noqa: A002
        raise NotImplementedError


class SquaredCost(CostTerm):
    """cost = sum_i w_i * e_i^2, e = bounds errors of the wrapped
    constraint (costs/squared_cost.cpp:31-38)."""

    def __init__(self, constraint: ConstraintSet,
                 weights: np.ndarray | float = 1.0):
        super().__init__(constraint.name + "_squared_cost")
        self.constraint = constraint
        self.weights = np.abs(np.broadcast_to(
            np.asarray(weights, np.float64), (constraint.rows,)))


class AbsoluteCost(CostTerm):
    """cost = sum_i w_i * |e_i| (costs/absolute_cost.cpp)."""

    def __init__(self, constraint: ConstraintSet,
                 weights: np.ndarray | float = 1.0):
        super().__init__(constraint.name + "_absolute_cost")
        self.constraint = constraint
        self.weights = np.abs(np.broadcast_to(
            np.asarray(weights, np.float64), (constraint.rows,)))


class Problem:
    """Stacks variable sets, sums costs, stacks constraint sets
    (core/problem.h:96); ``solve()`` lowers to the trust-region SQP."""

    def __init__(self):
        self._var_sets: list[VariableSet] = []
        self._by_name: dict[str, VariableSet] = {}
        self._cnt_sets: list[ConstraintSet] = []
        self._cost_sets: list[CostTerm] = []
        self._n = 0

    # -- construction --
    def add_variable_set(self, vs: VariableSet) -> VariableSet:
        if vs.name in self._by_name:
            raise ValueError(f"duplicate variable set {vs.name!r}")
        vs.start = self._n
        self._n += vs.size
        self._var_sets.append(vs)
        self._by_name[vs.name] = vs
        return vs

    def add_constraint_set(self, cs: ConstraintSet) -> ConstraintSet:
        self._cnt_sets.append(cs)
        return cs

    def add_cost_set(self, cost: CostTerm) -> CostTerm:
        self._cost_sets.append(cost)
        return cost

    @property
    def n(self) -> int:
        return self._n

    # -- lowering --
    def _reader_fn(self, f):
        sets = dict(self._by_name)

        def fn(x, params):
            return f(_VarReader(x, sets))

        return fn

    def _lower_constraint(self, cs: ConstraintSet) -> list[TermSet]:
        eq = (cs.lower == cs.upper)
        lo_fin = np.isfinite(cs.lower) & ~eq
        hi_fin = np.isfinite(cs.upper) & ~eq
        out: list[TermSet] = []

        def jac_rows(idx, sign=1.0):
            """Analytic-Jacobian row selection when the set provides one
            (e.g. the collision constraints' error-weighted-average
            gradients, which autodiff of values() would NOT reproduce —
            the reference pairs calcValues with a hand-built Jacobian the
            same way, discrete_collision_constraint.cpp:142-162)."""
            if cs.jacobian is None:
                return None

            def jf(v, cs=cs, idx=idx, sign=sign):
                return sign * jnp.take(cs.jacobian(v), jnp.asarray(idx),
                                       axis=0)

            return self._reader_fn(jf)

        if eq.any():
            idx = np.flatnonzero(eq)
            tgt = cs.lower[idx]

            def f_eq(v, cs=cs, idx=idx, tgt=tgt):
                return jnp.take(cs.values(v), jnp.asarray(idx)) - \
                    jnp.asarray(tgt, v.flat.dtype)

            out.append(TermSet(name=f"{cs.name}/eq", kind=Kind.CNT_EQ,
                               fn=self._reader_fn(f_eq), n_rows=int(eq.sum()),
                               jac_fn=jac_rows(idx)))
        if hi_fin.any():
            idx = np.flatnonzero(hi_fin)
            ub = cs.upper[idx]

            def f_hi(v, cs=cs, idx=idx, ub=ub):
                return jnp.take(cs.values(v), jnp.asarray(idx)) - \
                    jnp.asarray(ub, v.flat.dtype)

            out.append(TermSet(name=f"{cs.name}/ub", kind=Kind.CNT_INEQ,
                               fn=self._reader_fn(f_hi),
                               n_rows=int(hi_fin.sum()),
                               jac_fn=jac_rows(idx)))
        if lo_fin.any():
            idx = np.flatnonzero(lo_fin)
            lb = cs.lower[idx]

            def f_lo(v, cs=cs, idx=idx, lb=lb):
                return jnp.asarray(lb, v.flat.dtype) - \
                    jnp.take(cs.values(v), jnp.asarray(idx))

            out.append(TermSet(name=f"{cs.name}/lb", kind=Kind.CNT_INEQ,
                               fn=self._reader_fn(f_lo),
                               n_rows=int(lo_fin.sum()),
                               jac_fn=jac_rows(idx, sign=-1.0)))
        return out

    def _lower_cost(self, cost: CostTerm) -> TermSet:
        if isinstance(cost, (SquaredCost, AbsoluteCost)):
            cs = cost.constraint
            w = cost.weights

            def f_err(v, cs=cs):
                return cs.bounds_errors(cs.values(v))

            kind = (Kind.COST_SQ if isinstance(cost, SquaredCost)
                    else Kind.COST_ABS)
            return TermSet(name=cost.name, kind=kind,
                           fn=self._reader_fn(f_err), n_rows=cs.rows,
                           weight_fn=lambda p, w=w: jnp.asarray(w))
        return TermSet(name=cost.name, kind=Kind.COST_GENERIC_FULL,
                       fn=self._reader_fn(
                           lambda v, cost=cost: cost.cost(v)),
                       n_rows=1)

    def build(self) -> Nlp:
        terms: list[TermSet] = []
        for cost in self._cost_sets:
            terms.append(self._lower_cost(cost))
        for cs in self._cnt_sets:
            terms.extend(self._lower_constraint(cs))
        return Nlp(n=self._n, term_sets=tuple(terms))

    def initial_values(self) -> np.ndarray:
        return np.concatenate([vs.init for vs in self._var_sets]) \
            if self._var_sets else np.zeros(0)

    def bounds(self) -> tuple[np.ndarray, np.ndarray]:
        lo = np.concatenate([vs.lower for vs in self._var_sets]) \
            if self._var_sets else np.zeros(0)
        hi = np.concatenate([vs.upper for vs in self._var_sets]) \
            if self._var_sets else np.zeros(0)
        return lo, hi

    def solve(self, sqp: SQPParams = SQPParams(), x0=None, params=None,
              dtype=None):
        """Lower, solve, and return (result, values_by_set_name)."""
        nlp = self.build()
        solver = make_solver(nlp, sqp=sqp)
        x0 = self.initial_values() if x0 is None else np.asarray(x0)
        dtype = dtype or jnp.zeros(0).dtype
        lo, hi = self.bounds()
        res = solver(jnp.asarray(x0, dtype), jnp.asarray(lo, dtype),
                     jnp.asarray(hi, dtype), params or {})
        x = np.asarray(res.x)
        values = {vs.name: x[vs.start:vs.start + vs.size]
                  for vs in self._var_sets}
        return res, values


# Typed constraint sets import from this module, so they load last.
from trajopt_tpu.ifopt.collision import (  # noqa: E402
    ContinuousCollisionConstraint, DiscreteCollisionConstraint)
from trajopt_tpu.ifopt.constraints import (  # noqa: E402
    CartLineConstraint, CartPosConstraint, InverseKinematicsConstraint,
    JointAccelConstraint, JointJerkConstraint, JointPosConstraint,
    JointVelConstraint)
