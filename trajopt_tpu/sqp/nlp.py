"""Nonconvex problem model: term sets, convexification, exact evaluation.

This is the TPU-native analog of the reference's nonconvex modeling layer:
``sco::Cost`` / ``sco::Constraint`` with their ``value(x)`` / ``convex(x)``
interface (``trajopt_sco/include/trajopt_sco/modeling.hpp:27-267``) and the
function->term adapters ``CostFromFunc`` / ``CostFromErrFunc`` /
``ConstraintFromErrFunc`` (``trajopt_sco/src/modeling_utils.cpp``).

Differences by design (idiomatic JAX, not a port):

* A term is a pure function ``fn(x, params) -> residuals`` with a static row
  count.  Jacobians come from ``jax.jacrev``/``jax.jacfwd`` (exact, not the
  reference's forward finite differences with eps=1e-5), or a user-supplied
  analytic ``jac_fn``.
* Convexification produces flat arrays — a PSD quadratic (Gauss-Newton of
  the squared terms, exactly what ``AffExprs::square`` builds in
  ``trajopt_optimizers/trajopt_sqp/src/expressions.cpp``) plus linearized
  penalty/constraint rows — instead of pointer expression graphs.
* Hinge/abs penalties stay *rows with a penalty weight* (consumed by the
  prox-ADMM QP); no slack variables, so shapes are static under jit.

Generic scalar costs (non least-squares) use a PSD-projected second-order
Taylor model, matching ``CostFromFunc::convex`` with ``full_hessian``
(eigenvalue clamping, ``modeling_utils.cpp:77-90``) or the diagonal-Hessian
variant (``modeling_utils.cpp:57-72``).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Any  # pytree of per-problem data (batched under vmap)


class Kind(enum.Enum):
    """Term classification.

    COST_SQ / COST_ABS / COST_HINGE correspond to the reference's
    ``PenaltyType {SQUARED, ABS, HINGE}``
    (``trajopt_sco/include/trajopt_sco/modeling_utils.hpp:15-20``);
    CNT_EQ / CNT_INEQ to ``ConstraintType {EQ, INEQ}``;
    COST_GENERIC_* to ``CostFromFunc`` with full/diagonal Hessian.
    """

    COST_SQ = "cost_sq"
    COST_ABS = "cost_abs"
    COST_HINGE = "cost_hinge"
    COST_GENERIC_FULL = "cost_generic_full"
    COST_GENERIC_DIAG = "cost_generic_diag"
    CNT_EQ = "cnt_eq"
    CNT_INEQ = "cnt_ineq"


COST_KINDS = (Kind.COST_SQ, Kind.COST_ABS, Kind.COST_HINGE,
              Kind.COST_GENERIC_FULL, Kind.COST_GENERIC_DIAG)
CNT_KINDS = (Kind.CNT_EQ, Kind.CNT_INEQ)
PENALTY_COST_KINDS = (Kind.COST_ABS, Kind.COST_HINGE)


@dataclasses.dataclass(frozen=True)
class TermSet:
    """One named group of residual rows sharing a kind.

    Attributes:
      name: diagnostic name (mirrors Cost::name / Constraint::name).
      kind: how residuals are penalized / constrained.
      fn: pure function ``(x, params) -> residuals [n_rows]`` (scalar for
        generic costs).  Constraint residual conventions match the
        reference: CNT_EQ wants ``r == 0``; CNT_INEQ wants ``r <= 0``;
        COST_HINGE penalizes ``max(0, r)``.
      n_rows: static residual count (1 for generic costs).
      weight_fn: per-row cost weights (params -> [n_rows] or scalar);
        multiplies *squared/abs/hinge values* like the reference's coeffs
        (``CostFromErrFunc::value``, modeling_utils.cpp:146-168).
        Constraint violations are unweighted, as in the reference.
      jac_fn: optional analytic Jacobian ``(x, params) -> [n_rows, n]``.
      use_fwd: pick jacfwd over jacrev (better when n_rows >> n).
      linear: fn is affine in x (constant Jacobian) — the solver hoists the
        Jacobian out of the SQP loop (the reference precomputes these
        expressions once in the term constructors, trajectory_costs.cpp).
    """

    name: str
    kind: Kind
    fn: Callable[[jax.Array, Params], jax.Array]
    n_rows: int
    weight_fn: Callable[[Params], jax.Array] = lambda p: jnp.asarray(1.0)
    jac_fn: Callable[[jax.Array, Params], jax.Array] | None = None
    use_fwd: bool = False
    linear: bool = False
    # Structured-QP support: (x, params) -> W [n_rows, band_width] window
    # weights; row r covers columns band_starts[r] ... + band_width.
    # Set for step-local terms so the ADMM can avoid dense A streaming.
    banded_jac: Callable[[jax.Array, Params], jax.Array] | None = None
    band_starts: "np.ndarray | None" = None
    band_width: int = 0
    # Fused evaluators: return (residuals, jacobian/window-weights) from ONE
    # forward pass.  For terms whose primal is expensive (collision
    # narrowphase, FK chains) this halves convexification cost vs calling
    # fn + jac_fn separately.
    val_jac_fn: "Callable[[jax.Array, Params], tuple] | None" = None
    val_banded_jac: "Callable[[jax.Array, Params], tuple] | None" = None
    # Merit granularity (constraint sets only): row -> group id in
    # [0, n_groups).  The reference hatches one Constraint object per
    # step/gap (problem_description.cpp:1726-1770), so per-constraint
    # merit inflation (optimizers.cpp:947-959) and the cnt_tolerance
    # check operate per step; `groups` reproduces that granularity inside
    # one fused set: violations are summed per group, and each group
    # carries its own merit coefficient.  None -> one group (whole set).
    groups: "np.ndarray | None" = None
    n_groups: int = 1


@dataclasses.dataclass(frozen=True)
class Nlp:
    """A nonconvex problem over a flat decision vector of size ``n``.

    Analog of ``sco::OptProb`` (``modeling.hpp:190-267``): variables with box
    bounds, plus cost and constraint sets.  Bounds are passed at solve time
    (they are per-problem data, batchable under vmap).
    """

    n: int
    term_sets: tuple[TermSet, ...]
    # Optional (T, D) trajectory layout: x is T timesteps of D variables.
    # Enables the gather-free block-banded QP path (qp/block_banded.py)
    # when all banded row windows are step-aligned.
    block: "tuple[int, int] | None" = None

    @property
    def cost_sets(self) -> tuple[TermSet, ...]:
        return tuple(t for t in self.term_sets if t.kind in COST_KINDS)

    @property
    def cnt_sets(self) -> tuple[TermSet, ...]:
        return tuple(t for t in self.term_sets if t.kind in CNT_KINDS)

    @property
    def num_cost_sets(self) -> int:
        return len(self.cost_sets)

    @property
    def num_cnt_sets(self) -> int:
        return len(self.cnt_sets)


class ConvexModel(NamedTuple):
    """Convexified problem at a linearization point.

    Cost rows (squared + penalty) are stored as affine rows
    ``a(x) = A_cost x + b_cost``; the quadratic (P, q, c0) is derived from
    the squared + generic rows.  Constraint rows are affine
    ``g(x) ~ A_cnt x + b_cnt`` with interval bounds [l_cnt, u_cnt]
    (CNT_EQ -> [0,0], CNT_INEQ -> [-inf, 0]).
    """

    P: jax.Array        # [n, n] PSD (2x Gauss-Newton + generic Hessians)
    q: jax.Array        # [n]
    c0: jax.Array       # scalar constant of the quadratic cost model
    A_cost: jax.Array   # [m_cost, n] all non-generic cost rows
    b_cost: jax.Array   # [m_cost]
    w_cost: jax.Array   # [m_cost] per-row weights
    A_cnt: jax.Array    # [m_cnt, n]
    b_cnt: jax.Array    # [m_cnt]
    l_cnt: jax.Array    # [m_cnt]
    u_cnt: jax.Array    # [m_cnt]


def _residual_and_jac(term: TermSet, x: jax.Array, params: Params,
                      jac_cache: dict | None = None, key: int | None = None):
    if jac_cache is not None and key in jac_cache:
        return jnp.atleast_1d(jnp.asarray(term.fn(x, params))), jac_cache[key]
    if term.val_jac_fn is not None:
        # One forward pass produces both (the narrowphase/FK primal is the
        # expensive part; don't run it twice).
        r, J = term.val_jac_fn(x, params)
        return jnp.atleast_1d(jnp.asarray(r)), J
    if term.jac_fn is not None:
        return (jnp.atleast_1d(jnp.asarray(term.fn(x, params))),
                term.jac_fn(x, params))
    f = lambda v: jnp.atleast_1d(jnp.asarray(term.fn(v, params)))  # noqa: E731
    if term.use_fwd:
        # linearize shares the primal across the n forward tangents
        r, jvp_fn = jax.linearize(f, x)
        J = jax.vmap(jvp_fn, out_axes=1)(jnp.eye(x.shape[0], dtype=x.dtype))
    else:
        # vjp shares the primal across the n_rows reverse tangents
        r, vjp_fn = jax.vjp(f, x)
        J = jax.vmap(lambda e: vjp_fn(e)[0])(
            jnp.eye(r.shape[0], dtype=x.dtype))
    return r, J


def linear_jacobians(nlp: "Nlp", n: int, params: Params, dtype) -> dict:
    """Precompute constant Jacobians of affine term sets (hoisted out of
    the SQP loop by make_solver)."""
    cache = {}
    x0 = jnp.zeros((n,), dtype)
    for i, t in enumerate(nlp.term_sets):
        if t.linear and t.jac_fn is None:
            cache[i] = jax.jacrev(
                lambda v: jnp.atleast_1d(t.fn(v, params)))(x0)
    return cache


def _psd_project(H: jax.Array) -> jax.Array:
    """Clamp negative eigenvalues to zero (CostFromFunc full-Hessian path,
    modeling_utils.cpp:77-90)."""
    w, V = jnp.linalg.eigh(H)
    w = jnp.maximum(w, 0.0)
    return (V * w) @ V.T


def cost_row_structure(nlp: Nlp) -> list[tuple[TermSet, slice]]:
    """Static row slices of the stacked cost-row matrix, per non-generic set."""
    out, start = [], 0
    index_of = {id(t): i for i, t in enumerate(nlp.term_sets)}
    for t in nlp.cost_sets:
        if t.kind in (Kind.COST_GENERIC_FULL, Kind.COST_GENERIC_DIAG):
            continue
        out.append((t, slice(start, start + t.n_rows)))
        start += t.n_rows
    return out


def cnt_row_structure(nlp: Nlp) -> list[tuple[TermSet, slice]]:
    """Static row slices of the stacked constraint matrix, per cnt set."""
    out, start = [], 0
    for t in nlp.cnt_sets:
        out.append((t, slice(start, start + t.n_rows)))
        start += t.n_rows
    return out


def term_groups(t: TermSet) -> int:
    """Merit-granularity group count of one constraint set."""
    return t.n_groups if t.groups is not None else 1


def num_cnt_groups(nlp: Nlp) -> int:
    """Total merit units: the length of the per-'constraint' violation and
    merit-coefficient vectors (one per hatched Constraint object in the
    reference; per group here)."""
    return sum(term_groups(t) for t in nlp.cnt_sets)


def cnt_group_structure(nlp: Nlp) -> list[tuple[TermSet, slice, slice]]:
    """[(term, row_slice, group_slice)] over constraint sets; group_slice
    indexes the merit-coefficient / violation vectors."""
    out, row0, g0 = [], 0, 0
    for t in nlp.cnt_sets:
        ng = term_groups(t)
        out.append((t, slice(row0, row0 + t.n_rows), slice(g0, g0 + ng)))
        row0 += t.n_rows
        g0 += ng
    return out


def cnt_group_names(nlp: Nlp) -> list[str]:
    """Diagnostic name per merit unit (set name, suffixed by group index
    for multi-group sets — the reference's per-step constraint names)."""
    names = []
    for t in nlp.cnt_sets:
        ng = term_groups(t)
        if ng == 1:
            names.append(t.name)
        else:
            names.extend(f"{t.name}[{g}]" for g in range(ng))
    return names


def _group_reduce(viol_rows: jax.Array, t: TermSet) -> jax.Array:
    """Sum per-row violations into per-group totals (Constraint::violation
    = vecSum(violations), modeling.cpp — one sum per hatched constraint)."""
    if t.groups is None:
        return jnp.sum(viol_rows, keepdims=True)
    return jax.ops.segment_sum(viol_rows, jnp.asarray(t.groups),
                               num_segments=t.n_groups)


def _convexify_costs(nlp: Nlp, x: jax.Array, params: Params,
                     jac_cache: dict | None, *, pen_rows: bool):
    """Quadratize the cost sets at x -> (P, q, c0, A/b/w penalty rows).

    ``pen_rows=False`` skips the dense Jacobians of abs/hinge cost sets —
    the structured path re-derives those rows bandedly, so computing their
    dense form (for collision-as-cost: a full narrowphase + dense jacobian
    pass) would be pure duplicated work.
    """
    dtype = x.dtype
    n = nlp.n

    A_cost_rows, b_cost_rows, w_cost_rows = [], [], []
    P = jnp.zeros((n, n), dtype)
    q = jnp.zeros((n,), dtype)
    c0 = jnp.zeros((), dtype)

    index_of = {id(t): i for i, t in enumerate(nlp.term_sets)}
    for t in nlp.cost_sets:
        if (not pen_rows) and t.kind in (Kind.COST_ABS, Kind.COST_HINGE):
            continue
        if t.kind in (Kind.COST_GENERIC_FULL, Kind.COST_GENERIC_DIAG):
            f = lambda v: jnp.reshape(t.fn(v, params), ())
            val = f(x)
            g = jax.grad(f)(x)
            w = jnp.asarray(t.weight_fn(params), dtype)
            if t.kind is Kind.COST_GENERIC_FULL:
                H = _psd_project(jax.hessian(f)(x))
            else:
                # Diagonal variant: per-coordinate second directional
                # derivatives d2f/dx_i2 by forward-over-forward JVPs — the
                # point of the reference's diagonal path is to avoid the
                # full Hessian (modeling_utils.cpp:57-72), so no [n, n]
                # matrix and no reverse pass are ever built.
                def d2(e):
                    g = lambda v: jax.jvp(f, (v,), (e,))[1]  # noqa: E731
                    return jax.jvp(g, (x,), (e,))[1]
                eye_n = jnp.eye(x.shape[0], dtype=dtype)
                h = jnp.maximum(jax.vmap(d2)(eye_n), 0.0)
                H = jnp.diag(h)
            P = P + w * H
            q = q + w * (g - H @ x)
            c0 = c0 + w * (val - g @ x + 0.5 * x @ (H @ x))
        else:
            r, J = _residual_and_jac(t, x, params, jac_cache, index_of[id(t)])
            b = r - J @ x
            w = jnp.broadcast_to(jnp.asarray(t.weight_fn(params), dtype), (t.n_rows,))
            A_cost_rows.append(J)
            b_cost_rows.append(b)
            w_cost_rows.append(w)
            if t.kind is Kind.COST_SQ:
                # sum_r w_r (J_r x + b_r)^2 -> P += 2 J'WJ, q += 2 J'Wb
                JW = J * w[:, None]
                P = P + 2.0 * J.T @ JW
                q = q + 2.0 * JW.T @ b
                c0 = c0 + jnp.sum(w * b * b)
    return P, q, c0, A_cost_rows, b_cost_rows, w_cost_rows


def convexify(nlp: Nlp, x: jax.Array, params: Params,
              jac_cache: dict | None = None) -> ConvexModel:
    """Linearize/quadratize every term set at x.

    Mirrors one 'convexifyCosts + convexifyConstraints' pass of the SQP loop
    (``trajopt_sco/src/optimizers.cpp:781-783``) in a single batched trace.
    ``jac_cache`` supplies hoisted constant Jacobians for linear sets.
    """
    dtype = x.dtype
    n = nlp.n
    index_of = {id(t): i for i, t in enumerate(nlp.term_sets)}
    P, q, c0, A_cost_rows, b_cost_rows, w_cost_rows = _convexify_costs(
        nlp, x, params, jac_cache, pen_rows=True)

    A_cnt_rows, b_cnt_rows, l_cnt_rows, u_cnt_rows = [], [], [], []
    for t in nlp.cnt_sets:
        r, J = _residual_and_jac(t, x, params, jac_cache, index_of[id(t)])
        b = r - J @ x
        A_cnt_rows.append(J)
        b_cnt_rows.append(b)
        if t.kind is Kind.CNT_EQ:
            l_cnt_rows.append(jnp.zeros(t.n_rows, dtype))
            u_cnt_rows.append(jnp.zeros(t.n_rows, dtype))
        else:
            l_cnt_rows.append(jnp.full((t.n_rows,), -jnp.inf, dtype))
            u_cnt_rows.append(jnp.zeros(t.n_rows, dtype))

    def cat(rows, width=None):
        if rows:
            return jnp.concatenate([jnp.reshape(r, (-1,) if width is None else (-1, width)) for r in rows])
        return jnp.zeros((0,) if width is None else (0, width), dtype)

    return ConvexModel(
        P=P, q=q, c0=c0,
        A_cost=cat(A_cost_rows, n), b_cost=cat(b_cost_rows), w_cost=cat(w_cost_rows),
        A_cnt=cat(A_cnt_rows, n), b_cnt=cat(b_cnt_rows),
        l_cnt=cat(l_cnt_rows), u_cnt=cat(u_cnt_rows),
    )


def _interval_dist(v: jax.Array, l: jax.Array, u: jax.Array) -> jax.Array:
    return jnp.maximum(v - u, 0.0) + jnp.maximum(l - v, 0.0)


def eval_model_costs(nlp: Nlp, model: ConvexModel, x: jax.Array) -> jax.Array:
    """Per-cost-set convex model values at x (evaluateModelCosts,
    optimizers.cpp:241-259).  Generic sets report 0 per-set; their value
    lives in the shared quadratic — totals via :func:`model_cost_total`."""
    a = model.A_cost @ x + model.b_cost
    vals = []
    for t, sl in cost_row_structure(nlp):
        w, rows = model.w_cost[sl], a[sl]
        if t.kind is Kind.COST_SQ:
            vals.append(jnp.sum(w * rows * rows))
        elif t.kind is Kind.COST_ABS:
            vals.append(jnp.sum(w * jnp.abs(rows)))
        else:  # COST_HINGE
            vals.append(jnp.sum(w * jnp.maximum(rows, 0.0)))
    generic = [jnp.zeros((), x.dtype) for t in nlp.cost_sets
               if t.kind in (Kind.COST_GENERIC_FULL, Kind.COST_GENERIC_DIAG)]
    # Preserve cost-set order: rebuild in original order.
    ordered, i_rows, i_gen = [], 0, 0
    index_of = {id(t): i for i, t in enumerate(nlp.term_sets)}
    for t in nlp.cost_sets:
        if t.kind in (Kind.COST_GENERIC_FULL, Kind.COST_GENERIC_DIAG):
            ordered.append(generic[i_gen]); i_gen += 1
        else:
            ordered.append(vals[i_rows]); i_rows += 1
    return jnp.stack(ordered) if ordered else jnp.zeros((0,), x.dtype)


def model_cost_total(nlp: Nlp, model: ConvexModel, x: jax.Array) -> jax.Array:
    """Total convex cost model at x: quadratic (squared+generic) part plus
    abs/hinge penalty rows."""
    total = 0.5 * x @ (model.P @ x) + model.q @ x + model.c0
    a = model.A_cost @ x + model.b_cost
    for t, sl in cost_row_structure(nlp):
        if t.kind is Kind.COST_ABS:
            total = total + jnp.sum(model.w_cost[sl] * jnp.abs(a[sl]))
        elif t.kind is Kind.COST_HINGE:
            total = total + jnp.sum(model.w_cost[sl] * jnp.maximum(a[sl], 0.0))
    return total


def eval_model_cnt_viols(nlp: Nlp, model: ConvexModel, x: jax.Array) -> jax.Array:
    """Per-group violations of the *linearized* constraints at x
    (evaluateModelCntViols; one entry per hatched Constraint)."""
    g = model.A_cnt @ x + model.b_cnt
    d = _interval_dist(g, model.l_cnt, model.u_cnt)
    vals = [_group_reduce(d[sl], t) for t, sl, _ in cnt_group_structure(nlp)]
    return jnp.concatenate(vals) if vals else jnp.zeros((0,), x.dtype)


def eval_exact_costs(nlp: Nlp, x: jax.Array, params: Params) -> jax.Array:
    """Per-cost-set exact values (evaluateCosts, optimizers.cpp:187-196)."""
    vals = []
    for t in nlp.cost_sets:
        r = jnp.atleast_1d(jnp.asarray(t.fn(x, params)))
        w = jnp.asarray(t.weight_fn(params), x.dtype)
        if t.kind is Kind.COST_SQ:
            vals.append(jnp.sum(w * r * r))
        elif t.kind is Kind.COST_ABS:
            vals.append(jnp.sum(w * jnp.abs(r)))
        elif t.kind is Kind.COST_HINGE:
            vals.append(jnp.sum(w * jnp.maximum(r, 0.0)))
        else:  # generic scalar
            vals.append(jnp.sum(w * r))
    return jnp.stack(vals) if vals else jnp.zeros((0,), x.dtype)


def eval_exact_cnt_viols(nlp: Nlp, x: jax.Array, params: Params) -> jax.Array:
    """Per-group exact violations (sum of |g| for EQ, pos(g) for INEQ), as
    in Constraint::violation (modeling.cpp); one entry per merit unit
    (= per hatched Constraint in the reference, e.g. per collision step)."""
    vals = []
    for t in nlp.cnt_sets:
        r = jnp.atleast_1d(jnp.asarray(t.fn(x, params)))
        if t.kind is Kind.CNT_EQ:
            rows = jnp.abs(r)
        else:
            rows = jnp.maximum(r, 0.0)
        vals.append(_group_reduce(rows, t))
    return jnp.concatenate(vals) if vals else jnp.zeros((0,), x.dtype)


# ----------------------------------------------------------------------
# Structured (banded) convexification: used by the structured ADMM path.

class StructuredModel(NamedTuple):
    """Like ConvexModel, but constraint + penalty-cost rows are banded.

    Row order: [cnt-set rows (cnt_row_structure order); abs/hinge cost rows
    (cost_row_structure order, non-squared sets only)].
    """

    P: jax.Array
    q: jax.Array
    c0: jax.Array
    W: jax.Array        # [m_rows, w] banded window weights
    b: jax.Array        # [m_rows] residual offsets (a(x) = C x + b)
    l: jax.Array        # [m_rows] interval lower (on a(x))
    u: jax.Array        # [m_rows]
    is_pen: jax.Array   # [m_rows] bool: penalty-cost row (vs cnt row)
    pen_w: jax.Array    # [m_rows] penalty weight for cost rows (0 for cnt)


def structured_sets(nlp: Nlp) -> list:
    """Sets contributing banded rows, in QP row order."""
    out = [t for t, _ in cnt_row_structure(nlp)]
    out += [t for t, _ in cost_row_structure(nlp)
            if t.kind in PENALTY_COST_KINDS]
    return out


def supports_structured(nlp: Nlp) -> bool:
    return all(t.banded_jac is not None for t in structured_sets(nlp))


def structured_band(nlp: Nlp) -> tuple[np.ndarray, int]:
    """(starts [m_rows], width) of the combined banded matrix (static)."""
    widths = [t.band_width for t in structured_sets(nlp)]
    w = max(widths)
    starts = np.concatenate([np.asarray(t.band_starts)
                             for t in structured_sets(nlp)])
    return starts, w


def convexify_structured(nlp: Nlp, x: jax.Array, params: Params,
                         jac_cache: dict | None = None) -> StructuredModel:
    """Structured counterpart of convexify(): quadratic cost model plus
    banded constraint/penalty rows (no dense A materialization)."""
    dtype = x.dtype
    n = nlp.n
    starts_all, w = structured_band(nlp)

    # Quadratic part only: the banded loop below re-derives every
    # constraint/penalty row, so the dense cnt/pen Jacobians (for
    # collision: a whole extra narrowphase pass per SQP iteration) are
    # skipped (pen_rows=False).
    P, q, c0, _, _, _ = _convexify_costs(nlp, x, params, jac_cache,
                                         pen_rows=False)

    W_rows, b_rows, l_rows, u_rows, pen_rows, penw_rows = [], [], [], [], [], []

    def pad_W(Wt, width):
        if width == w:
            return Wt
        return jnp.concatenate(
            [Wt, jnp.zeros((Wt.shape[0], w - width), dtype)], axis=1)

    for t in structured_sets(nlp):
        if t.val_banded_jac is not None:
            r, Wt = t.val_banded_jac(x, params)
            r = jnp.atleast_1d(jnp.asarray(r))
            Wt = pad_W(Wt.astype(dtype), t.band_width)
        else:
            r = jnp.atleast_1d(jnp.asarray(t.fn(x, params)))
            Wt = pad_W(t.banded_jac(x, params).astype(dtype), t.band_width)
        # b = r - (C x)|row  computed bandedly
        idx = np.minimum(np.asarray(t.band_starts)[:, None] + np.arange(w),
                         n - 1)
        cx = jnp.sum(Wt * x[jnp.asarray(idx)], axis=1)
        b = r - cx
        W_rows.append(Wt)
        b_rows.append(b)
        if t.kind is Kind.CNT_EQ:
            l_rows.append(jnp.zeros(t.n_rows, dtype))
            u_rows.append(jnp.zeros(t.n_rows, dtype))
            pen_rows.append(np.zeros(t.n_rows, bool))
            penw_rows.append(jnp.zeros(t.n_rows, dtype))
        elif t.kind is Kind.CNT_INEQ:
            l_rows.append(jnp.full((t.n_rows,), -jnp.inf, dtype))
            u_rows.append(jnp.zeros(t.n_rows, dtype))
            pen_rows.append(np.zeros(t.n_rows, bool))
            penw_rows.append(jnp.zeros(t.n_rows, dtype))
        else:
            wgt = jnp.broadcast_to(jnp.asarray(t.weight_fn(params), dtype),
                                   (t.n_rows,))
            if t.kind is Kind.COST_ABS:
                l_rows.append(jnp.zeros(t.n_rows, dtype))
                u_rows.append(jnp.zeros(t.n_rows, dtype))
            else:  # COST_HINGE
                l_rows.append(jnp.full((t.n_rows,), -jnp.inf, dtype))
                u_rows.append(jnp.zeros(t.n_rows, dtype))
            pen_rows.append(np.ones(t.n_rows, bool))
            penw_rows.append(wgt)

    return StructuredModel(
        P=P, q=q, c0=c0,
        W=jnp.concatenate(W_rows) if W_rows else jnp.zeros((0, w), dtype),
        b=jnp.concatenate(b_rows) if b_rows else jnp.zeros((0,), dtype),
        l=jnp.concatenate(l_rows) if l_rows else jnp.zeros((0,), dtype),
        u=jnp.concatenate(u_rows) if u_rows else jnp.zeros((0,), dtype),
        is_pen=jnp.asarray(np.concatenate(pen_rows) if pen_rows
                           else np.zeros(0, bool)),
        pen_w=jnp.concatenate(penw_rows) if penw_rows else jnp.zeros((0,), dtype),
    )


def structured_row_values(nlp: Nlp, sm: StructuredModel, x: jax.Array):
    """a(x) = C x + b for all banded rows."""
    starts_all, w = structured_band(nlp)
    n = nlp.n
    idx = np.minimum(starts_all[:, None] + np.arange(w), n - 1)
    return jnp.sum(sm.W * x[jnp.asarray(idx)], axis=1) + sm.b


def structured_model_cost_total(nlp: Nlp, sm: StructuredModel,
                                x: jax.Array) -> jax.Array:
    total = 0.5 * x @ (sm.P @ x) + sm.q @ x + sm.c0
    a = structured_row_values(nlp, sm, x)
    d = _interval_dist(a, sm.l, sm.u)
    return total + jnp.sum(jnp.where(sm.is_pen, sm.pen_w * d, 0.0))


def structured_model_cnt_viols(nlp: Nlp, sm: StructuredModel,
                               x: jax.Array) -> jax.Array:
    a = structured_row_values(nlp, sm, x)
    d = _interval_dist(a, sm.l, sm.u)
    vals = [_group_reduce(d[sl], t) for t, sl, _ in cnt_group_structure(nlp)]
    return jnp.concatenate(vals) if vals else jnp.zeros((0,), x.dtype)
