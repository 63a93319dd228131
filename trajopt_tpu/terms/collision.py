"""Collision terms: discrete, LVS-discrete, and cast (swept) hinge
costs/constraints over a CollisionScene.

Re-creates the reference's collision term stack
(``trajopt/src/collision_terms.cpp``):

* residual per (step-or-gap, pair) = ``margin - signed_distance`` -> hinge
  cost weighted by coeff (CollisionCost::convex, collision_terms.cpp:
  1283-1304) or inequality constraint rows (CollisionConstraint::convex,
  :1368-1389).
* evaluators: SingleTimestepCollisionEvaluator (one state per step),
  DiscreteCollisionEvaluator (LVS: interpolated sub-states per gap, worst
  contact kept), CastCollisionEvaluator (swept shapes per gap with LVS
  sub-segmentation, SURVEY.md par. 3.4).
* fixed steps are excluded exactly like CollisionTermInfo::hatch
  (problem_description.cpp:1714-1759).
* merit granularity: one constraint group per step/gap, matching the
  reference's one-Constraint-per-step hatching (pd.cpp:1726-1770).
* ``aggregate="weighted_average"``: the ifopt stack's fixed-size
  formulation — per-LINK-PAIR contact sets, row value = max error in the
  set, row gradient = error-weighted average of the member gradients
  (weighted_average_methods.cpp:31-108, discrete_collision_constraint.cpp:
  60-140), with ``safety_margin_buffer`` extending the weighting band.

TPU-native differences: contact counts are static (all candidate pairs
every step — the fixed-size formulation the ifopt stack's ``max_num_cnt``
approximates, ``trajopt_common collision_types.h:162``); gradients come
from pose-space analytic composition instead of ``+/- n^T J`` assembly;
the worst sub-state min is the autodiff subgradient at the argmin,
matching the reference's choice of linearizing the worst contact.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.sqp.nlp import Kind, TermSet

EVALUATORS = ("discrete", "lvs_discrete", "cast")
AGGREGATES = ("none", "weighted_average")


def _per_pair(scene: CollisionScene, value, overrides) -> np.ndarray:
    """Broadcast a scalar/array to per-pair values with optional per-link/
    geom-pair overrides keyed by (name_a, name_b) or (link_a, link_b)
    (CollisionCoeffData / per-pair margin data,
    trajopt_common collision_types.h:48-166)."""
    pairs = scene.pairs()
    out = np.broadcast_to(np.asarray(value, float), (len(pairs),)).copy()
    if overrides:
        for i, (ga, gb) in enumerate(pairs):
            for key, v in overrides.items():
                ka, kb = key
                names = {ga.name, gb.name, ga.link, gb.link}
                if ka in names and kb in names:
                    out[i] = v
    return out


def _step_pair_matrix(scene: CollisionScene, value, overrides,
                      n_steps: int) -> np.ndarray:
    """[n_steps, n_pairs] coeff/margin data: `value` is a scalar or a
    per-timestep vector (the reference's per-step coeff/dist_pen data in
    TrajOptCollisionConfig); per-pair overrides (keyed by link or geom
    names) replace the value for that pair at every step
    (problem_description.cpp:1700-1710 `pairs` semantics)."""
    arr = np.asarray(value, float).reshape(-1)
    if arr.size == 1:
        step_vals = np.full(n_steps, arr[0])
    elif arr.size == n_steps:
        step_vals = arr
    else:
        raise ValueError(
            f"collision coeff/margin must be a scalar or length-{n_steps} "
            f"per-timestep vector, got length {arr.size}")
    M = np.tile(step_vals[:, None], (1, scene.n_pairs))
    if overrides:
        ov = _per_pair(scene, np.nan, overrides)
        mask = ~np.isnan(ov)
        M[:, mask] = ov[mask]
    return M


def _link_pair_partition(scene: CollisionScene):
    """Static partition of candidate geom pairs by LINK pair (the unit the
    ifopt stack's GradientResultsSet aggregates over)."""
    pairs = scene.pairs()
    lp_of: dict = {}
    lp_index = np.zeros(len(pairs), np.int32)
    for i, (ga, gb) in enumerate(pairs):
        key = tuple(sorted((ga.link or ga.name, gb.link or gb.name)))
        lp_index[i] = lp_of.setdefault(key, len(lp_of))
    return lp_index, len(lp_of)


def collision_term(
    scene: CollisionScene,
    n_steps: int,
    *,
    margin,
    coeff=20.0,
    is_cost: bool = True,
    evaluator: str = "discrete",
    first_step: int = 0,
    last_step: int = -1,
    fixed_steps: Sequence[int] = (),
    lvs_substeps: int = 5,
    pair_coeffs: dict | None = None,
    pair_margins: dict | None = None,
    max_num_cnt: int | None = None,
    aggregate: str = "none",
    safety_margin_buffer: float = 0.0,
    n_dof_total: int | None = None,
    name: str | None = None,
) -> TermSet:
    """Build the collision TermSet (CollisionTermInfo::hatch analog).

    ``margin`` / ``coeff`` accept scalars or per-timestep vectors;
    ``pair_coeffs`` / ``pair_margins`` override them per link or geometry
    pair (CollisionCoeffData semantics).  ``max_num_cnt`` keeps only the k
    most-violating rows per step/gap via top_k — the fixed-size contact cap
    of collision_types.h:162 with static shapes.

    ``aggregate="weighted_average"`` switches to the ifopt stack's
    fixed-size formulation: one row per LINK pair whose value is the max
    member error and whose Jacobian is the error-weighted average of the
    member gradients (weights ``max(0, margin + safety_margin_buffer - d)``,
    weighted_average_methods.cpp:31-108); ``max_num_cnt`` then caps link
    pairs.  At large pair counts this caps QP rows with better gradient
    quality than hard top-k over raw pairs.
    """
    if evaluator not in EVALUATORS:
        raise ValueError(f"evaluator must be one of {EVALUATORS}")
    if aggregate not in AGGREGATES:
        raise ValueError(f"aggregate must be one of {AGGREGATES}")
    n_dof = scene.tree.n_dof
    n_dof_total = n_dof_total or n_dof
    if last_step <= -1:
        last_step = n_steps - 1
    n_pairs_full = scene.n_pairs
    if n_pairs_full == 0:
        raise ValueError("collision scene has no candidate pairs")
    name = name or f"collision_{evaluator}"
    coeff_mat = _step_pair_matrix(scene, coeff, pair_coeffs, n_steps)
    margin_mat = _step_pair_matrix(scene, margin, pair_margins, n_steps)
    buf = float(safety_margin_buffer)

    use_wavg = aggregate == "weighted_average"
    if use_wavg:
        lp_index, n_lp = _link_pair_partition(scene)
        lp_index_j = jnp.asarray(lp_index)
        n_units = n_lp
    else:
        n_units = n_pairs_full

    topk = max_num_cnt is not None and max_num_cnt < n_units
    k_rows = max_num_cnt if topk else n_units

    def _seg_max(viol):
        # segment ops reduce over the LEADING axis; move pairs there.
        v = jnp.moveaxis(viol, -1, 0)
        out = jax.ops.segment_max(v, lp_index_j, num_segments=n_lp)
        return jnp.moveaxis(out, 0, -1)

    def _seg_sum(v):
        vv = jnp.moveaxis(v, -1, 0)
        out = jax.ops.segment_sum(vv, lp_index_j, num_segments=n_lp)
        return jnp.moveaxis(out, 0, -1)

    def _aggregate_viol(viol, coeff_sl):
        """viol [..., P] (coeff-scaled) -> per-unit rows [..., n_units]."""
        if not use_wavg:
            return viol
        return _seg_max(viol)

    def _aggregate_jacs(viol, coeff_sl, jacs):
        """Error-weighted average of member Jacobians per link pair.

        viol: [..., P] coeff-scaled errors; weights use the buffered error
        ``viol + coeff*buffer`` (= coeff*(margin + buffer - d), matching
        error_with_buffer in weighted_average_methods.cpp; the coeff scale
        cancels in the normalized weights when uniform within a pair set).
        jacs: tuple of [..., P, D] arrays sharing the weights (T0/T1).
        """
        if not use_wavg:
            return viol, jacs
        w = jnp.maximum(viol + coeff_sl * buf, 0.0)           # [..., P]
        tot = _seg_sum(w)                                     # [..., L]
        safe = jnp.where(tot > 0.0, tot, 1.0)
        out_jacs = []
        for J in jacs:
            num = _seg_sum_last2(w[..., None] * J)
            out_jacs.append(jnp.where((tot > 0.0)[..., None],
                                      num / safe[..., None], 0.0))
        return _seg_max(viol), tuple(out_jacs)

    def _seg_sum_last2(v):
        """segment-sum over the second-to-last (pair) axis of [..., P, D]."""
        vv = jnp.moveaxis(v, -2, 0)
        out = jax.ops.segment_sum(vv, lp_index_j, num_segments=n_lp)
        return jnp.moveaxis(out, 0, -2)

    if evaluator == "discrete":
        steps = [t for t in range(first_step, last_step + 1)
                 if t not in fixed_steps]
        steps_arr = np.asarray(steps)
        S = len(steps)
        n_rows = S * k_rows
        coeff_sl = coeff_mat[steps_arr]            # [S, P]
        margin_sl = margin_mat[steps_arr]

        def _viol(ds, dtype):
            return (jnp.asarray(coeff_sl, dtype) *
                    (jnp.asarray(margin_sl, dtype) - ds))

        def raw(x, params):
            qs = x.reshape(n_steps, n_dof_total)[:, :n_dof]
            ds = jax.vmap(lambda q: scene.distances(q, params))(
                qs[steps_arr])                             # [S, n_pairs]
            viol = _viol(ds, x.dtype)
            rows = _aggregate_viol(viol, jnp.asarray(coeff_sl, x.dtype))
            if topk:
                rows, _ = jax.lax.top_k(rows, k_rows)
            return rows.reshape(-1)

        # Block-structured Jacobian: each row depends on ONE timestep's
        # n_dof joints — differentiate per step (n_dof tangents instead of
        # n_steps*n_dof) and scatter into the dense matrix (the banded
        # structure the reference's VarArray terms exploit implicitly).
        # Top-k / weighted-average selection happens WITHIN a step, so rows
        # stay step-local and the banded form survives.
        onehot = np.zeros((S, n_steps), np.float64)
        onehot[np.arange(S), steps_arr] = 1.0

        def _step_vals_blocks(x, params):
            """ONE narrowphase pass -> (distances, scaled jac blocks); the
            Jacobian composes pose-space narrowphase cotangents with the
            geometric-Jacobian relations (scene.distances_and_jac) so no
            reverse tangent re-traverses the FK chain."""
            qs = x.reshape(n_steps, n_dof_total)[:, :n_dof]
            ds, Js = jax.vmap(
                lambda q: scene.distances_and_jac(q, params))(qs[steps_arr])
            return ds, -Js * jnp.asarray(coeff_sl, x.dtype)[:, :, None]

        def _select_rows(ds, Js, dtype):
            """(viol rows [S, k], jac rows [S, k, n_dof]) after aggregation
            and the optional within-step top-k (max_num_cnt)."""
            viol = _viol(ds, dtype)
            if use_wavg:
                viol, (Js,) = _aggregate_jacs(
                    viol, jnp.asarray(coeff_sl, dtype), (Js,))
            if not topk:
                return viol, Js
            vals, idx = jax.lax.top_k(viol, k_rows)
            return vals, jnp.take_along_axis(Js, idx[..., None], axis=1)

        def _scatter_jac(Js, dtype):
            k = Js.shape[1]
            J = jnp.einsum("spd,st->sptd", Js, jnp.asarray(onehot, dtype))
            out = jnp.zeros((S, k, n_steps, n_dof_total), dtype)
            out = out.at[..., :n_dof].set(J)
            return out.reshape(S * k, n_steps * n_dof_total)

        def jac(x, params):
            ds, Js = _step_vals_blocks(x, params)
            return _scatter_jac(_select_rows(ds, Js, x.dtype)[1], x.dtype)

        def val_jac(x, params):
            ds, Js = _step_vals_blocks(x, params)
            vals, Jsel = _select_rows(ds, Js, x.dtype)
            return vals.reshape(-1), _scatter_jac(Jsel, x.dtype)

        band_width = n_dof_total
        band_starts = np.repeat(steps_arr * n_dof_total, k_rows)
        # Merit granularity: one group per STEP, matching the reference's
        # one-CollisionCost/Constraint-per-step hatching
        # (problem_description.cpp:1726-1770) so per-constraint merit
        # inflation and the cnt_tolerance check operate per step.
        row_groups = np.repeat(np.arange(S), k_rows)
        n_row_groups = S

        def _W_of(Js, dtype):
            W = jnp.zeros((S * k_rows, band_width), dtype)
            return W.at[:, :n_dof].set(Js.reshape(S * k_rows, n_dof))

        def banded_jac(x, params):
            ds, Js = _step_vals_blocks(x, params)
            return _W_of(_select_rows(ds, Js, x.dtype)[1], x.dtype)

        def val_banded_jac(x, params):
            ds, Js = _step_vals_blocks(x, params)
            vals, Jsel = _select_rows(ds, Js, x.dtype)
            return vals.reshape(-1), _W_of(Jsel, x.dtype)

    else:
        # Per-gap terms; a gap is skipped only when BOTH endpoints are fixed
        # (matching the cast hatch's treatment of fixed_steps).  One row per
        # (gap, sub-segment, pair): the reference collects a contact row per
        # LVS sub-query (CollisionsToDistanceExpressions builds one AffExpr
        # per contact, collision_terms.cpp:343-383) — min-reducing over
        # sub-segments would erase gradient information when the deepest
        # sub-segment's penetration normal is insensitive to the free vars.
        gaps = [t for t in range(first_step, last_step)
                if not (t in fixed_steps and (t + 1) in fixed_steps)]
        fracs = np.linspace(0.0, 1.0, lvs_substeps + 1)
        gaps_arr = np.asarray(gaps)
        G = len(gaps)
        coeff_sl = coeff_mat[gaps_arr][:, None, :]     # [G, 1, P]
        margin_sl = margin_mat[gaps_arr][:, None, :]

        # One narrowphase TRACE shared by all sub-steps (vmap over the
        # interpolation fractions): the unrolled per-substep form traced
        # the whole narrowphase lvs_substeps times, dominating compile
        # time at PR2-class pair counts.
        if evaluator == "lvs_discrete":
            n_sub = lvs_substeps + 1
            fr = jnp.asarray(fracs)

            def gap_dists(q0, q1, params=None):
                return jax.vmap(
                    lambda f: scene.distances(q0 + f * (q1 - q0), params)
                )(fr.astype(q0.dtype))                      # [n_sub, n_pairs]
        else:  # cast: swept over each LVS sub-segment
            n_sub = lvs_substeps
            fr_a = jnp.asarray(fracs[:-1])
            fr_b = jnp.asarray(fracs[1:])
            fr_all = jnp.asarray(fracs)

            def gap_dists(q0, q1, params=None):
                # ONE FK pass over the n_sub+1 interpolation points;
                # adjacent sub-segments share their endpoint poses (FK
                # dominates the swept value query at flagship batches —
                # benchmarks/narrowphase_profile.py).
                dq = q1 - q0
                qf = q0[None] + fr_all.astype(q0.dtype)[:, None] * dq[None]
                R, p = jax.vmap(scene.tree.fk)(qf)
                return jax.vmap(
                    lambda fa, fb, f0, f1: scene.swept_distances(
                        q0 + fa * dq, q0 + fb * dq, params,
                        fk0=f0, fk1=f1)
                )(fr_a.astype(q0.dtype), fr_b.astype(q0.dtype),
                  (R[:-1], p[:-1]), (R[1:], p[1:]))

        n_rows = G * n_sub * k_rows

        def _viol(ds, dtype):
            return (jnp.asarray(coeff_sl, dtype) *
                    (jnp.asarray(margin_sl, dtype) - ds))

        def raw(x, params):
            qs = x.reshape(n_steps, n_dof_total)[:, :n_dof]
            ds = jax.vmap(lambda a, b: gap_dists(a, b, params))(
                qs[gaps_arr], qs[gaps_arr + 1])
            viol = _viol(ds, x.dtype)
            rows = _aggregate_viol(viol, jnp.asarray(coeff_sl, x.dtype))
            if topk:
                rows, _ = jax.lax.top_k(rows, k_rows)
            return rows.reshape(-1)

        # Per-gap Jacobian: rows couple exactly two adjacent steps.
        onehot0 = np.zeros((G, n_steps), np.float64)
        onehot0[np.arange(G), gaps_arr] = 1.0
        onehot1 = np.zeros((G, n_steps), np.float64)
        onehot1[np.arange(G), gaps_arr + 1] = 1.0

        def _gap_vals_blocks(x, params):
            """ONE swept/LVS narrowphase pass -> (distances, jac blocks).

            Jacobians come from the scene's pose-space analytic paths
            (distances_and_jac / swept_distances_and_jac) chained through
            the affine interpolation q_f = (1-f) q0 + f q1 — no reverse
            tangents traverse the FK chain (see distances_and_jac)."""
            qs = x.reshape(n_steps, n_dof_total)[:, :n_dof]

            # vmap over sub-steps: ONE distances_and_jac trace regardless
            # of lvs_substeps (compile-time lever, see gap_dists above)
            if evaluator == "lvs_discrete":
                fr = jnp.asarray(fracs)

                def one(a, b):
                    def sub(f):
                        d, J = scene.distances_and_jac(a + f * (b - a),
                                                       params)
                        return d, (1.0 - f) * J, f * J
                    return jax.vmap(sub)(fr.astype(a.dtype))
            else:  # cast
                fr_a = jnp.asarray(fracs[:-1])
                fr_b = jnp.asarray(fracs[1:])
                fr_all2 = jnp.asarray(fracs)

                def one(a, b):
                    # shared FK+axes across sub-segment endpoints (see
                    # gap_dists above)
                    dq = b - a
                    qf = (a[None]
                          + fr_all2.astype(a.dtype)[:, None] * dq[None])
                    R, p, z, o = jax.vmap(scene.tree.fk_with_axes)(qf)

                    def sub(fa, fb, f0, f1):
                        d, Ja, Jb = scene.swept_distances_and_jac(
                            a + fa * dq, a + fb * dq, params,
                            fk0=f0, fk1=f1)
                        return (d, (1.0 - fa) * Ja + (1.0 - fb) * Jb,
                                fa * Ja + fb * Jb)
                    return jax.vmap(sub)(
                        fr_a.astype(a.dtype), fr_b.astype(a.dtype),
                        (R[:-1], p[:-1], z[:-1], o[:-1]),
                        (R[1:], p[1:], z[1:], o[1:]))

            ds, J0, J1 = jax.vmap(one)(qs[gaps_arr], qs[gaps_arr + 1])
            cf = jnp.asarray(coeff_sl, x.dtype)[..., None]
            return ds, -J0 * cf, -J1 * cf  # [G, n_sub, n_pairs(, n_dof)]

        def _select_rows(ds, J0, J1, dtype):
            """Aggregation + optional within-(gap, sub-segment) top-k: rows
            stay inside the same two-step window, so the banded form
            survives."""
            viol = _viol(ds, dtype)                 # [G, n_sub, n_pairs]
            if use_wavg:
                viol, (J0, J1) = _aggregate_jacs(
                    viol, jnp.asarray(coeff_sl, dtype), (J0, J1))
            if not topk:
                return viol, J0, J1
            vals, idx = jax.lax.top_k(viol, k_rows)
            take = lambda J: jnp.take_along_axis(  # noqa: E731
                J, idx[..., None], axis=2)
            return vals, take(J0), take(J1)

        def _scatter_jac(J0, J1, dtype):
            k = J0.shape[2]
            oh0 = jnp.asarray(onehot0, dtype)
            oh1 = jnp.asarray(onehot1, dtype)
            J = jnp.einsum("gkpd,gt->gkptd", J0, oh0) + \
                jnp.einsum("gkpd,gt->gkptd", J1, oh1)
            out = jnp.zeros((G, n_sub, k, n_steps, n_dof_total), dtype)
            out = out.at[..., :n_dof].set(J)
            return out.reshape(G * n_sub * k, n_steps * n_dof_total)

        def jac(x, params):
            ds, J0, J1 = _gap_vals_blocks(x, params)
            _, J0s, J1s = _select_rows(ds, J0, J1, x.dtype)
            return _scatter_jac(J0s, J1s, x.dtype)

        def val_jac(x, params):
            ds, J0, J1 = _gap_vals_blocks(x, params)
            vals, J0s, J1s = _select_rows(ds, J0, J1, x.dtype)
            return vals.reshape(-1), _scatter_jac(J0s, J1s, x.dtype)

        band_width = 2 * n_dof_total
        band_starts = np.repeat(gaps_arr * n_dof_total, n_sub * k_rows)
        # One merit group per GAP (the reference hatches one cast/LVS
        # Constraint per gap; its LVS sub-rows share that constraint).
        row_groups = np.repeat(np.arange(G), n_sub * k_rows)
        n_row_groups = G

        def _W_of(J0, J1, dtype):
            m_rows = G * n_sub * k_rows
            W = jnp.zeros((m_rows, band_width), dtype)
            W = W.at[:, :n_dof].set(J0.reshape(m_rows, n_dof))
            W = W.at[:, n_dof_total:n_dof_total + n_dof].set(
                J1.reshape(m_rows, n_dof))
            return W

        def banded_jac(x, params):
            ds, J0, J1 = _gap_vals_blocks(x, params)
            return _W_of(*_select_rows(ds, J0, J1, x.dtype)[1:], x.dtype)

        def val_banded_jac(x, params):
            ds, J0, J1 = _gap_vals_blocks(x, params)
            vals, J0s, J1s = _select_rows(ds, J0, J1, x.dtype)
            return vals.reshape(-1), _W_of(J0s, J1s, x.dtype)

    # Coefficients are folded into the residual rows (reference convention:
    # constraint violations and hinge values include the coeff), so the
    # hinge weight is 1.  All paths (dense, banded, aggregated, top-k
    # capped) provide analytic Jacobians: selection is within a step/gap
    # window, so the gathered rows keep the banded structure.
    kind = Kind.COST_HINGE if is_cost else Kind.CNT_INEQ
    return TermSet(name, kind, raw, n_rows, jac_fn=jac,
                   banded_jac=banded_jac, band_starts=band_starts,
                   band_width=band_width, val_jac_fn=val_jac,
                   val_banded_jac=val_banded_jac,
                   groups=None if is_cost else row_groups,
                   n_groups=1 if is_cost else n_row_groups)
