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

TPU-native differences: contact counts are static (all candidate pairs
every step — the fixed-size formulation the ifopt stack's ``max_num_cnt``
approximates, ``trajopt_common collision_types.h:162``); gradients come
from autodiff through FK + distance instead of ``+/- n^T J`` assembly; the
worst sub-state min is the autodiff subgradient at the argmin, matching the
reference's choice of linearizing the worst contact.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.sqp.nlp import Kind, TermSet

EVALUATORS = ("discrete", "lvs_discrete", "cast")


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


def collision_term(
    scene: CollisionScene,
    n_steps: int,
    *,
    margin: float,
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
    n_dof_total: int | None = None,
    name: str | None = None,
) -> TermSet:
    """Build the collision TermSet (CollisionTermInfo::hatch analog).

    ``pair_coeffs`` / ``pair_margins`` override coeff/margin per link or
    geometry pair (CollisionCoeffData semantics).  ``max_num_cnt`` keeps
    only the k most-violating pairs per step/gap via top_k — the fixed-size
    contact cap of collision_types.h:162 with static shapes.
    """
    if evaluator not in EVALUATORS:
        raise ValueError(f"evaluator must be one of {EVALUATORS}")
    n_dof = scene.tree.n_dof
    n_dof_total = n_dof_total or n_dof
    if last_step <= -1:
        last_step = n_steps - 1
    n_pairs_full = scene.n_pairs
    if n_pairs_full == 0:
        raise ValueError("collision scene has no candidate pairs")
    name = name or f"collision_{evaluator}"
    coeff_full = _per_pair(scene, coeff, pair_coeffs)
    margin_full = _per_pair(scene, margin, pair_margins)

    topk = max_num_cnt is not None and max_num_cnt < n_pairs_full
    k_pairs = max_num_cnt if topk else n_pairs_full

    def select_pairs(viol_rows):
        """viol_rows [..., n_pairs] -> top-k by violation, static shape.
        Gradients flow through the gathered entries (the reference
        linearizes exactly the selected worst contacts)."""
        if not topk:
            return viol_rows
        vals, idx = jax.lax.top_k(viol_rows, k_pairs)
        return vals

    if evaluator == "discrete":
        steps = [t for t in range(first_step, last_step + 1)
                 if t not in fixed_steps]
        steps_arr = np.asarray(steps)
        n_rows = len(steps) * k_pairs

        def raw(x, params):
            qs = x.reshape(n_steps, n_dof_total)[:, :n_dof]
            ds = jax.vmap(lambda q: scene.distances(q, params))(
                qs[steps_arr])                             # [S, n_pairs]
            viol = jnp.asarray(coeff_full, x.dtype) * \
                (jnp.asarray(margin_full, x.dtype) - ds)
            return select_pairs(viol).reshape(-1)

        # Block-structured Jacobian: each row depends on ONE timestep's
        # n_dof joints — differentiate per step (n_dof tangents instead of
        # n_steps*n_dof) and scatter into the dense matrix (the banded
        # structure the reference's VarArray terms exploit implicitly).
        # With the top-k cap the row->pair mapping is data-dependent, but
        # selection happens WITHIN a step, so rows stay step-local and the
        # banded form survives — gather the selected Jacobian rows.
        S = len(steps)
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
            return ds, -Js * jnp.asarray(coeff_full, x.dtype)[None, :, None]

        def _viol(ds, dtype):
            return (jnp.asarray(coeff_full, dtype) *
                    (jnp.asarray(margin_full, dtype) - ds))

        def _scatter_jac(Js, dtype):
            k = Js.shape[1]  # n_pairs_full or k_pairs (top-k selected)
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
        band_starts = np.repeat(steps_arr * n_dof_total, k_pairs)

        def _select_rows(ds, Js, dtype):
            """(viol [S, k], jac rows [S, k, n_dof]) after the optional
            within-step top-k (collision_types.h:162 max_num_cnt)."""
            viol = _viol(ds, dtype)
            if not topk:
                return viol, Js
            vals, idx = jax.lax.top_k(viol, k_pairs)
            return vals, jnp.take_along_axis(Js, idx[..., None], axis=1)

        def _W_of(Js, dtype):
            W = jnp.zeros((S * k_pairs, band_width), dtype)
            return W.at[:, :n_dof].set(Js.reshape(S * k_pairs, n_dof))

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

        if evaluator == "lvs_discrete":
            n_sub = lvs_substeps + 1

            def gap_dists(q0, q1, params=None):
                return jnp.stack([scene.distances(q0 + f * (q1 - q0), params)
                                  for f in fracs])          # [n_sub, n_pairs]
        else:  # cast: swept over each LVS sub-segment
            n_sub = lvs_substeps

            def gap_dists(q0, q1, params=None):
                ds = []
                for k in range(lvs_substeps):
                    qa = q0 + fracs[k] * (q1 - q0)
                    qb = q0 + fracs[k + 1] * (q1 - q0)
                    ds.append(scene.swept_distances(qa, qb, params))
                return jnp.stack(ds)                        # [n_sub, n_pairs]

        n_rows = len(gaps) * n_sub * k_pairs
        gaps_arr = np.asarray(gaps)

        def raw(x, params):
            qs = x.reshape(n_steps, n_dof_total)[:, :n_dof]
            ds = jax.vmap(lambda a, b: gap_dists(a, b, params))(
                qs[gaps_arr], qs[gaps_arr + 1])
            viol = jnp.asarray(coeff_full, x.dtype) * \
                (jnp.asarray(margin_full, x.dtype) - ds)
            return select_pairs(viol).reshape(-1)

        # Per-gap Jacobian: rows couple exactly two adjacent steps.
        G = len(gaps)
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

            if evaluator == "lvs_discrete":
                def one(a, b):
                    outs = [scene.distances_and_jac(a + f * (b - a), params)
                            for f in fracs]
                    ds = jnp.stack([o[0] for o in outs])
                    J0 = jnp.stack([(1.0 - f) * o[1]
                                    for f, o in zip(fracs, outs)])
                    J1 = jnp.stack([f * o[1] for f, o in zip(fracs, outs)])
                    return ds, J0, J1
            else:  # cast
                def one(a, b):
                    ds_k, J0_k, J1_k = [], [], []
                    for k in range(lvs_substeps):
                        fa, fb = fracs[k], fracs[k + 1]
                        qa = a + fa * (b - a)
                        qb = a + fb * (b - a)
                        d, Ja, Jb = scene.swept_distances_and_jac(qa, qb,
                                                                  params)
                        ds_k.append(d)
                        J0_k.append((1.0 - fa) * Ja + (1.0 - fb) * Jb)
                        J1_k.append(fa * Ja + fb * Jb)
                    return (jnp.stack(ds_k), jnp.stack(J0_k),
                            jnp.stack(J1_k))

            ds, J0, J1 = jax.vmap(one)(qs[gaps_arr], qs[gaps_arr + 1])
            cf = jnp.asarray(coeff_full, x.dtype)[None, None, :, None]
            return ds, -J0 * cf, -J1 * cf  # [G, n_sub, n_pairs(, n_dof)]

        def _viol(ds, dtype):
            return (jnp.asarray(coeff_full, dtype) *
                    (jnp.asarray(margin_full, dtype) - ds))

        def _select_rows(ds, J0, J1, dtype):
            """Optional within-(gap, sub-segment) top-k: rows stay inside
            the same two-step window, so the banded form survives."""
            viol = _viol(ds, dtype)                 # [G, n_sub, n_pairs]
            if not topk:
                return viol, J0, J1
            vals, idx = jax.lax.top_k(viol, k_pairs)
            take = lambda J: jnp.take_along_axis(  # noqa: E731
                J, idx[..., None], axis=2)
            return vals, take(J0), take(J1)

        def _scatter_jac(J0, J1, dtype):
            k = J0.shape[2]  # n_pairs_full or k_pairs (top-k selected)
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
        band_starts = np.repeat(gaps_arr * n_dof_total, n_sub * k_pairs)

        def _W_of(J0, J1, dtype):
            m_rows = G * n_sub * k_pairs
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
    # hinge weight is 1.  All paths (dense, banded, top-k capped) provide
    # analytic Jacobians: top-k selection is within a step/gap window, so
    # the gathered rows keep the banded structure.
    kind = Kind.COST_HINGE if is_cost else Kind.CNT_INEQ
    return TermSet(name, kind, raw, n_rows, jac_fn=jac,
                   banded_jac=banded_jac, band_starts=band_starts,
                   band_width=band_width, val_jac_fn=val_jac,
                   val_banded_jac=val_banded_jac)
