"""Trust-region SQP with L1 exact-penalty outer loop, as pure JAX loops.

Re-creates the algorithm of ``sco::BasicTrustRegionSQP::optimize()``
(``trajopt_sco/src/optimizers.cpp:699-991``) — three nested loops:

1. penalty loop: escalate per-constraint merit coefficients x10 until
   constraints are satisfied to ``cnt_tolerance`` (max 5 rounds),
2. SQP loop: convexify costs/constraints at the current iterate,
3. trust-region loop: solve the convex QP inside a shrinking/expanding box,
   accept steps by exact-vs-model merit-improvement ratio.

TPU-native design choices (not a port):

* The nested loops and gotos become one ``lax.while_loop`` driving a state
  machine over a ``SQPState`` pytree; per-problem early exit under ``vmap``
  is just lanes whose status has left RUNNING.
* The QP is the prox-ADMM solver in :mod:`trajopt_tpu.qp.admm`; hinge/abs
  constraint penalties are penalty *rows* (no slack variables), and the
  trust box + variable bounds are hard identity rows whose bounds are the
  only thing that changes across the trust-region loop (the reference's
  ``setTrustBoxConstraints``, optimizers.cpp:151-170).
* QP failure handling follows optimizers.cpp:817-842: a NaN/failed QP
  shrinks the box and retries up to ``max_qp_solver_failures`` before
  aborting with FAILED.
* Warm starts: ADMM (z, y) carry across trust-region and SQP iterations,
  mirroring the reference OSQP backend's warm-start option.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from trajopt_tpu.qp.admm import QPData, solve_qp
from trajopt_tpu.sqp import nlp as nlp_mod
from trajopt_tpu.sqp.nlp import ConvexModel, Nlp
from trajopt_tpu.sqp.params import SQPParams, SQPStatus


class SQPResult(NamedTuple):
    x: jax.Array            # [n] final iterate
    status: jax.Array       # int32, SQPStatus code
    cost_vals: jax.Array    # [n_cost_sets] exact per-set costs at x
    cnt_viols: jax.Array    # [num_cnt_groups] exact violations at x, one
    #                         entry per merit unit (per step/gap for
    #                         grouped collision sets; see nlp.TermSet.groups)
    total_cost: jax.Array
    merit_coeffs: jax.Array
    box_size: jax.Array
    n_iter: jax.Array
    n_qp_solves: jax.Array
    n_func_evals: jax.Array


class _State(NamedTuple):
    x: jax.Array
    cost_vals: jax.Array
    cnt_viols: jax.Array
    merit_coeffs: jax.Array
    box_size: jax.Array
    merit_increases: jax.Array
    iter_in_round: jax.Array   # resets each penalty round (optimizers.cpp:737)
    restarts_used: jax.Array   # second-chance penalty-schedule restarts
    total_iter: jax.Array
    status: jax.Array
    n_qp_solves: jax.Array
    n_func_evals: jax.Array
    z: jax.Array               # ADMM warm start
    y: jax.Array
    minv: jax.Array            # [n, n] KKT inverse carried across SQP steps
    #                            (Newton-Schulz seed; (0, 0) when unused)


class _TrustState(NamedTuple):
    box_size: jax.Array
    done: jax.Array
    outcome: jax.Array    # 0=shrinking, 1=accepted, 2=converged-small-improve, 3=qp-failed
    qp_fails: jax.Array
    x: jax.Array
    cost_vals: jax.Array
    cnt_viols: jax.Array
    n_qp_solves: jax.Array
    n_func_evals: jax.Array
    z: jax.Array
    y: jax.Array


_SHRINKING, _ACCEPTED, _CONVERGED_SMALL, _QP_FAILED = 0, 1, 2, 3


def _structured_cnt_coeffs(nlp: Nlp, merit_coeffs: jax.Array, dtype) -> jax.Array:
    """Merit coeffs expanded over ALL structured rows (cnt rows get their
    group's coeff; trailing penalty-cost rows get a placeholder overwritten
    by pen_w)."""
    from trajopt_tpu.sqp import nlp as _nm
    parts = [_cnt_row_coeffs(nlp, merit_coeffs, dtype)]
    n_pen = sum(t.n_rows for t, _ in _nm.cost_row_structure(nlp)
                if t.kind in _nm.PENALTY_COST_KINDS)
    parts.append(jnp.zeros((n_pen,), dtype))
    return jnp.concatenate(parts)


def _cnt_row_coeffs(nlp: Nlp, merit_coeffs: jax.Array, dtype) -> jax.Array:
    """Expand per-group merit coefficients to per-row penalty weights
    (each row takes its group's coefficient — the reference's
    per-Constraint merit_error_coeffs, optimizers.cpp:947-959)."""
    parts = []
    for t, _, gsl in nlp_mod.cnt_group_structure(nlp):
        cg = merit_coeffs[gsl].astype(dtype)
        if t.groups is None:
            parts.append(jnp.broadcast_to(cg, (t.n_rows,)))
        else:
            parts.append(cg[jnp.asarray(t.groups)])
    if not parts:
        return jnp.zeros((0,), dtype)
    return jnp.concatenate(parts)


def _penalty_cost_rows(nlp: Nlp, model: ConvexModel, dtype):
    """QP rows for abs/hinge *cost* sets: intervals on a(x)=A x + b and
    penalty weights.  Squared rows live in (P, q) and are excluded."""
    A_rows, l_rows, u_rows, c_rows = [], [], [], []
    for t, sl in nlp_mod.cost_row_structure(nlp):
        if t.kind is nlp_mod.Kind.COST_ABS:
            A_rows.append(model.A_cost[sl])
            l_rows.append(-model.b_cost[sl])
            u_rows.append(-model.b_cost[sl])
            c_rows.append(model.w_cost[sl])
        elif t.kind is nlp_mod.Kind.COST_HINGE:
            A_rows.append(model.A_cost[sl])
            l_rows.append(jnp.full((t.n_rows,), -jnp.inf, dtype))
            u_rows.append(-model.b_cost[sl])
            c_rows.append(model.w_cost[sl])
    n = model.P.shape[0]
    if not A_rows:
        z0, z1 = jnp.zeros((0, n), dtype), jnp.zeros((0,), dtype)
        return z0, z1, z1, z1
    return (jnp.concatenate(A_rows), jnp.concatenate(l_rows),
            jnp.concatenate(u_rows), jnp.concatenate(c_rows))


def num_qp_rows(nlp: Nlp) -> int:
    """Total QP constraint rows: cnt rows + abs/hinge cost rows + n box rows."""
    m_cnt = sum(t.n_rows for t in nlp.cnt_sets)
    m_pen = sum(t.n_rows for t in nlp.cost_sets
                if t.kind in nlp_mod.PENALTY_COST_KINDS)
    return m_cnt + m_pen + nlp.n


def make_solver(nlp: Nlp, params_spec: Any = None, sqp: SQPParams = SQPParams(),
                callback=None, structured: bool = False):
    """Build ``solve(x0, lb, ub, params) -> SQPResult`` for a fixed problem
    structure.  The returned function is jit/vmap friendly: batch problems
    by vmapping over (x0, lb, ub, params).

    ``callback(iteration, x, cost_vals, cnt_viols, merit_coeffs, box_size)``
    is invoked once per SQP iteration (the callCallbacks hook,
    optimizers.cpp:119-125); use
    :func:`trajopt_tpu.callbacks.make_iteration_callback` to run host code.

    ``structured=True`` uses the banded ADMM path (qp/admm_structured.py):
    constraint rows stream as step-local windows instead of a dense A.
    Requires every cnt / abs-hinge-cost set to provide ``banded_jac``.
    """

    n = nlp.n
    if sqp.qp_algorithm not in ("admm", "ipm"):
        raise ValueError(f"unknown qp_algorithm {sqp.qp_algorithm!r}")
    if sqp.qp_algorithm == "ipm" and structured:
        raise ValueError("qp_algorithm='ipm' supports the dense path only "
                         "(the banded/block streams are ADMM-specific)")
    n_cost = nlp.num_cost_sets
    # Merit units: one per constraint group (per step/gap for collision
    # sets), matching the reference's one-Constraint-per-step hatching.
    n_cnt = nlp_mod.num_cnt_groups(nlp)
    m_total = num_qp_rows(nlp)
    use_block = False
    if structured:
        if not nlp_mod.supports_structured(nlp):
            missing = [t.name for t in nlp_mod.structured_sets(nlp)
                       if t.banded_jac is None]
            raise ValueError(
                f"structured=True requires banded_jac on all constraint/"
                f"penalty sets; missing on {missing}")
        _starts_all, _band_w = nlp_mod.structured_band(nlp)
        m_banded = int(_starts_all.shape[0])
        m_total = m_banded + n
        # Prefer the gather-free block-banded path (11.6x faster ADMM
        # iterations than dense, vs 3x SLOWER for the gather form); fall
        # back to gather-banded when the layout isn't step-aligned.
        if nlp.block is not None:
            from trajopt_tpu.qp import block_banded as _bb
            from trajopt_tpu.qp.admm_block import (BlockQP, prepare_qp_block,
                                                   solve_qp_block_prepared)
            try:
                _plan = _bb.make_plan(_starts_all, _band_w, nlp.block[0],
                                      nlp.block[1])
                use_block = True
                m_blk = _plan.m_blk
                m_total = m_blk + n
            except ValueError:
                use_block = False
        if not use_block:
            from trajopt_tpu.qp import banded as _bd
            from trajopt_tpu.qp.admm_structured import (
                StructuredQP, solve_qp_structured)

    def build_qp(model: ConvexModel, merit_coeffs, lb_box, ub_box, dtype) -> QPData:
        A_pen, l_pen, u_pen, c_pen = _penalty_cost_rows(nlp, model, dtype)
        A = jnp.concatenate([model.A_cnt, A_pen, jnp.eye(n, dtype=dtype)])
        # Constraint rows bound a(x) = A x + b in [l, u]  ->  z = A x in
        # [l - b, u - b].
        l = jnp.concatenate([model.l_cnt - model.b_cnt, l_pen, lb_box])
        u = jnp.concatenate([model.u_cnt - model.b_cnt, u_pen, ub_box])
        c = jnp.concatenate([
            _cnt_row_coeffs(nlp, merit_coeffs, dtype),
            c_pen,
            jnp.full((n,), jnp.inf, dtype),
        ])
        return QPData(P=model.P, q=model.q, A=A, l=l, u=u, c=c)

    def merit(cost_vals, cnt_viols, merit_coeffs):
        return jnp.sum(cost_vals) + jnp.sum(merit_coeffs * cnt_viols)

    def escalation_row_ratio(old_coeffs, new_coeffs, dtype):
        """Per-QP-row (dual rescale factor, old weight) for a merit-
        coefficient change; ratio is 1.0 on rows whose weight didn't
        change (unescalated groups, penalty-cost rows, box rows).
        Matches the carried-y row layout of whichever QP path is
        active."""
        if structured:
            old = _structured_cnt_coeffs(nlp, old_coeffs, dtype)
            new = _structured_cnt_coeffs(nlp, new_coeffs, dtype)
            r = jnp.where(old > 0, new / jnp.maximum(old, 1e-30), 1.0)
            if use_block:
                r = _bb.to_block(r, _plan, 1.0)
                old = _bb.to_block(old, _plan, 0.0)
        else:
            old = _cnt_row_coeffs(nlp, old_coeffs, dtype)
            new = _cnt_row_coeffs(nlp, new_coeffs, dtype)
            r = jnp.where(old > 0, new / jnp.maximum(old, 1e-30), 1.0)
        pad = m_total - r.shape[0]
        return (jnp.concatenate([r, jnp.ones((pad,), dtype)]),
                jnp.concatenate([old, jnp.zeros((pad,), dtype)]))

    def _block_prepare(model: ConvexModel, merit_coeffs, x, dtype, minv0=None):
        """Assemble the box-independent block QP and equilibrate + factor it
        once per SQP step (every trust-region QP of the step reuses it)."""
        row_c = jnp.where(
            model.is_pen, model.pen_w,
            _structured_cnt_coeffs(nlp, merit_coeffs, dtype))
        inf = jnp.asarray(jnp.inf, dtype)
        blk_qp = BlockQP(
            P=model.P, q=model.q,
            C=_bb.from_rows(model.W, _plan),
            l=_bb.to_block(model.l - model.b, _plan, -inf),
            u=_bb.to_block(model.u - model.b, _plan, inf),
            c=_bb.to_block(row_c, _plan, 0.0),
            lb=x, ub=x)  # placeholders; real box bounds per trust iteration
        return prepare_qp_block(blk_qp, cfg=sqp.qp, minv0=minv0)

    def solve(x0: jax.Array, lb: jax.Array, ub: jax.Array, params: Any) -> SQPResult:
        dtype = x0.dtype
        # getClosestFeasiblePoint (modeling.cpp:260): box-only projection.
        x0 = jnp.clip(x0, lb, ub)

        # Multi-start restart family (opt-in): params["restart_inits"]
        # carries R alternative trajectories [R, n] (any leading shape
        # reshapes to [R, n]).  The LAST R second-chance restarts re-seed
        # x from this family instead of restarting the penalty schedule
        # in place — in-place restarts cannot escape goal-violating
        # local minima of the init family (ROADMAP "Hard-mix
        # convergence": the 2 residual borderline lanes).  Presence of
        # the key is a trace-time decision; absent -> zero overhead.
        r_inits = None
        if isinstance(params, dict) and params.get("restart_inits") is not None:
            r_inits = jnp.reshape(
                jnp.asarray(params["restart_inits"], dtype), (-1, n))

        jac_cache0 = nlp_mod.linear_jacobians(nlp, n, params, dtype)
        if structured and use_block and sqp.qp.ns_refresh:
            # Seed the carried KKT inverse with one Cholesky factorization
            # at the initial convexification; every later SQP step refreshes
            # it by Newton-Schulz (qp/inverse.py).  (Round-5 negative
            # result: seeding with the identity instead — saving this
            # init prepare — costs MORE net: the first step's inexact NS
            # inverse degrades its QP and the hard-mix line pays 24%,
            # headline ~9%.)
            model0 = nlp_mod.convexify_structured(nlp, x0, params, jac_cache0)
            minv_init = _block_prepare(
                model0, jnp.full((n_cnt,), sqp.initial_merit_error_coeff,
                                 dtype),
                x0, dtype).Minv
        else:
            minv_init = jnp.zeros((0, 0), dtype)

        init = _State(
            x=x0,
            cost_vals=nlp_mod.eval_exact_costs(nlp, x0, params),
            cnt_viols=nlp_mod.eval_exact_cnt_viols(nlp, x0, params),
            merit_coeffs=jnp.full((n_cnt,), sqp.initial_merit_error_coeff, dtype),
            box_size=jnp.asarray(sqp.initial_trust_box_size, dtype),
            merit_increases=jnp.asarray(0, jnp.int32),
            iter_in_round=jnp.asarray(0, jnp.int32),
            restarts_used=jnp.asarray(0, jnp.int32),
            total_iter=jnp.asarray(0, jnp.int32),
            status=jnp.asarray(SQPStatus.RUNNING, jnp.int32),
            n_qp_solves=jnp.asarray(0, jnp.int32),
            n_func_evals=jnp.asarray(1, jnp.int32),
            z=jnp.zeros((m_total,), dtype),
            y=jnp.zeros((m_total,), dtype),
            minv=minv_init,
        )

        def trust_loop(state: _State, model: ConvexModel,
                       prep=None) -> _TrustState:
            old_merit = merit(state.cost_vals, state.cnt_viols, state.merit_coeffs)

            def cond(ts: _TrustState):
                # Bounded by box shrink like the reference's inner while
                # (optimizers.cpp:811), plus the static max_trust_iter cap
                # (a compile-time bound on QP solves per convexification).
                return ((~ts.done) & (ts.box_size >= sqp.min_trust_box_size)
                        & (ts.n_qp_solves - state.n_qp_solves
                           < sqp.max_trust_iter))

            def body(ts: _TrustState) -> _TrustState:
                # Trust box = var bounds clamped around the current iterate
                # (setTrustBoxConstraints, optimizers.cpp:151-170).
                lb_box = jnp.maximum(lb, state.x - ts.box_size)
                ub_box = jnp.minimum(ub, state.x + ts.box_size)
                if structured and use_block:
                    res = solve_qp_block_prepared(
                        prep, lb_box, ub_box, ts.x,
                        zc0=ts.z[:m_blk], zb0=ts.z[m_blk:],
                        yc0=ts.y[:m_blk], yb0=ts.y[m_blk:],
                        cfg=sqp.qp)
                elif structured:
                    row_c = jnp.where(
                        model.is_pen, model.pen_w,
                        _structured_cnt_coeffs(nlp, state.merit_coeffs, dtype))
                    sqp_qp = StructuredQP(
                        P=model.P, q=model.q,
                        C=_bd.make_banded(model.W, _starts_all, n),
                        l=model.l - model.b, u=model.u - model.b,
                        c=row_c, lb=lb_box, ub=ub_box)
                    res = solve_qp_structured(
                        sqp_qp, ts.x,
                        zc0=ts.z[:m_banded], zb0=ts.z[m_banded:],
                        yc0=ts.y[:m_banded], yb0=ts.y[m_banded:],
                        cfg=sqp.qp)
                elif sqp.qp_algorithm == "ipm":
                    from trajopt_tpu.qp.ipm import IPMConfig, solve_qp_ipm
                    qp = build_qp(model, state.merit_coeffs, lb_box, ub_box,
                                  dtype)
                    # dtype is known at trace time: f32 (TPU) cannot reach
                    # 1e-8 KKT residuals — run the barrier to its f32 floor.
                    if dtype == jnp.float32:
                        ipm_cfg = IPMConfig(eps=max(1e-5, sqp.qp.eps_abs),
                                            eps_res=1e-3, reg=1e-7)
                    else:
                        ipm_cfg = IPMConfig(eps=min(1e-8, sqp.qp.eps_abs))
                    res = solve_qp_ipm(qp, ts.x, cfg=ipm_cfg)
                else:
                    qp = build_qp(model, state.merit_coeffs, lb_box, ub_box,
                                  dtype)
                    res = solve_qp(qp, ts.x, z0=ts.z, y0=ts.y, cfg=sqp.qp)
                new_x = res.x
                qp_bad = ~jnp.all(jnp.isfinite(new_x))

                if structured:
                    model_cost = nlp_mod.structured_model_cost_total(
                        nlp, model, new_x)
                    model_viols = nlp_mod.structured_model_cnt_viols(
                        nlp, model, new_x)
                else:
                    model_cost = nlp_mod.model_cost_total(nlp, model, new_x)
                    model_viols = nlp_mod.eval_model_cnt_viols(nlp, model, new_x)
                model_merit = model_cost + jnp.sum(state.merit_coeffs * model_viols)

                new_cost_vals = nlp_mod.eval_exact_costs(nlp, new_x, params)
                new_cnt_viols = nlp_mod.eval_exact_cnt_viols(nlp, new_x, params)
                new_merit = merit(new_cost_vals, new_cnt_viols, state.merit_coeffs)

                approx_improve = old_merit - model_merit
                exact_improve = old_merit - new_merit
                ratio = exact_improve / approx_improve

                exact_bad = ~jnp.isfinite(new_merit)

                small = approx_improve < sqp.min_approx_improve
                small |= (approx_improve / old_merit) < sqp.min_approx_improve_frac
                accept = (~small) & (exact_improve > 0) & \
                    (ratio >= sqp.improve_ratio_threshold) & (~exact_bad)
                shrink = (~small) & (~accept)

                # --- QP failure path (optimizers.cpp:817-842) ---
                fails = ts.qp_fails + qp_bad.astype(jnp.int32)
                last_try = fails >= sqp.max_qp_solver_failures
                box_on_fail = jnp.where(
                    fails == sqp.max_qp_solver_failures - 1,
                    jnp.asarray(sqp.min_trust_box_size, dtype),
                    ts.box_size * sqp.trust_shrink_ratio,
                )

                new_box = jnp.where(
                    accept, ts.box_size * sqp.trust_expand_ratio,
                    jnp.where(shrink, ts.box_size * sqp.trust_shrink_ratio,
                              ts.box_size),
                )

                def pick(on_ok, on_fail):
                    return jnp.where(qp_bad, on_fail, on_ok)

                outcome = pick(
                    jnp.where(small, _CONVERGED_SMALL,
                              jnp.where(accept, _ACCEPTED, _SHRINKING)),
                    jnp.where(last_try, _QP_FAILED, _SHRINKING),
                )
                done = pick(small | accept, last_try)
                box = pick(new_box, box_on_fail)

                take = accept & ~qp_bad
                return _TrustState(
                    box_size=box.astype(dtype),
                    done=done,
                    outcome=outcome.astype(jnp.int32),
                    qp_fails=fails,
                    x=jnp.where(take, new_x, ts.x),
                    cost_vals=jnp.where(take, new_cost_vals, ts.cost_vals),
                    cnt_viols=jnp.where(take, new_cnt_viols, ts.cnt_viols),
                    n_qp_solves=ts.n_qp_solves + 1,
                    n_func_evals=ts.n_func_evals + 1,
                    z=jnp.where(qp_bad, ts.z, res.z),
                    y=jnp.where(qp_bad, ts.y, res.y),
                )

            ts0 = _TrustState(
                box_size=state.box_size,
                done=jnp.asarray(False),
                outcome=jnp.asarray(_SHRINKING, jnp.int32),
                qp_fails=jnp.asarray(0, jnp.int32),
                x=state.x,
                cost_vals=state.cost_vals,
                cnt_viols=state.cnt_viols,
                n_qp_solves=state.n_qp_solves,
                n_func_evals=state.n_func_evals,
                z=state.z,
                y=state.y,
            )
            return jax.lax.while_loop(cond, body, ts0)

        # Constant Jacobians of affine terms, hoisted out of the loop
        # (loop-invariant values XLA keeps resident; XLA CSEs this with the
        # init-time computation above).
        jac_cache = jac_cache0

        def sqp_step(state: _State) -> _State:
            stop = None
            if callback is not None:
                # SQPCallback::execute semantics: a callback may return an
                # abort flag (False/True -> stop); plain logging callbacks
                # return None (trajopt_sqp/sqp_callback.h; kStoppedByCallback
                # types.h:224).
                stop = callback(state.total_iter, state.x, state.cost_vals,
                                state.cnt_viols, state.merit_coeffs,
                                state.box_size)
            if structured:
                model = nlp_mod.convexify_structured(nlp, state.x, params,
                                                     jac_cache)
            else:
                model = nlp_mod.convexify(nlp, state.x, params, jac_cache)
            prep = None
            new_minv = state.minv
            if structured and use_block:
                prep = _block_prepare(
                    model, state.merit_coeffs, state.x, dtype,
                    minv0=state.minv if sqp.qp.ns_refresh else None)
                if sqp.qp.ns_refresh:
                    new_minv = prep.Minv
            ts = trust_loop(state, model, prep)

            if n_cnt == 0:
                max_viol = jnp.asarray(0.0, dtype)
            else:
                max_viol = jnp.max(ts.cnt_viols)
            viols_satisfied = max_viol < sqp.cnt_tolerance

            iter_next = state.iter_in_round + 1
            hit_iter_limit = iter_next >= sqp.max_iter

            # "converged" paths -> penalty adjustment (optimizers.cpp:938-968)
            conv = (ts.outcome == _CONVERGED_SMALL) | \
                (ts.box_size < sqp.min_trust_box_size)
            qp_failed = ts.outcome == _QP_FAILED

            # Penalty adjustment outcome
            pen_done_ok = conv & viols_satisfied
            last_round = state.merit_increases + 1 >= sqp.max_merit_coeff_increases
            pen_escalate = conv & (~viols_satisfied)
            pen_exhausted = pen_escalate & last_round
            # Second-chance restart (SQPParams.max_restarts): a fresh
            # penalty schedule from the current iterate instead of
            # terminating with PENALTY_ITERATION_LIMIT.
            restart = pen_exhausted & (state.restarts_used < sqp.max_restarts)
            pen_exhausted = pen_exhausted & (~restart)

            if sqp.inflate_constraints_individually and n_cnt > 0:
                inflated = jnp.where(
                    ts.cnt_viols > sqp.cnt_tolerance,
                    state.merit_coeffs * sqp.merit_coeff_increase_ratio,
                    state.merit_coeffs,
                )
            else:
                inflated = state.merit_coeffs * sqp.merit_coeff_increase_ratio
            new_merit_coeffs = jnp.where(pen_escalate, inflated, state.merit_coeffs)
            new_merit_coeffs = jnp.where(
                restart, jnp.asarray(sqp.restart_merit_coeff, dtype),
                new_merit_coeffs)

            # Box reset on penalty escalation (optimizers.cpp:967; or the
            # full reset to the initial size when box_reset_to_initial —
            # a collapsed box otherwise pins the next round near the
            # current iterate, see SQPParams)
            if sqp.box_reset_to_initial:
                box_reset = jnp.asarray(sqp.initial_trust_box_size, dtype)
            else:
                box_reset = jnp.maximum(
                    ts.box_size,
                    sqp.min_trust_box_size / sqp.trust_shrink_ratio * 1.5,
                )
            new_box = jnp.where(pen_escalate, box_reset, ts.box_size)
            new_box = jnp.where(
                restart, jnp.asarray(sqp.initial_trust_box_size, dtype),
                new_box)

            # Dual warm-start rescale on coefficient change (see
            # SQPParams.rescale_duals_on_escalation).  Only SATURATED
            # rows scale: at an L1 optimum a still-violated row's dual
            # equals its weight c (scales with c), while an active-but-
            # satisfied row's dual is interior (does not) — rescaling
            # those overshoots and measurably degrades truncated QPs.
            new_y = ts.y
            if sqp.rescale_duals_on_escalation and n_cnt > 0:
                ratio, c_old = escalation_row_ratio(state.merit_coeffs,
                                                    new_merit_coeffs, dtype)
                saturated = jnp.abs(ts.y) >= 0.9 * c_old
                ratio = jnp.where(saturated & (c_old > 0), ratio, 1.0)
                new_y = jnp.where(pen_escalate | restart, ts.y * ratio, ts.y)

            # Multi-start restart: the last R restarts re-seed x from the
            # caller's family (see solve() above).  Earlier restarts stay
            # in place (cheap; recovers dual-starved lanes without
            # discarding progress).  A re-seeded lane gets fresh duals
            # and exact evals at the new iterate; the carried KKT inverse
            # is refreshed by the next step's Newton-Schulz prepare.
            new_x = ts.x
            new_cost_vals = ts.cost_vals
            new_cnt_viols = ts.cnt_viols
            new_z = ts.z
            n_fev = ts.n_func_evals
            if r_inits is not None:
                n_family = r_inits.shape[0]
                j0 = max(0, sqp.max_restarts - n_family)
                use_alt = restart & (state.restarts_used >= j0)
                k = jnp.clip(state.restarts_used - j0, 0, n_family - 1)
                alt = jnp.clip(r_inits[k], lb, ub)
                new_x = jnp.where(use_alt, alt, ts.x)
                new_cost_vals = jnp.where(
                    use_alt, nlp_mod.eval_exact_costs(nlp, new_x, params),
                    ts.cost_vals)
                new_cnt_viols = jnp.where(
                    use_alt, nlp_mod.eval_exact_cnt_viols(nlp, new_x, params),
                    ts.cnt_viols)
                new_z = jnp.where(use_alt, jnp.zeros_like(ts.z), ts.z)
                new_y = jnp.where(use_alt, jnp.zeros_like(new_y), new_y)
                n_fev = n_fev + use_alt.astype(jnp.int32)

            # Iteration limit exits the whole solve (optimizers.cpp:922-934)
            iter_exit = (~conv) & (~qp_failed) & hit_iter_limit

            status = state.status
            status = jnp.where(qp_failed, SQPStatus.FAILED, status)
            status = jnp.where(pen_done_ok, SQPStatus.CONVERGED, status)
            status = jnp.where(pen_exhausted, SQPStatus.PENALTY_ITERATION_LIMIT,
                               status)
            status = jnp.where(
                iter_exit,
                jnp.where(viols_satisfied, SQPStatus.CONVERGED,
                          SQPStatus.SCO_ITERATION_LIMIT),
                status,
            )

            new_state = _State(
                x=new_x,
                cost_vals=new_cost_vals,
                cnt_viols=new_cnt_viols,
                merit_coeffs=new_merit_coeffs,
                box_size=new_box.astype(dtype),
                merit_increases=jnp.where(
                    restart, 0,
                    state.merit_increases + pen_escalate.astype(jnp.int32)),
                iter_in_round=jnp.where(pen_escalate | restart, 0, iter_next),
                restarts_used=state.restarts_used + restart.astype(jnp.int32),
                total_iter=state.total_iter + 1,
                status=status.astype(jnp.int32),
                n_qp_solves=ts.n_qp_solves,
                n_func_evals=n_fev,
                z=new_z,
                y=new_y,
                minv=new_minv,
            )
            if stop is None:
                return new_state
            # Abort before the step takes effect (the reference checks its
            # callbacks at the top of the SQP iteration).
            stopped = state._replace(
                status=jnp.asarray(SQPStatus.STOPPED_BY_CALLBACK, jnp.int32),
                total_iter=state.total_iter + 1,
            )
            pick = lambda a, b: jnp.where(stop, a, b)  # noqa: E731
            return jax.tree.map(pick, stopped, new_state)

        final = jax.lax.while_loop(
            lambda s: s.status == SQPStatus.RUNNING, sqp_step, init
        )
        return SQPResult(
            x=final.x,
            status=final.status,
            cost_vals=final.cost_vals,
            cnt_viols=final.cnt_viols,
            total_cost=jnp.sum(final.cost_vals),
            merit_coeffs=final.merit_coeffs,
            box_size=final.box_size,
            n_iter=final.total_iter,
            n_qp_solves=final.n_qp_solves,
            n_func_evals=final.n_func_evals,
        )

    return solve
