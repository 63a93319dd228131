"""Host-side reference SQP driver: plain Python loop + native C++ QP.

Role: an independent execution path for trajectory-parity validation (the
reference validates across 4 QP backends, small-problems-unit.cpp:184; we
validate the jitted lax.while_loop solver against this straightforward
Python transcription of the same algorithm with the C++ ADMM backend).
Also useful for debugging: every iteration is steppable host code.

Shares convexification and evaluation with the JAX solver (same code, so
parity failures isolate the *loop/QP* logic, not the models).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from trajopt_tpu.qp.native import solve_qp_native
from trajopt_tpu.sqp import nlp as nlp_mod
from trajopt_tpu.sqp.nlp import Nlp
from trajopt_tpu.sqp.params import SQPParams, SQPStatus
from trajopt_tpu.sqp.solver import _penalty_cost_rows, _cnt_row_coeffs
from trajopt_tpu.utils.cache import LRUCache, joint_hash


@dataclasses.dataclass
class RefResult:
    x: np.ndarray
    status: int
    cost_vals: np.ndarray
    cnt_viols: np.ndarray
    n_iter: int
    n_qp_solves: int


def solve_reference(nlp: Nlp, x0, lb, ub, params: Any = None,
                    sqp: SQPParams = SQPParams()) -> RefResult:
    params = params or {}
    x = np.clip(np.asarray(x0, float).reshape(-1), lb, ub)
    n = nlp.n
    n_cnt = nlp_mod.num_cnt_groups(nlp)

    # Hash-keyed LRU over exact evaluations, the role the collision-result
    # cache plays in the reference's merit loop
    # (CollisionEvaluator::GetContactResultCached, collision_terms.cpp:440).
    _exact_cache = LRUCache(capacity=4)

    def exact(xv):
        def compute():
            xj = jnp.asarray(xv)
            return (np.asarray(nlp_mod.eval_exact_costs(nlp, xj, params)),
                    np.asarray(nlp_mod.eval_exact_cnt_viols(nlp, xj, params)))

        return _exact_cache.get_or_acquire(joint_hash(xv), compute)

    cost_vals, cnt_viols = exact(x)
    merit_coeffs = np.full(n_cnt, sqp.initial_merit_error_coeff)
    box = sqp.initial_trust_box_size
    n_qp = 0
    total_iter = 0
    import time as _time
    t_start = _time.monotonic()

    def merit(cv, viols, mc):
        return float(cv.sum() + (mc * viols).sum())

    for merit_round in range(sqp.max_merit_coeff_increases):
        converged_small = False
        for it in range(1, sqp.max_iter + 1):
            # Wall-clock budget (optimizers.cpp max_time check at the top
            # of each SQP iteration -> OPT_TIME_LIMIT).
            if _time.monotonic() - t_start > sqp.max_time:
                return RefResult(x, SQPStatus.TIME_LIMIT, cost_vals,
                                 cnt_viols, total_iter, n_qp)
            total_iter += 1
            xj = jnp.asarray(x)
            m = nlp_mod.convexify(nlp, xj, params)
            dtype = xj.dtype
            A_pen, l_pen, u_pen, c_pen = _penalty_cost_rows(nlp, m, dtype)
            A = np.concatenate([np.asarray(m.A_cnt), np.asarray(A_pen),
                                np.eye(n)])
            row_c = np.concatenate([
                np.asarray(_cnt_row_coeffs(nlp, jnp.asarray(merit_coeffs),
                                           dtype)),
                np.asarray(c_pen),
                np.full(n, np.inf)])
            old_merit = merit(cost_vals, cnt_viols, merit_coeffs)

            accepted = False
            while box >= sqp.min_trust_box_size:
                lb_box = np.maximum(lb, x - box)
                ub_box = np.minimum(ub, x + box)
                l = np.concatenate([np.asarray(m.l_cnt - m.b_cnt),
                                    np.asarray(l_pen), lb_box])
                u = np.concatenate([np.asarray(m.u_cnt - m.b_cnt),
                                    np.asarray(u_pen), ub_box])
                res = solve_qp_native(np.asarray(m.P), np.asarray(m.q), A,
                                      l, u, row_c, x0=x,
                                      eps_abs=sqp.qp.eps_abs,
                                      eps_rel=sqp.qp.eps_rel,
                                      max_iter=4 * sqp.qp.max_iter)
                n_qp += 1
                new_x = res.x
                xnj = jnp.asarray(new_x)
                model_cost = float(nlp_mod.model_cost_total(nlp, m, xnj))
                model_viols = np.asarray(
                    nlp_mod.eval_model_cnt_viols(nlp, m, xnj))
                model_merit = model_cost + float(
                    (merit_coeffs * model_viols).sum())
                new_cost, new_viols = exact(new_x)
                new_merit = merit(new_cost, new_viols, merit_coeffs)
                approx = old_merit - model_merit
                exact_imp = old_merit - new_merit
                if approx < sqp.min_approx_improve:
                    converged_small = True
                    break
                if exact_imp <= 0 or exact_imp / approx < sqp.improve_ratio_threshold:
                    box *= sqp.trust_shrink_ratio
                    continue
                x, cost_vals, cnt_viols = new_x, new_cost, new_viols
                box *= sqp.trust_expand_ratio
                accepted = True
                break

            if converged_small or box < sqp.min_trust_box_size:
                break
            if it >= sqp.max_iter:
                ok = cnt_viols.size == 0 or cnt_viols.max() < sqp.cnt_tolerance
                return RefResult(x, SQPStatus.CONVERGED if ok
                                 else SQPStatus.SCO_ITERATION_LIMIT,
                                 cost_vals, cnt_viols, total_iter, n_qp)

        if cnt_viols.size == 0 or cnt_viols.max() < sqp.cnt_tolerance:
            return RefResult(x, SQPStatus.CONVERGED, cost_vals, cnt_viols,
                             total_iter, n_qp)
        if sqp.inflate_constraints_individually:
            merit_coeffs = np.where(cnt_viols > sqp.cnt_tolerance,
                                    merit_coeffs * sqp.merit_coeff_increase_ratio,
                                    merit_coeffs)
        else:
            merit_coeffs *= sqp.merit_coeff_increase_ratio
        box = max(box, sqp.min_trust_box_size / sqp.trust_shrink_ratio * 1.5)

    return RefResult(x, SQPStatus.PENALTY_ITERATION_LIMIT, cost_vals,
                     cnt_viols, total_iter, n_qp)
