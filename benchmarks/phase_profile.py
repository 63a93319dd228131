"""Phase-timing probe for the flagship bench: where does the ~420ms/batch go?

Direct timing of each phase is useless on the tunneled device (every call
pays ~60ms of dispatch + host-transfer latency), so each phase is timed as
the MARGINAL cost of extra iterations inside one jitted lax.scan:
t_phase = (t(K_hi) - t(K_lo)) / (K_hi - K_lo), with only a scalar
transferred back.

Run:  python benchmarks/phase_profile.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))  # set before import
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K_LO, K_HI = 2, 10


def _time(fn, *args, reps=4):
    r = fn(*args)
    _ = np.asarray(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        _ = np.asarray(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _marginal(make_scan, *args):
    """make_scan(k) -> jitted fn returning a scalar; marginal sec/iter."""
    t_lo = _time(make_scan(K_LO), *args)
    t_hi = _time(make_scan(K_HI), *args)
    return (t_hi - t_lo) / (K_HI - K_LO)


def main():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _solver_params
    from trajopt_tpu.models.benchmarks import (arm_table_batch,
                                               arm_table_problem,
                                               pr2ish_table_batch,
                                               pr2ish_table_problem)
    from trajopt_tpu.qp import block_banded as bb
    from trajopt_tpu.qp.admm_block import BlockQP, solve_qp_block
    from trajopt_tpu.sqp import nlp as nlp_mod
    from trajopt_tpu.sqp.solver import _structured_cnt_coeffs

    # PROFILE_WORKLOAD=cast profiles the pr2ish flagship; default arm7.
    workload = os.environ.get("PROFILE_WORKLOAD", "discrete")
    T = 30
    if workload == "cast":
        B = int(os.environ.get("BENCH_BATCH", "256"))
        sqp = _solver_params("cast")
        prob, _ = pr2ish_table_problem(n_steps=T)
        inits, goals = pr2ish_table_batch(jax.random.PRNGKey(0), B, T)
    else:
        B = int(os.environ.get("BENCH_BATCH", "96"))
        sqp = _solver_params("discrete")
        prob, _ = arm_table_problem(n_steps=T)
        inits, goals = arm_table_batch(jax.random.PRNGKey(0), B, T)
    nlp = prob.build()
    n = nlp.n
    dtype = jnp.float32
    x0 = inits.astype(dtype).reshape(B, -1)

    # --- full solve reference ---
    solve = prob.make_solve(sqp, structured=True)
    full = jax.jit(jax.vmap(lambda i, g: solve(i, {"goal": g})))

    def full_scalar(i, g):
        return np.asarray(full(i, g).status).sum()

    r = full_scalar(inits, goals)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        full_scalar(inits, goals)
        ts.append(time.perf_counter() - t0)
    t_full = min(ts)
    print(f"full solve batch          : {t_full*1e3:9.2f} ms  (status sum {r})")

    jac_cache = nlp_mod.linear_jacobians(nlp, n, {"goal": goals[0]}, dtype)
    merit_coeffs = jnp.full((nlp_mod.num_cnt_groups(nlp),), 10.0, dtype)
    starts_all, band_w = nlp_mod.structured_band(nlp)
    plan = bb.make_plan(starts_all, band_w, nlp.block[0], nlp.block[1])

    def leaf_norm(tree):
        return sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(tree)
                   if jnp.issubdtype(l.dtype, jnp.floating))

    # --- convexify_structured ---
    def mk_cvx(k):
        def one(x, g):
            def body(c, _):
                m = nlp_mod.convexify_structured(nlp, x + c * 1e-6, {"goal": g},
                                                 jac_cache)
                return leaf_norm(m) * 1e-9, None
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None, length=k)
            return c
        return jax.jit(lambda xs, gs: jnp.sum(jax.vmap(one)(xs, gs)))
    t_cvx = _marginal(mk_cvx, x0, goals)
    print(f"convexify_structured      : {t_cvx*1e3:9.2f} ms/call")

    # --- exact cost + violation eval ---
    def mk_exact(k):
        def one(x, g):
            def body(c, _):
                cv = nlp_mod.eval_exact_costs(nlp, x + c * 1e-6, {"goal": g})
                vv = nlp_mod.eval_exact_cnt_viols(nlp, x + c * 1e-6, {"goal": g})
                return (jnp.sum(cv) + jnp.sum(vv)) * 1e-9, None
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None, length=k)
            return c
        return jax.jit(lambda xs, gs: jnp.sum(jax.vmap(one)(xs, gs)))
    t_ex = _marginal(mk_exact, x0, goals)
    print(f"exact cost+viol eval      : {t_ex*1e3:9.2f} ms/call")

    # --- model merit eval ---
    cvx1 = jax.jit(jax.vmap(
        lambda x, g: nlp_mod.convexify_structured(nlp, x, {"goal": g},
                                                  jac_cache)))
    model = jax.block_until_ready(cvx1(x0, goals))

    def mk_model(k):
        def one(m, x):
            def body(c, _):
                mc = nlp_mod.structured_model_cost_total(nlp, m, x + c * 1e-6)
                mv = nlp_mod.structured_model_cnt_viols(nlp, m, x + c * 1e-6)
                return (mc + jnp.sum(mv)) * 1e-9, None
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None, length=k)
            return c
        return jax.jit(lambda ms, xs: jnp.sum(jax.vmap(one)(ms, xs)))
    t_mm = _marginal(mk_model, model, x0)
    print(f"model merit eval          : {t_mm*1e3:9.2f} ms/call")

    # --- QP solve at bench iteration settings ---
    def mk_qp(k):
        def one(m, x):
            row_c = jnp.where(m.is_pen, m.pen_w,
                              _structured_cnt_coeffs(nlp, merit_coeffs, dtype))
            inf = jnp.asarray(jnp.inf, dtype)
            qp = BlockQP(P=m.P, q=m.q, C=bb.from_rows(m.W, plan),
                         l=bb.to_block(m.l - m.b, plan, -inf),
                         u=bb.to_block(m.u - m.b, plan, inf),
                         c=bb.to_block(row_c, plan, 0.0),
                         lb=x - 0.1, ub=x + 0.1)

            def body(c, _):
                res = solve_qp_block(qp, x + c * 1e-6, cfg=sqp.qp)
                return jnp.sum(jnp.abs(res.x)) * 1e-9, None
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None, length=k)
            return c
        return jax.jit(lambda ms, xs: jnp.sum(jax.vmap(one)(ms, xs)))
    t_qp = _marginal(mk_qp, model, x0)
    print(f"QP solve (cold start)     : {t_qp*1e3:9.2f} ms/call")

    est = 7.8 * t_cvx + 9 * (t_ex + t_mm + t_qp)
    print(f"--- budget: 7.8*cvx + 9*(exact+model+qp) = {est*1e3:9.2f} ms "
          f"of {t_full*1e3:.2f} ms")


if __name__ == "__main__":
    main()
