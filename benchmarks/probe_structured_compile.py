"""Component-level TPU compile-time probe for the structured cast path.

Round-3 found a 1905 s TPU compile for the cast flagship with
structured=True (dense: ~90-175 s).  This probe times jit-compiles of the
pipeline pieces separately on the real device to localize the pathology:

  1. convexify_structured (banded Jacobian assembly, narrowphase)
  2. prepare_qp_block      (Ruiz + at_r_a + Cholesky inverse)
  3. solve_qp_block_prepared (the ADMM while-loop)
  4. one full sqp solve

Usage: python benchmarks/probe_structured_compile.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")
from trajopt_tpu.utils.profiling import machine_cache_dir  # noqa: E402

if os.environ.get("PROBE_NO_CACHE", "0") != "1":
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     machine_cache_dir("jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_compile(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    print(f"{name}: trace+lower {t1 - t0:.1f}s  compile {t2 - t1:.1f}s",
          flush=True)
    return compiled


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    full_only = os.environ.get("PROBE_FULL_ONLY", "0") == "1"
    from trajopt_tpu.models.benchmarks import (pr2ish_table_batch,
                                               pr2ish_table_problem)
    from trajopt_tpu.sqp import nlp as nlp_mod
    from trajopt_tpu.qp import block_banded as bb
    from trajopt_tpu.qp.admm_block import (BlockQP, prepare_qp_block,
                                           solve_qp_block_prepared)
    from __graft_entry__ import _solver_params

    prob, scene = pr2ish_table_problem(
        n_steps=30,
        unify_narrowphase=os.environ.get("PROBE_UNIFY", "0") == "1")
    nlp = prob.build()
    sqp = _solver_params()
    n = nlp.n
    T = 30
    D = n // T
    starts, w = nlp_mod.structured_band(nlp)
    plan = bb.make_plan(starts, w, T, D)
    print(f"batch={batch} n={n} m={len(starts)} w={w} K={plan.K} "
          f"R={plan.R} m_blk={plan.m_blk}", flush=True)

    inits, goals = pr2ish_table_batch(jax.random.PRNGKey(0), batch, 30)
    x0 = jnp.asarray(inits.reshape(batch, -1), jnp.float32)
    dtype = jnp.float32

    if full_only:
        _full(prob, sqp, inits, goals, batch)
        return

    # 1. convexify_structured
    def conv(x, g):
        jc = nlp_mod.linear_jacobians(nlp, n, {"goal": g}, dtype)
        return nlp_mod.convexify_structured(nlp, x, {"goal": g}, jc)

    cfn = bench_compile("convexify_structured",
                        jax.vmap(conv), x0, goals)
    model = cfn(x0, goals)
    jax.block_until_ready(model.P)

    # 2. prepare_qp_block
    coeffs = jnp.full((batch, plan.m_blk,), 10.0, dtype)

    def mk_blk(m, c):
        cblk = bb.to_block(
            jnp.where(m.is_pen, m.pen_w,
                      jnp.full((plan.m,), 10.0, dtype)), plan)
        return BlockQP(P=m.P, q=m.q, C=bb.from_rows(m.W, plan),
                       l=bb.to_block(m.l - m.b, plan, fill=-jnp.inf),
                       u=bb.to_block(m.u - m.b, plan, fill=jnp.inf),
                       c=cblk,
                       lb=jnp.full((n,), -10.0, dtype),
                       ub=jnp.full((n,), 10.0, dtype))

    def prep_fn(m, c):
        return prepare_qp_block(mk_blk(m, c), cfg=sqp.qp)

    pfn = bench_compile("prepare_qp_block", jax.vmap(prep_fn),
                        model, coeffs)
    prep = pfn(model, coeffs)
    jax.block_until_ready(prep.Minv)

    # 3. prepare + solve fused (vmapping the PreparedBlockQP directly
    # would batch the static plan ints inside BlockBanded)
    def solve_fn(m, c, x):
        p = prepare_qp_block(mk_blk(m, c), cfg=sqp.qp)
        return solve_qp_block_prepared(
            p, jnp.full((n,), -10.0, dtype), jnp.full((n,), 10.0, dtype),
            x, cfg=sqp.qp)

    sfn = bench_compile("prepare+solve_qp_block", jax.vmap(solve_fn),
                        model, coeffs, x0)
    res = sfn(model, coeffs, x0)
    jax.block_until_ready(res.x)
    print(f"   admm iters {np.asarray(res.iters)[:4]} "
          f"conv {np.asarray(res.converged)[:4]}", flush=True)

    # 4. full solve
    _full(prob, sqp, inits, goals, batch)


def _full(prob, sqp, inits, goals, batch):
    solve = prob.make_solve(sqp, structured=True)
    t0 = time.time()
    full = jax.jit(jax.vmap(lambda i, g: solve(i, {"goal": g})))
    lowered = full.lower(inits, goals)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    print(f"full structured solve B={batch}: trace+lower {t1 - t0:.1f}s "
          f"compile {t2 - t1:.1f}s", flush=True)
    r = compiled(inits, goals)
    jax.block_until_ready(r.x)
    conv = int((np.asarray(r.status) == 1).sum())
    t0 = time.time()
    r = compiled(inits, goals)
    _ = np.asarray(r.x)
    t_run = time.time() - t0
    print(f"   converged {conv}/{batch}  run {t_run:.3f}s "
          f"({conv / t_run:.1f} solves/s)", flush=True)


if __name__ == "__main__":
    main()
