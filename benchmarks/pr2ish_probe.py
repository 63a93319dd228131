"""Probe: pr2ish cast-collision flagship throughput on the real chip.

Sweeps batch size for the cast workload so bench.py can adopt the winner.
Run: python benchmarks/pr2ish_probe.py [batches...]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update("jax_default_matmul_precision", "highest")
from trajopt_tpu.utils.profiling import machine_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                                 machine_cache_dir("jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from trajopt_tpu.models.benchmarks import (pr2ish_table_batch,
                                               pr2ish_table_problem)
    from trajopt_tpu.parallel.mesh import summarize
    from __graft_entry__ import _solver_params

    batches = [int(b) for b in sys.argv[1:]] or [64, 96, 128]
    n_steps = 30
    structured = os.environ.get("BENCH_STRUCTURED", "0") == "1"
    prob, scene = pr2ish_table_problem(n_steps=n_steps)
    if os.environ.get("BENCH_UNIFY", "0") == "1":
        # single-group GJK+SAT narrowphase (collision/world.py
        # unify_narrowphase) — compile-time lever
        scene.unify_narrowphase = True
        scene._groups_cache = None
        scene._swept_groups_cache = None
    solve = prob.make_solve(_solver_params(), structured=structured)
    fn = jax.jit(jax.vmap(lambda i, g: solve(i, {"goal": g})))

    for batch in batches:
        inits, goals = pr2ish_table_batch(jax.random.PRNGKey(0), batch,
                                          n_steps)
        t0 = time.time()
        res = fn(inits, goals)
        jax.block_until_ready(res)
        _ = np.asarray(res.status)
        compile_s = time.time() - t0
        times = []
        for r in range(3):
            i_r, g_r = pr2ish_table_batch(jax.random.PRNGKey(r + 1), batch,
                                          n_steps)
            t0 = time.time()
            res = fn(i_r, g_r)
            jax.block_until_ready(res)
            _ = np.asarray(res.status)
            times.append(time.time() - t0)
        stats = summarize(res)
        best = min(times)
        print(f"B={batch}: {stats['converged']}/{stats['n']} converged, "
              f"best={best:.3f}s -> {stats['converged']/best:.1f} solves/s "
              f"(compile {compile_s:.1f}s, mean_iter={stats['mean_iter']:.1f},"
              f" mean_qp={stats['mean_qp_solves']:.1f})", flush=True)


if __name__ == "__main__":
    main()
