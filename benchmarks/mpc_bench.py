"""Batched-MPC bench: thousands of receding-horizon cast-collision
controllers on one chip — the single-chip slice of BASELINE.json's
'Batched MPC: 4096 randomized scenes/goals, receding-horizon re-solve'
config (the multi-host spread is the same program sharded over a dp
mesh, parallel/mesh.py; CI has one chip).

Each control cycle runs ONE jitted program: shift every lane's plan one
step, pin the new start, warm-start re-solve (problem/mpc.py
make_mpc_step), goals drifting per cycle.  Reports re-solves/s and the
converged fraction per cycle.

Usage: python benchmarks/mpc_bench.py [batch] [cycles]
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                                 machine_cache_dir("jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from trajopt_tpu.models.benchmarks import (pr2ish_table_batch,
                                               pr2ish_table_problem)
    from trajopt_tpu.problem.mpc import make_mpc_step
    from __graft_entry__ import _solver_params

    n_steps = 30
    prob, scene = pr2ish_table_problem(
        n_steps=n_steps, lvs_substeps=int(os.environ.get("BENCH_LVS", "2")))
    # diverged-lane warm-start repair (MPC_REINIT=0 to disable): fresh
    # straight-line re-seed stops the monotone convergence decay under
    # accumulated goal drift
    reinit = "goal" if os.environ.get("MPC_REINIT", "1") == "1" else None
    step = jax.jit(jax.vmap(
        make_mpc_step(prob, _solver_params(), structured=True,
                      reinit_goal_key=reinit),
        in_axes=(0, {"goal": 0})))

    inits, goals = pr2ish_table_batch(jax.random.PRNGKey(3), batch, n_steps)
    trajs = jnp.asarray(inits, jnp.float32)
    # slow goal drift per control cycle (a receding-horizon target being
    # tracked); large accumulated drift walks goals off the feasible
    # manifold and convergence decays (measured: 0.01/cycle loses ~18%
    # of lanes by cycle 7) — drift amplitude is a workload knob
    drift_amp = float(os.environ.get("MPC_DRIFT", "0.004"))
    drift = drift_amp * jax.random.normal(jax.random.PRNGKey(5), goals.shape,
                                          jnp.float32)

    t0 = time.time()
    trajs2, res = step(trajs, {"goal": goals})
    jax.block_until_ready(trajs2)
    _ = np.asarray(res.status)
    print(f"# compile+first cycle: {time.time() - t0:.1f}s "
          f"(batch={batch})", flush=True)

    # batched goal-feasibility probe: min pair clearance at the goal
    # config (a lane whose drifted goal is in collision CANNOT converge
    # — its failures are workload, not solver)
    goal_clear = jax.jit(jax.vmap(lambda g: jnp.min(scene.distances(g))))

    rates = []
    for k in range(cycles):
        goals_k = goals + k * drift   # goals drift each control cycle
        t0 = time.time()
        trajs, res = step(trajs, {"goal": goals_k})
        jax.block_until_ready(trajs)
        st = np.asarray(res.status)
        dt = time.time() - t0
        conv = int((st == 1).sum())
        rates.append(conv / dt)
        bad = st != 1
        n_infeas = int((np.asarray(goal_clear(goals_k)) <= 0.0)[bad].sum()) \
            if bad.any() else 0
        print(f"# cycle {k}: {conv}/{batch} converged, {dt:.3f}s, "
              f"{conv / dt:.0f} re-solves/s, "
              f"mean_iter {np.asarray(res.n_iter).mean():.1f}, "
              f"{n_infeas}/{int(bad.sum())} failures have in-collision "
              f"goals", flush=True)

    import json
    print(json.dumps({
        "metric": "batched-MPC warm-start cast re-solves/s (1 chip)",
        "value": round(float(np.median(rates)), 1),
        "batch": batch,
        "cycles": cycles,
    }))


if __name__ == "__main__":
    main()
