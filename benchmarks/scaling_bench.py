"""Scaling-efficiency harness: throughput at 1..N mesh devices.

BASELINE.json asks for >= 0.8 scaling efficiency at 2+ hosts.  Only one
real TPU chip is attached in CI, so this harness measures the DATA-PARALLEL
scaling path (parallel/mesh.py: batch dim sharded over the mesh, solves
independent, collectives only in the metric reduction) on a virtual
8-device CPU mesh — the same code path a v5e-16 runs, with device count as
the only variable.  On real multi-chip hardware run it unmodified with
JAX_PLATFORMS unset.

Prints one JSON line per device count plus a final efficiency line:
  {"metric": "scaling efficiency (8 dev vs 1)", "value": ..., ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402

# Decide the platform BEFORE any backend initialization (calling
# jax.devices()/default_backend() first would pin the axon backend).
if os.environ.get("SCALE_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _solver_params
    from trajopt_tpu.models.benchmarks import arm_table_batch, arm_table_problem
    from trajopt_tpu.parallel.mesh import (data_parallel_mesh,
                                           make_sharded_batch_solver,
                                           summarize)

    n_steps = int(os.environ.get("SCALE_STEPS", "10"))
    virtual = jax.default_backend() == "cpu"
    devices = jax.devices()
    prob, _ = arm_table_problem(n_steps=n_steps)
    counts = [c for c in (1, 2, 4, 8) if c <= len(devices)]
    # On REAL hardware: weak scaling (batch grows with devices) — the
    # BASELINE.json efficiency.  On the VIRTUAL CPU mesh the "devices"
    # share the same physical cores, so weak scaling is meaningless;
    # instead hold the TOTAL batch fixed, which isolates the pure
    # sharding/partitioning overhead on equal silicon.
    per_dev = int(os.environ.get("SCALE_PER_DEV", "8"))
    B_fixed = per_dev * counts[-1]
    rates = {}
    for c in counts:
        mesh = data_parallel_mesh(devices[:c])
        solve = make_sharded_batch_solver(prob, mesh, _solver_params())
        B = B_fixed if virtual else per_dev * c
        inits, goals = arm_table_batch(jax.random.PRNGKey(0), B, n_steps)
        res = solve(inits, {"goal": goals})
        _ = np.asarray(res.status)  # compile + warmup
        ts = []
        for r in range(3):
            i_r, g_r = arm_table_batch(jax.random.PRNGKey(r + 1), B, n_steps)
            t0 = time.perf_counter()
            res = solve(i_r, {"goal": g_r})
            _ = np.asarray(res.status)
            ts.append(time.perf_counter() - t0)
        stats = summarize(res)
        rate = stats["converged"] / min(ts)
        rates[c] = rate
        print(json.dumps({
            "metric": f"solves/s on {c} device(s), B={B}",
            "value": round(rate, 2), "unit": "solves/s",
            "converged": stats["converged"], "n": stats["n"]}))
    if len(counts) > 1:
        c_hi = counts[-1]
        if virtual:
            eff = rates[c_hi] / rates[1]
            metric = (f"sharding-overhead efficiency ({c_hi} virtual dev vs "
                      f"1, fixed B={B_fixed}; virtual devices share cores — "
                      "weak scaling needs real chips)")
        else:
            eff = rates[c_hi] / (rates[1] * c_hi)
            metric = f"weak-scaling efficiency ({c_hi} dev vs 1)"
        print(json.dumps({"metric": metric, "value": round(eff, 3),
                          "unit": "ratio", "target": 0.8}))


if __name__ == "__main__":
    main()
