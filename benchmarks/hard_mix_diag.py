"""Hard-mix failure diagnosis (VERDICT r4 item 1a).

Runs the borderline-goal cluster (the bench hard-mix lanes) through the
flagship cast solver and records, per lane:

  status code, n_iter, n_qp_solves, final max violation, WHICH constraint
  group is violated (goal vs collision, and which gap), final merit
  coeffs, box size, converged-vs-verified split.

Optionally sweeps solver knobs (BENCH_* env vars of __graft_entry__ plus
the DIAG_* overrides below) to find what recovers the failing lanes.

Usage (TPU):
  python benchmarks/hard_mix_diag.py                 # baseline diagnosis
  DIAG_MERIT_INC=8 python benchmarks/hard_mix_diag.py
  DIAG_MAX_ITER=50 DIAG_BOX_RESET=1 ...
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _solver_params
    from trajopt_tpu.models.benchmarks import (pr2ish_table_batch,
                                               pr2ish_table_problem)
    from trajopt_tpu.sqp.params import SQPStatus

    batch = int(os.environ.get("DIAG_BATCH", "64"))
    n_steps = 30
    sqp = _solver_params()
    over = {}
    if os.environ.get("DIAG_MERIT_INC"):
        over["max_merit_coeff_increases"] = int(os.environ["DIAG_MERIT_INC"])
    if os.environ.get("DIAG_MAX_ITER"):
        over["max_iter"] = int(os.environ["DIAG_MAX_ITER"])
    if os.environ.get("DIAG_INIT_COEFF"):
        over["initial_merit_error_coeff"] = float(os.environ["DIAG_INIT_COEFF"])
    if os.environ.get("DIAG_BOX_RESET"):
        over["box_reset_to_initial"] = True
    if os.environ.get("DIAG_RESTARTS"):
        over["max_restarts"] = int(os.environ["DIAG_RESTARTS"])
    if over:
        sqp = dataclasses.replace(sqp, **over)
    print(f"# overrides: {over}", file=sys.stderr)

    prob, scene = pr2ish_table_problem(n_steps=n_steps)
    solve = prob.make_solve(sqp, structured=True)

    # 100% borderline lanes (the bench's hard 25% fills the first quarter;
    # here every lane is hard so the failure set is dense).
    inits, goals = pr2ish_table_batch(jax.random.PRNGKey(7), batch, n_steps,
                                      hard_frac=1.0)
    if os.environ.get("DIAG_RESTART_FAMILY"):
        # Multi-start restart family (home -> easy goal -> hard goal
        # detour rows); needs max_restarts >= 2 to keep the in-place
        # first restart (DIAG_RESTARTS=2).
        from trajopt_tpu.models.benchmarks import pr2ish_restart_family
        fam = pr2ish_restart_family(
            goals, n_steps,
            rows=int(os.environ.get("DIAG_FAMILY_ROWS", "1")))
        base_fn = jax.jit(jax.vmap(
            lambda i, g, r: solve(i, {"goal": g, "restart_inits": r})))
        fn = lambda i, g: base_fn(i, g, fam)  # noqa: E731
    else:
        fn = jax.jit(jax.vmap(lambda i, g: solve(i, {"goal": g})))
    t0 = time.time()
    res = fn(inits, goals)
    jax.block_until_ready(res)
    status = np.asarray(res.status)
    compile_s = time.time() - t0
    t0 = time.time()
    res = fn(inits, goals)
    jax.block_until_ready(res)
    _ = np.asarray(res.status)
    run_s = time.time() - t0

    traj = np.asarray(res.x).reshape(batch, n_steps, 8)
    viols = np.asarray(res.cnt_viols)         # [B, n_groups]
    coeffs = np.asarray(res.merit_coeffs)
    iters = np.asarray(res.n_iter)
    qps = np.asarray(res.n_qp_solves)
    box = np.asarray(res.box_size)

    # group names for the violation argmax
    nlp = prob.build()
    from trajopt_tpu.sqp import nlp as nlp_mod
    gnames = []
    for t, _, gsl in nlp_mod.cnt_group_structure(nlp):
        ng = gsl.stop - gsl.start
        if ng == 1:
            gnames.append(t.name)
        else:
            gnames.extend(f"{t.name}[{i}]" for i in range(ng))
    assert len(gnames) == viols.shape[1], (len(gnames), viols.shape)

    # independent swept verification (bench criterion)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    mins = bench._swept_verify(scene, traj, 8)

    conv = status == SQPStatus.CONVERGED
    free = mins > 0.0
    ok = conv & free
    print(f"# compile {compile_s:.1f}s run {run_s:.2f}s  "
          f"converged {conv.sum()}/{batch}  verified-free {free.sum()}"
          f"/{batch}  both {ok.sum()}/{batch}", file=sys.stderr)

    rows = []
    for i in range(batch):
        vmax = float(viols[i].max())
        gworst = gnames[int(viols[i].argmax())]
        rows.append({
            "lane": i,
            "goal_mode": int(i % 3),
            "status": SQPStatus.NAMES[int(status[i])],
            "conv": bool(conv[i]), "free": bool(free[i]),
            "clearance": round(float(mins[i]), 4),
            "n_iter": int(iters[i]), "n_qp": int(qps[i]),
            "max_viol": round(vmax, 6), "worst_group": gworst,
            "max_coeff": float(coeffs[i].max()),
            "box": float(box[i]),
        })

    fails = [r for r in rows if not (r["conv"] and r["free"])]
    print(f"# failing lanes: {len(fails)}", file=sys.stderr)
    from collections import Counter
    print("# status breakdown:",
          dict(Counter(r["status"] for r in rows)), file=sys.stderr)
    print("# failing-by-goal-mode:",
          dict(Counter(r["goal_mode"] for r in fails)), file=sys.stderr)
    print("# failing worst groups:",
          dict(Counter(r["worst_group"] for r in fails)), file=sys.stderr)
    print("# failing n_iter:",
          dict(Counter(r["n_iter"] for r in fails)), file=sys.stderr)
    for r in fails[:20]:
        print("#", json.dumps(r), file=sys.stderr)
    out_path = os.environ.get("DIAG_OUT", "/tmp/hard_mix_diag.json")
    with open(out_path, "w") as f:
        json.dump({"overrides": {k: str(v) for k, v in over.items()},
                   "rows": rows,
                   "ok": int(ok.sum()), "batch": batch,
                   "run_s": run_s}, f, indent=1)
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
