"""Measured comparison of contact-row formulations on a cluttered scene
(VERDICT r2 missing #5 / weighted_average_methods.cpp role):

  * all-pairs rows (no cap)
  * hard top-k per (gap, sub-segment)      [max_num_cnt]
  * fixed-size weighted-average link-pair rows + top-k

on the pr2ish cast flagship (f32, CPU or TPU), reporting convergence,
solver effort, and independent swept verification per config.

Run: python benchmarks/aggregate_compare.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# XLA:CPU LLVM ISel overflows default 8MB thread stacks on the largest
# cast programs ("LLVM compilation error: Cannot allocate memory" then
# SIGSEGV) — raise the soft limit BEFORE jax spawns its compile pool,
# like tests/conftest.py.
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        resource.setrlimit(resource.RLIMIT_STACK,
                           (_want if _hard == resource.RLIM_INFINITY
                            else min(_want, _hard), _hard))
except Exception:
    pass

import jax

if os.environ.get("AGG_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np


def main():
    from trajopt_tpu.models.benchmarks import (pr2ish_table_batch,
                                               pr2ish_table_problem)
    from trajopt_tpu.models.robots import pr2ish_scene
    from trajopt_tpu.problem.trajectory import TrajOptProblem, \
        interpolated_init
    from trajopt_tpu.terms.collision import collision_term
    from trajopt_tpu.terms.joint import joint_pos, joint_vel
    from trajopt_tpu.models.robots import pr2ish
    from __graft_entry__ import _solver_params

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_steps = 30
    tree = pr2ish()
    scene = pr2ish_scene()
    from trajopt_tpu.terms.collision import _link_pair_partition
    _, n_lp = _link_pair_partition(scene)
    print(f"# scene: {scene.n_pairs} geom pairs, {n_lp} link pairs")

    configs = [
        ("all-pairs", dict(max_num_cnt=None, aggregate="none")),
        ("top-k=16", dict(max_num_cnt=16, aggregate="none")),
        ("top-k=32", dict(max_num_cnt=32, aggregate="none")),
        ("weighted-avg", dict(max_num_cnt=None,
                              aggregate="weighted_average")),
        ("weighted-avg+k16", dict(max_num_cnt=16,
                                  aggregate="weighted_average")),
    ]
    inits, goals = pr2ish_table_batch(jax.random.PRNGKey(0), batch, n_steps)
    for label, kw in configs:
        prob = TrajOptProblem(
            n_steps=n_steps, n_dof=8, joint_lower=tree.lower,
            joint_upper=tree.upper, fixed_steps=[0])
        prob.add_term(joint_vel(n_steps, 8, is_cost=True,
                                coeffs=np.full(8, 5.0)))
        prob.add_term(joint_pos(n_steps, 8, is_cost=False, targets="goal",
                                first_step=n_steps - 1,
                                last_step=n_steps - 1))
        prob.add_term(collision_term(
            scene, n_steps, margin=0.025, coeff=20.0, is_cost=False,
            evaluator="cast", fixed_steps=[0], lvs_substeps=3, **kw))
        solve = prob.make_solve(_solver_params(), structured=False)
        fn = jax.jit(jax.vmap(lambda i, g: solve(i, {"goal": g})))
        t0 = time.time()
        res = fn(inits, goals)
        jax.block_until_ready(res)
        t_first = time.time() - t0
        t0 = time.time()
        res = fn(inits, goals)
        jax.block_until_ready(res)
        t_run = time.time() - t0
        st = np.asarray(res.status)
        # independent swept verification: ONE jitted batched whole-gap
        # query (the per-gap eager loop took 30-60 ms tunnel latency per
        # op on TPU — hours for a 16-lane batch)
        traj = np.asarray(res.x).reshape(batch, n_steps, 8)

        @jax.jit
        def _lane_mins(trs):
            def lane(tr):
                return jnp.min(jax.vmap(scene.swept_distances)(
                    tr[:-1], tr[1:]))
            return jax.vmap(lane)(trs)

        mins = np.asarray(_lane_mins(jnp.asarray(traj, jnp.float32)))
        print(f"{label:18s}: conv={(st == 1).sum()}/{batch} "
              f"free={(mins > 0).sum()}/{batch} "
              f"worst_clear={mins.min():+.4f} "
              f"mean_iter={np.asarray(res.n_iter).mean():.1f} "
              f"compile+first={t_first:.0f}s run={t_run:.2f}s", flush=True)


if __name__ == "__main__":
    main()
