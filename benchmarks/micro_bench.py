"""Micro-benchmarks: term construction / value / convexify timings, the
joint_term_benchmarks.cpp + solve_benchmarks.cpp analog (Google-Benchmark-
style rows to stderr, machine-readable JSON lines to stdout).

Run:  python benchmarks/micro_bench.py           (current default device)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")


def _time(fn, *args, reps=5):
    r = fn(*args)
    jax.block_until_ready(r)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0])
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def emit(name, seconds, unit="s"):
    print(json.dumps({"metric": name, "value": round(seconds * 1e6, 2),
                      "unit": "us"}))
    print(f"{name:>48}: {seconds * 1e6:10.1f} us", file=sys.stderr)


def main():
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from trajopt_tpu.models.benchmarks import (
        arm_table_batch, arm_table_problem, simple_collision_problem)
    from trajopt_tpu.sqp import nlp as nm
    from trajopt_tpu.terms.joint import joint_acc, joint_jerk, joint_pos, joint_vel

    T, D, B = 30, 7, 64
    x = jnp.zeros((B, T * D), jnp.float32)

    # joint-term value/jacobian micro-benchmarks (joint_term_benchmarks.cpp)
    for mk, nm_ in [(joint_pos, "joint_pos"), (joint_vel, "joint_vel"),
                    (joint_acc, "joint_acc"), (joint_jerk, "joint_jerk")]:
        term = mk(T, D, is_cost=True)
        f = jax.jit(jax.vmap(lambda v: term.fn(v, {})))
        emit(f"{nm_}.value[B={B}]", _time(f, x) / B)
        g = jax.jit(jax.vmap(jax.jacrev(lambda v: term.fn(v, {}))))
        emit(f"{nm_}.jacobian[B={B}]", _time(g, x) / B)

    # convexify + collision evaluation on the flagship problem
    prob, scene = arm_table_problem(n_steps=T)
    nlp = prob.build()
    inits, goals = arm_table_batch(jax.random.PRNGKey(0), B, T)
    xs = inits.reshape(B, -1)
    cvx = jax.jit(jax.vmap(lambda v, g: nm.convexify(nlp, v, {"goal": g})))
    emit(f"arm7.convexify[B={B}]", _time(cvx, xs, goals) / B)
    dist = jax.jit(jax.vmap(lambda v: jax.vmap(scene.distances)(
        v.reshape(T, D))))
    emit(f"arm7.collision_distances_30steps[B={B}]", _time(dist, xs) / B)

    # full solves (solve_benchmarks.cpp analog)
    from __graft_entry__ import _solver_params
    solve = prob.make_solve(_solver_params())
    f = jax.jit(jax.vmap(lambda i, g: solve(i, {"goal": g})))
    emit(f"arm7.full_solve[B={B}]", _time(f, inits, goals, reps=2) / B)

    sprob, _ = simple_collision_problem()
    ssolve = sprob.make_solve(_solver_params())
    from trajopt_tpu.problem.trajectory import given_init
    init = given_init(jnp.array([[-0.75, 0.75]], jnp.float32))
    sf = jax.jit(jax.vmap(lambda i: ssolve(i, {})))
    inits_s = jnp.tile(init[None], (B, 1, 1))
    emit(f"simple_collision.full_solve[B={B}]", _time(sf, inits_s, reps=2) / B)


if __name__ == "__main__":
    main()
