"""Sub-phase profile of the cast-flagship convexify path: where do the
71.8 ms/call (B=256) actually go?

Phases measured as marginal cost of extra scan iterations inside one jit
(tunneled-device rule: never direct wall time):
  1. FK with axes, all steps
  2. swept narrowphase VALUES, all gaps (scene.swept_distances)
  3. swept narrowphase VALUE+JAC, all gaps (scene.swept_distances_and_jac)
  4. collision term banded_jac (adds interpolation chaining, select, W)
  5. full convexify_structured (adds every other term set)

Run: python benchmarks/narrowphase_profile.py
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K_LO, K_HI = 2, 10


def _time(fn, *args, reps=3):
    r = fn(*args)
    _ = np.asarray(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _marginal(mk, *args):
    return (_time(mk(K_HI), *args) - _time(mk(K_LO), *args)) / (K_HI - K_LO)


def main():
    from __graft_entry__ import _solver_params
    from trajopt_tpu.models.benchmarks import (pr2ish_table_batch,
                                               pr2ish_table_problem)
    from trajopt_tpu.sqp import nlp as nlp_mod

    B = int(os.environ.get("BENCH_BATCH", "256"))
    T = 30
    prob, scene = pr2ish_table_problem(n_steps=T)
    inits, goals = pr2ish_table_batch(jax.random.PRNGKey(0), B, T)
    nlp = prob.build()
    dtype = jnp.float32
    x0 = inits.astype(dtype).reshape(B, -1)
    n_dof = scene.tree.n_dof
    qs0 = x0.reshape(B, T, -1)[:, :, :n_dof]

    def scan_scalar(body, k):
        def f(*args):
            def b(c, _):
                return body(c, *args), None
            c, _ = jax.lax.scan(b, jnp.asarray(0.0, dtype), None, length=k)
            return c
        return jax.jit(lambda *a: jnp.sum(jax.vmap(lambda *s: f(*s))(*a)))

    # 1. FK with axes (all steps)
    def mk_fk(k):
        def body(c, qs):
            R, p, z, o = jax.vmap(
                lambda q: scene.tree.fk_with_axes(q + c * 1e-9))(qs)
            return (jnp.sum(R) + jnp.sum(p) + jnp.sum(z) + jnp.sum(o)) * 1e-9
        return scan_scalar(body, k)
    t_fk = _marginal(mk_fk, qs0)
    print(f"FK+axes all steps            : {t_fk*1e3:8.2f} ms/call")

    # 2. swept values, all gaps
    def mk_vals(k):
        def body(c, qs):
            d = jax.vmap(lambda a, b: scene.swept_distances(
                a + c * 1e-9, b))(qs[:-1], qs[1:])
            return jnp.sum(d) * 1e-9
        return scan_scalar(body, k)
    t_v = _marginal(mk_vals, qs0)
    print(f"swept values all gaps        : {t_v*1e3:8.2f} ms/call")

    # 3. swept value+jac, all gaps
    def mk_vj(k):
        def body(c, qs):
            d, J0, J1 = jax.vmap(lambda a, b: scene.swept_distances_and_jac(
                a + c * 1e-9, b))(qs[:-1], qs[1:])
            return (jnp.sum(d) + jnp.sum(J0) + jnp.sum(J1)) * 1e-9
        return scan_scalar(body, k)
    t_vj = _marginal(mk_vj, qs0)
    print(f"swept value+jac all gaps     : {t_vj*1e3:8.2f} ms/call")

    # 4. collision term banded_jac (full term machinery)
    coll = [t for t in nlp.term_sets if "collision" in t.name.lower()]
    if not coll:
        coll = [t for t in nlp.term_sets if t.banded_jac is not None
                and t.band_width == 2 * (nlp.n // T)]
    term = coll[0]
    print(f"  (collision term: {term.name}, rows {term.n_rows})")

    def mk_term(k):
        def body(c, x):
            v, W = term.val_banded_jac(x + c * 1e-9, {"goal": x[:8] * 0.0})
            return (jnp.sum(v) + jnp.sum(W)) * 1e-9
        return scan_scalar(body, k)
    t_term = _marginal(mk_term, x0)
    print(f"collision val_banded_jac     : {t_term*1e3:8.2f} ms/call")

    # 4b. value+jac WITHOUT select/W: the term's gap-blocks pass alone
    import trajopt_tpu.terms.collision as tc  # noqa: F401  (term internals)

    def mk_term_noW(k):
        # approximates _gap_vals_blocks by calling the swept pass at the
        # same substep count through the public API
        fr = np.linspace(0.0, 1.0, 4)

        def body(c, x):
            qs = x.reshape(T, -1)[:, :scene.tree.n_dof]
            a, b = qs[:-1], qs[1:]
            dq = b - a
            qf = (a[:, None, :] + jnp.asarray(fr, dtype)[None, :, None]
                  * dq[:, None, :])                       # [G, 4, n_dof]
            R, p, z, o = jax.vmap(jax.vmap(scene.tree.fk_with_axes))(
                qf + c * 1e-9)

            def one(ai, dqi, fkR, fkp, fkz, fko):
                def sub(f0, f1):
                    return scene.swept_distances_and_jac(
                        ai, ai, fk0=f0, fk1=f1)
                return jax.vmap(sub)(
                    (fkR[:-1], fkp[:-1], fkz[:-1], fko[:-1]),
                    (fkR[1:], fkp[1:], fkz[1:], fko[1:]))
            d, J0, J1 = jax.vmap(one)(a, dq, R, p, z, o)
            return (jnp.sum(d) + jnp.sum(J0) + jnp.sum(J1)) * 1e-9
        return scan_scalar(body, k)
    t_noW = _marginal(mk_term_noW, x0)
    print(f"gap-blocks (3 substep vj)    : {t_noW*1e3:8.2f} ms/call")

    # 5. full convexify_structured
    jac_cache = nlp_mod.linear_jacobians(nlp, nlp.n, {"goal": goals[0]}, dtype)

    def mk_cvx(k):
        def body(c, x, g):
            m = nlp_mod.convexify_structured(nlp, x + c * 1e-9, {"goal": g},
                                             jac_cache)
            return sum(jnp.sum(jnp.abs(l))
                       for l in jax.tree_util.tree_leaves(m)
                       if jnp.issubdtype(l.dtype, jnp.floating)) * 1e-9
        return scan_scalar(body, k)
    t_cvx = _marginal(mk_cvx, x0, goals)
    print(f"full convexify_structured    : {t_cvx*1e3:8.2f} ms/call")

    print(f"--- narrowphase share: values {t_v/t_cvx*100:.0f}%  "
          f"value+jac {t_vj/t_cvx*100:.0f}%  term {t_term/t_cvx*100:.0f}%")


if __name__ == "__main__":
    main()
