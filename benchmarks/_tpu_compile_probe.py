"""TPU compile-time breakdown for the pr2ish cast flagship."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_default_matmul_precision", "highest")
# NO persistent cache: measure true compile costs
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.models.benchmarks import (pr2ish_table_batch,
                                           pr2ish_table_problem)
from __graft_entry__ import _solver_params

B = 96


def t_compile(label, fn, *args):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    print(f"{label}: compile={time.time()-t0:.1f}s", flush=True)
    return c


prob, scene = pr2ish_table_problem(n_steps=30)
nlp = prob.build()
x = jnp.zeros((B, 240), jnp.float32)
for t in nlp.term_sets:
    if "collision" in t.name:
        t_compile("cast val_banded_jac (B=96)",
                  jax.vmap(lambda xx: t.val_banded_jac(xx, {})), x)
        t_compile("cast raw (B=96)",
                  jax.vmap(lambda xx: t.fn(xx, {})), x)
        break

i1, g1 = pr2ish_table_batch(jax.random.PRNGKey(0), B, 30)

# dense QP path full solve
solve_d = prob.make_solve(_solver_params(), structured=False)
t0 = time.time()
fnd = jax.jit(jax.vmap(lambda i, g: solve_d(i, {"goal": g})))
res = fnd(i1, g1)
jax.block_until_ready(res)
_ = np.asarray(res.status)
print(f"FULL solve DENSE: compile+first={time.time()-t0:.1f}s", flush=True)
t0 = time.time()
res = fnd(i1, g1)
jax.block_until_ready(res)
st = np.asarray(res.status)
dt = time.time() - t0
print(f"  run={dt:.2f}s conv={(st == 1).sum()}/{B} -> "
      f"{(st == 1).sum()/dt:.1f} solves/s", flush=True)

# discrete evaluator, structured (isolates cast narrowphase from QP shape)
prob2, _ = pr2ish_table_problem(n_steps=30, evaluator="discrete")
solve_s = prob2.make_solve(_solver_params(), structured=True)
t0 = time.time()
fns = jax.jit(jax.vmap(lambda i, g: solve_s(i, {"goal": g})))
res = fns(i1, g1)
jax.block_until_ready(res)
_ = np.asarray(res.status)
print(f"FULL solve DISCRETE+STRUCTURED: compile+first={time.time()-t0:.1f}s",
      flush=True)
