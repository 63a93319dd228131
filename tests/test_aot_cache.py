"""AOT trace-cache tests (utils/aot_cache.py): roundtrip equality,
artifact reuse, and key invalidation."""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.problem.trajectory import TrajOptProblem, stationary_init
from trajopt_tpu.terms.joint import joint_pos, joint_vel
from trajopt_tpu.utils.aot_cache import cached_export


def _tiny_problem():
    n = 5
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets="goal",
                            first_step=n - 1, last_step=n - 1))
    solve = prob.make_solve()
    init = stationary_init(jnp.zeros(2), n)
    return (lambda i, g: solve(i, {"goal": g})), init, jnp.array([1.0, 2.0])


def test_roundtrip_and_reuse(tmp_path):
    fn, init, goal = _tiny_problem()
    d = str(tmp_path)
    f1 = cached_export(fn, (init, goal), "k", cache_dir=d)
    files = list(tmp_path.glob("*.stablehlo"))
    assert len(files) == 1
    r1 = f1(init, goal)
    assert int(r1.status) == 1
    # second call LOADS (no new artifact), results bitwise equal
    f2 = cached_export(fn, (init, goal), "k", cache_dir=d)
    assert list(tmp_path.glob("*.stablehlo")) == files
    r2 = f2(init, goal)
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))
    # matches plain jit exactly
    r3 = jax.jit(fn)(init, goal)
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r3.x))


def test_key_and_shape_invalidate(tmp_path):
    fn, init, goal = _tiny_problem()
    d = str(tmp_path)
    cached_export(fn, (init, goal), "config-a", cache_dir=d)
    # different key -> new artifact (a workload knob changed)
    cached_export(fn, (init, goal), "config-b", cache_dir=d)
    assert len(list(tmp_path.glob("*.stablehlo"))) == 2
    # different input shape -> new artifact
    binit = jnp.stack([init, init])
    bgoal = jnp.stack([goal, goal])
    bfn = jax.vmap(fn)
    cached_export(bfn, (binit, bgoal), "config-a", cache_dir=d)
    assert len(list(tmp_path.glob("*.stablehlo"))) == 3
