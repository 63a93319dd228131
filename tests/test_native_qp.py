"""Native C++ QP backend: parity with the JAX ADMM on random and analytic
QPs (the backend-parameterized solver tests of
trajopt_sco/test/solver-interface-unit.cpp, with the backend matrix being
{JAX-ADMM, native-C++-ADMM})."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_qp_admm import CFG, random_box_qp
from trajopt_tpu.qp.admm import QPData, solve_qp
from trajopt_tpu.qp.native import available, solve_qp_native

pytestmark = pytest.mark.skipif(not available(),
                                reason="native backend not buildable")

INF = float("inf")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_jax_on_random_qps(seed):
    qp = random_box_qp(jax.random.PRNGKey(seed))
    jres = solve_qp(qp, jnp.zeros(12), cfg=CFG)
    nres = solve_qp_native(*[np.asarray(f) for f in qp])
    assert nres.converged
    np.testing.assert_allclose(nres.x, jres.x, atol=1e-6)


def test_native_penalty_rows():
    # min 0.5(x-3)^2 + 5*max(0, x-1) -> x = 1
    nres = solve_qp_native(
        np.eye(1), np.array([-3.0]), np.eye(1),
        np.array([-INF]), np.array([1.0]), np.array([5.0]))
    assert nres.converged
    np.testing.assert_allclose(nres.x, [1.0], atol=1e-6)


def test_native_warm_start():
    qp = random_box_qp(jax.random.PRNGKey(5))
    args = [np.asarray(f) for f in qp]
    r1 = solve_qp_native(*args)
    r2 = solve_qp_native(*args, x0=r1.x, z0=r1.z, y0=r1.y)
    assert r2.converged
    assert r2.iters <= r1.iters
