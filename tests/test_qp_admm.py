"""QP-core tests: KKT optimality on random QPs, analytic prox-penalty cases,
batching, warm starts.

Mirrors the role of the reference's solver-interface tests
(trajopt_sco/test/solver-interface-unit.cpp) and the QP-assembly checks of
trajopt_optimizers/trajopt_sqp/test/hessian_gradient_unit.cpp, but checks
our single batched ADMM backend against KKT conditions instead of comparing
four C solver libraries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.qp.admm import ADMMConfig, QPData, qp_objective, solve_qp

INF = float("inf")
CFG = ADMMConfig(eps_abs=1e-9, eps_rel=1e-9, max_iter=4000)


def random_box_qp(key, n=12, m=8):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    G = jax.random.normal(k1, (n, n))
    P = G @ G.T + 0.1 * jnp.eye(n)
    q = jax.random.normal(k2, (n,))
    A = jax.random.normal(k3, (m, n))
    center = jax.random.normal(k4, (m,))
    l = center - 0.5
    u = center + 0.5
    c = jnp.full((m,), INF)
    return QPData(P, q, A, l, u, c)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hard_qp_kkt(seed):
    qp = random_box_qp(jax.random.PRNGKey(seed))
    res = solve_qp(qp, jnp.zeros(qp.P.shape[0]), cfg=CFG)
    assert bool(res.converged)
    x, y = res.x, res.y
    # Stationarity: Px + q + A'y = 0
    np.testing.assert_allclose(qp.P @ x + qp.q + qp.A.T @ y, 0.0, atol=1e-6)
    # Primal feasibility
    z = qp.A @ x
    assert float(jnp.max(z - qp.u)) < 1e-6
    assert float(jnp.max(qp.l - z)) < 1e-6
    # Complementarity: y > 0 only at upper bound, y < 0 only at lower bound
    gap_u = qp.u - z
    gap_l = z - qp.l
    np.testing.assert_allclose(jnp.maximum(y, 0.0) * gap_u, 0.0, atol=1e-5)
    np.testing.assert_allclose(jnp.maximum(-y, 0.0) * gap_l, 0.0, atol=1e-5)


@pytest.mark.parametrize(
    "c,expected",
    [(1.0, 2.0), (5.0, 1.0)],  # min 0.5(x-3)^2 + c*max(0, x-1)
)
def test_hinge_penalty_analytic(c, expected):
    qp = QPData(
        P=jnp.eye(1), q=jnp.array([-3.0]),
        A=jnp.eye(1), l=jnp.array([-INF]), u=jnp.array([1.0]),
        c=jnp.array([c]),
    )
    res = solve_qp(qp, jnp.zeros(1), cfg=CFG)
    np.testing.assert_allclose(res.x, [expected], atol=1e-6)


@pytest.mark.parametrize(
    "c,expected",
    [(1.0, 2.0), (5.0, 1.0)],  # min 0.5(x-3)^2 + c*|x-1|
)
def test_abs_penalty_analytic(c, expected):
    qp = QPData(
        P=jnp.eye(1), q=jnp.array([-3.0]),
        A=jnp.eye(1), l=jnp.array([1.0]), u=jnp.array([1.0]),
        c=jnp.array([c]),
    )
    res = solve_qp(qp, jnp.zeros(1), cfg=CFG)
    np.testing.assert_allclose(res.x, [expected], atol=1e-6)


def test_mixed_hard_and_soft_rows():
    # min 0.5 x'x - [1,1]'x  s.t. x0 <= 0.25 (hard), penalty 10*max(0, x1-0.5)
    qp = QPData(
        P=jnp.eye(2), q=jnp.array([-1.0, -1.0]),
        A=jnp.eye(2),
        l=jnp.array([-INF, -INF]), u=jnp.array([0.25, 0.5]),
        c=jnp.array([INF, 10.0]),
    )
    res = solve_qp(qp, jnp.zeros(2), cfg=CFG)
    np.testing.assert_allclose(res.x, [0.25, 0.5], atol=1e-6)


def test_vmap_batch_matches_loop():
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    qps = [random_box_qp(k) for k in keys]
    batched = QPData(*(jnp.stack([getattr(qp, f) for qp in qps]) for f in QPData._fields))
    x0 = jnp.zeros((4, 12))
    batch_res = jax.jit(jax.vmap(lambda qp, x: solve_qp(qp, x, cfg=CFG)))(batched, x0)
    for i, qp in enumerate(qps):
        single = solve_qp(qp, x0[i], cfg=CFG)
        np.testing.assert_allclose(batch_res.x[i], single.x, atol=1e-6)


def test_warm_start_converges_fast():
    qp = random_box_qp(jax.random.PRNGKey(3))
    res1 = solve_qp(qp, jnp.zeros(12), cfg=CFG)
    res2 = solve_qp(qp, res1.x, z0=res1.z, y0=res1.y, cfg=CFG)
    assert int(res2.iters) <= int(res1.iters)
    np.testing.assert_allclose(res2.x, res1.x, atol=1e-6)


def test_objective_decreases_vs_start():
    qp = random_box_qp(jax.random.PRNGKey(11))
    x0 = jnp.ones(12)
    res = solve_qp(qp, x0, cfg=CFG)
    assert float(qp_objective(qp, res.x)) < float(qp_objective(qp, x0))


@pytest.mark.parametrize("seed", [0, 2])
def test_anderson_acceleration_matches_and_speeds(seed):
    """Safeguarded Anderson acceleration reaches the same solution in no
    more iterations (often far fewer on hard problems)."""
    import dataclasses
    qp = random_box_qp(jax.random.PRNGKey(seed))
    base = dataclasses.replace(CFG, adaptive_rho=False)
    plain = solve_qp(qp, jnp.zeros(12), cfg=base)
    acc = solve_qp(qp, jnp.zeros(12),
                   cfg=dataclasses.replace(base, anderson=5))
    assert bool(acc.converged)
    np.testing.assert_allclose(acc.x, plain.x, atol=1e-6)
    assert int(acc.iters) <= int(plain.iters)


def test_rho_dual_scale_beats_dual_starvation():
    """An escalated penalty row that a hard row prevents satisfying (the
    SQP's trust-box regime) drives optimal duals to ~c on BOTH rows;
    fixed-rho ADMM climbs duals at rho*residual/iter and stalls at the
    midpoint, while the global dual-magnitude rho scale
    (ADMMConfig.rho_dual_scale) solves it within the same budget
    (round-5 hard-mix root cause; benchmarks/hard_mix_diag.py)."""
    import dataclasses

    # min 0.5 x^2 + 1e5*hinge(1 - x)  s.t. x <= 0.5 (hard):
    # optimum x = 0.5, dual(soft) = -1e5, dual(hard) ~ +1e5.
    qp = QPData(
        P=jnp.eye(1), q=jnp.zeros(1),
        A=jnp.asarray([[1.0], [1.0]]),
        l=jnp.asarray([1.0, -INF]), u=jnp.asarray([INF, 0.5]),
        c=jnp.asarray([1e5, INF]),
    )
    base = dataclasses.replace(CFG, adaptive_rho=False, max_iter=1000,
                               check_every=50)
    starved = solve_qp(qp, jnp.zeros(1), cfg=base)
    scaled = solve_qp(qp, jnp.zeros(1),
                      cfg=dataclasses.replace(base, rho_dual_scale=0.1))
    # fixed-rho stalls between the competing rows; scaled converges
    assert abs(float(starved.x[0]) - 0.5) > 0.2
    assert bool(scaled.converged)
    np.testing.assert_allclose(float(scaled.x[0]), 0.5, atol=1e-4)
    # and on an easy QP the scale is a no-op (max_c small -> factor 1)
    easy = random_box_qp(jax.random.PRNGKey(5))
    r0 = solve_qp(easy, jnp.zeros(12), cfg=CFG)
    r1 = solve_qp(easy, jnp.zeros(12),
                  cfg=dataclasses.replace(CFG, rho_dual_scale=0.1))
    np.testing.assert_allclose(r1.x, r0.x, atol=1e-6)
