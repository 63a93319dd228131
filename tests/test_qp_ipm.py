"""Interior-point QP backend: the second algorithm class next to ADMM
(the reference validates the same problems across OSQP/qpOASES/Gurobi/BPMPD;
BPMPD is itself an interior-point code — solver_interface.cpp:255-292)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.qp.admm import ADMMConfig, QPData, qp_objective, solve_qp
from trajopt_tpu.qp.ipm import IPMConfig, solve_qp_ipm


def _random_qp(key, n=12, m=18, n_eq=2, n_soft=6):
    """Random strictly-convex prox-form QP with hard ineq rows, hard eq
    rows, and finite-penalty (soft) rows."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    B = jax.random.normal(k1, (n, n))
    P = B @ B.T + 0.5 * jnp.eye(n)
    q = jax.random.normal(k2, (n,))
    A = jax.random.normal(k3, (m, n))
    center = jax.random.normal(k4, (m,)) * 0.3
    half = 0.2 + jax.random.uniform(k5, (m,))
    l = center - half
    u = center + half
    # rows [0, n_eq): hard equalities; next n_soft: finite penalties
    l = l.at[:n_eq].set(center[:n_eq])
    u = u.at[:n_eq].set(center[:n_eq])
    c = jnp.full(m, jnp.inf)
    c = c.at[n_eq:n_eq + n_soft].set(5.0)
    return QPData(P, q, A, l, u, c)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_ipm_matches_admm_on_random_qps(seed):
    qp = _random_qp(jax.random.PRNGKey(seed))
    x0 = jnp.zeros(qp.P.shape[0])
    r_admm = solve_qp(qp, x0, cfg=ADMMConfig(eps_abs=1e-9, eps_rel=1e-9,
                                             max_iter=20000))
    r_ipm = jax.jit(solve_qp_ipm)(qp, x0)
    assert bool(r_ipm.converged)
    f_admm = float(qp_objective(qp, r_admm.x))
    f_ipm = float(qp_objective(qp, r_ipm.x))
    # same optimum of the same convex objective
    assert f_ipm <= f_admm + 1e-6 * (1 + abs(f_admm))
    np.testing.assert_allclose(np.asarray(r_ipm.x), np.asarray(r_admm.x),
                               atol=1e-4)


def test_ipm_hard_rows_satisfied_exactly():
    qp = _random_qp(jax.random.PRNGKey(7), n_eq=3, n_soft=4)
    r = solve_qp_ipm(qp, jnp.zeros(qp.P.shape[0]))
    assert bool(r.converged)
    z = np.asarray(qp.A @ r.x)
    hard = np.isinf(np.asarray(qp.c))
    viol = np.maximum(z - np.asarray(qp.u), 0) + \
        np.maximum(np.asarray(qp.l) - z, 0)
    assert viol[hard].max() < 1e-6  # big-M exact penalty drives these to 0


def test_ipm_soft_rows_priced_correctly():
    """A soft row's optimal dual magnitude never exceeds its penalty c_i
    (subgradient of c*dist), and violated soft rows carry |y| = c."""
    qp = _random_qp(jax.random.PRNGKey(11), n_eq=0, n_soft=10)
    # tighten the soft intervals so some are active/violated at the optimum
    qp = qp._replace(l=qp.l * 0.05, u=qp.u * 0.05)
    r = solve_qp_ipm(qp, jnp.zeros(qp.P.shape[0]))
    assert bool(r.converged)
    c = np.asarray(qp.c)
    y = np.asarray(r.y)
    soft = np.isfinite(c)
    assert (np.abs(y[soft]) <= c[soft] + 1e-6).all()
    z = np.asarray(qp.A @ r.x)
    above = z - np.asarray(qp.u) > 1e-6
    below = np.asarray(qp.l) - z > 1e-6
    viol_soft = soft & (above | below)
    if viol_soft.any():
        np.testing.assert_allclose(np.abs(y[viol_soft]), c[viol_soft],
                                   atol=1e-5)


def test_ipm_batched_vmap():
    keys = jax.random.split(jax.random.PRNGKey(42), 8)
    qps = jax.vmap(_random_qp)(keys)
    x0 = jnp.zeros((8, qps.P.shape[-1]))
    res = jax.jit(jax.vmap(lambda qp, x: solve_qp_ipm(qp, x)))(qps, x0)
    assert bool(jnp.all(res.converged))
    # Cross-check each lane against the single-problem path.  Bitwise
    # x-identity is NOT expected: the big-M Newton systems have condition
    # ~1e12, so batched-vs-single matmul rounding legitimately moves x by
    # ~1e-4 along near-degenerate active-set directions while both iterates
    # satisfy the KKT gate.  Assert what the algorithm guarantees: same
    # objective value and same hard-row feasibility.
    for i in range(8):
        qp_i = jax.tree.map(lambda a: a[i], qps)
        one = solve_qp_ipm(qp_i, x0[i])
        assert bool(one.converged)
        f_b = float(qp_objective(qp_i, res.x[i]))
        f_1 = float(qp_objective(qp_i, one.x))
        assert abs(f_b - f_1) <= 1e-6 * (1 + abs(f_1))
        np.testing.assert_allclose(np.asarray(res.x[i]), np.asarray(one.x),
                                   atol=1e-3)


def test_ipm_backend_end_to_end_sqp():
    """qp_algorithm='ipm' drives the full jitted SQP to the same solution
    as the ADMM path on a collision-constrained problem (the reference's
    AllSolvers cross-backend parity pattern, cast_cost_unit.cpp)."""
    import dataclasses

    from trajopt_tpu.models.benchmarks import simple_collision_problem
    from trajopt_tpu.problem.trajectory import given_init
    from trajopt_tpu.sqp.params import SQPParams, SQPStatus

    prob, scene = simple_collision_problem()
    init = given_init(jnp.array([[-0.75, 0.75]]))
    base = SQPParams()
    r_admm = prob.make_solve(base)(init, {})
    r_ipm = prob.make_solve(
        dataclasses.replace(base, qp_algorithm="ipm"))(init, {})
    assert int(r_ipm.status) == SQPStatus.CONVERGED
    assert int(r_admm.status) == SQPStatus.CONVERGED
    # BASELINE parity tolerance: <= 1e-3 joint-space agreement
    np.testing.assert_allclose(np.asarray(r_ipm.x), np.asarray(r_admm.x),
                               atol=1e-3)
    d = float(scene.distances(r_ipm.x.reshape(2))[0])
    assert d >= 0.2 - 1e-3


def test_ipm_backend_json_selection():
    """basic_info.convex_solver = 'ipm' selects the interior-point backend
    through the JSON front end (TRAJOPT_CONVEX_SOLVER analog)."""
    from tests.test_collision import spherebot_scene
    from tests.test_json_io import SIMPLE_COLLISION_DOC
    from trajopt_tpu.problem.json_io import Environment, construct_problem
    from trajopt_tpu.sqp.params import SQPStatus

    scene = spherebot_scene()
    env = Environment(tree=scene.tree, scene=scene)
    doc = {**SIMPLE_COLLISION_DOC,
           "basic_info": {**SIMPLE_COLLISION_DOC["basic_info"],
                          "convex_solver": "ipm"}}
    jp = construct_problem(doc, env)
    assert jp.sqp.qp_algorithm == "ipm"
    res = jp.solve()
    assert int(res.status) == SQPStatus.CONVERGED
    d = float(scene.distances(res.x.reshape(2))[0])
    assert d >= 0.2 - 1e-3


def test_ipm_structured_rejected():
    from trajopt_tpu.models.benchmarks import arm_table_problem
    from trajopt_tpu.sqp.params import SQPParams
    import dataclasses
    prob, _ = arm_table_problem(n_steps=5)
    with pytest.raises(ValueError, match="dense path"):
        prob.make_solve(dataclasses.replace(SQPParams(),
                                            qp_algorithm="ipm"),
                        structured=True)


def test_ipm_reaches_tight_accuracy():
    """The point of the second backend: 1e-10-level complementarity gap and
    ~1e-6-relative KKT residuals in tens of Newton steps (ADMM needs
    thousands of iterations for this regime)."""
    qp = _random_qp(jax.random.PRNGKey(3))
    r = solve_qp_ipm(qp, jnp.zeros(qp.P.shape[0]),
                     cfg=IPMConfig(eps=1e-9))
    assert bool(r.converged)
    assert int(r.iters) <= 50
    assert float(r.dua_res) < 1e-8     # complementarity gap mu
    assert float(r.pri_res) < 1e-5     # scaled KKT residual
    # KKT stationarity, recomputed independently: P x + q + A' y = 0
    g = np.asarray(qp.P @ r.x + qp.q + qp.A.T @ r.y)
    assert np.abs(g).max() < 5e-5
