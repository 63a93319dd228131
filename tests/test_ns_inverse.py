"""Newton-Schulz KKT-inverse refresh (qp/inverse.py): unit convergence,
safeguard behavior, and end-to-end SQP parity of the ns_refresh block path
against the per-step Cholesky path.

TPU motivation (ROADMAP round-1 latency analysis): batched Cholesky + two
triangular solves cost ~7.5ms at flagship shapes while 8 NS matmul
iterations cost ~1.7ms; the reference refactorizes inside OSQP every QP
solve, which has no TPU-friendly analog.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_collision import spherebot_scene
from trajopt_tpu.problem.trajectory import TrajOptProblem, stationary_init
from trajopt_tpu.qp.admm import ADMMConfig
from trajopt_tpu.qp.inverse import cholesky_inverse, ns_inverse
from trajopt_tpu.sqp.params import SQPParams, SQPStatus
from trajopt_tpu.terms.collision import collision_term
from trajopt_tpu.terms.joint import joint_pos, joint_vel


def _spd(key, n, reg):
    a = jax.random.normal(key, (n, n))
    return a @ a.T + reg * jnp.eye(n)


def test_ns_converges_from_warm_seed():
    M = _spd(jax.random.PRNGKey(0), 40, 40.0)
    X0 = cholesky_inverse(M) * 1.07 + 1e-3  # perturbed previous inverse
    X = ns_inverse(M, X0, tol=1e-10)
    assert float(jnp.linalg.norm(jnp.eye(40) - M @ X)) < 1e-9


def test_ns_safeguard_rescales_divergent_seed():
    # lam_max(X0 M) >> 2 would make plain NS diverge; the power-iteration
    # scaling must pull the seed back into the contraction region.
    M = _spd(jax.random.PRNGKey(1), 32, 30.0)
    X0 = 250.0 * cholesky_inverse(M)
    X = ns_inverse(M, X0, tol=1e-10, max_iter=60)
    assert float(jnp.linalg.norm(jnp.eye(32) - M @ X)) < 1e-8


def test_ns_from_stale_seed():
    # seed = inverse of a substantially different matrix (merit escalation /
    # big relinearization analog)
    M = _spd(jax.random.PRNGKey(2), 48, 25.0)
    M_stale = _spd(jax.random.PRNGKey(3), 48, 60.0)
    X = ns_inverse(M, cholesky_inverse(M_stale), tol=1e-10, max_iter=60)
    assert float(jnp.linalg.norm(jnp.eye(48) - M @ X)) < 1e-8


def test_ns_vmaps():
    keys = jax.random.split(jax.random.PRNGKey(4), 5)
    Ms = jax.vmap(lambda k: _spd(k, 24, 24.0))(keys)
    X0s = jax.vmap(cholesky_inverse)(Ms) * 1.1
    Xs = jax.vmap(lambda m, x: ns_inverse(m, x, tol=1e-10))(Ms, X0s)
    r = jnp.linalg.norm(jnp.eye(24)[None] - jnp.einsum("bij,bjk->bik", Ms, Xs),
                        axis=(1, 2))
    assert float(r.max()) < 1e-9


def test_sqp_ns_refresh_matches_cholesky_path():
    sc = spherebot_scene()
    n = 4
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets="goal",
                            first_step=n - 1, last_step=n - 1))
    prob.add_term(collision_term(sc, n, margin=0.1, coeff=20.0, is_cost=False,
                                 fixed_steps=[0]))
    init = stationary_init(jnp.array([-2.0, 0.0]), n)
    params = {"goal": jnp.array([2.0, 0.3])}

    base = prob.make_solve(structured=True)(init, params)
    sqp_ns = dataclasses.replace(SQPParams(), qp=ADMMConfig(ns_refresh=True))
    ns = prob.make_solve(sqp_ns, structured=True)(init, params)

    assert int(base.status) == SQPStatus.CONVERGED
    assert int(ns.status) == SQPStatus.CONVERGED
    # identical solver decisions at the refreshed-inverse accuracy (1e-5
    # Frobenius residual on a well-scaled M)
    np.testing.assert_allclose(np.asarray(ns.x), np.asarray(base.x), atol=1e-5)
    assert int(ns.n_qp_solves) <= int(base.n_qp_solves) + 2


def test_sqp_ns_refresh_randomized_scenes_batched():
    """NS-refresh robustness beyond the fixed bench family: randomized
    obstacle positions + goals, batched, structured path, both
    factorizations must agree on statuses and solutions (the carried-
    inverse seed sees a different M sequence per lane)."""
    from tests.test_mpc_randomized import param_scene
    from trajopt_tpu.terms.joint import joint_vel as jv

    s = param_scene()
    n = 5
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(jv(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets="goal",
                            first_step=n - 1, last_step=n - 1))
    prob.add_term(collision_term(s, n, margin=0.1, coeff=20.0, is_cost=False,
                                 fixed_steps=[0]))
    init = stationary_init(jnp.array([-2.0, 0.0]), n)
    key = jax.random.PRNGKey(3)
    obs = jax.random.uniform(key, (4, 3), minval=-0.4, maxval=0.4)
    goals = jnp.tile(jnp.array([2.0, 0.1]), (4, 1)) + \
        jax.random.uniform(jax.random.PRNGKey(4), (4, 2), minval=-0.3,
                           maxval=0.3)

    base = jax.vmap(lambda o, g: prob.make_solve(structured=True)(
        init, {"obstacle_pos": o, "goal": g}))(obs, goals)
    sqp_ns = dataclasses.replace(SQPParams(), qp=ADMMConfig(ns_refresh=True))
    ns = jax.vmap(lambda o, g: prob.make_solve(sqp_ns, structured=True)(
        init, {"obstacle_pos": o, "goal": g}))(obs, goals)
    np.testing.assert_array_equal(np.asarray(ns.status),
                                  np.asarray(base.status))
    np.testing.assert_allclose(np.asarray(ns.x), np.asarray(base.x),
                               atol=1e-4)
