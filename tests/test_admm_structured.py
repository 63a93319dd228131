"""Structured ADMM vs dense ADMM: identical solutions on banded QPs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.qp import banded as bd
from trajopt_tpu.qp.admm import ADMMConfig, QPData, solve_qp
from trajopt_tpu.qp.admm_structured import StructuredQP, solve_qp_structured

INF = float("inf")
CFG = ADMMConfig(eps_abs=1e-9, eps_rel=1e-9, max_iter=5000,
                 adaptive_rho=False)


def random_structured(seed=3, n=24, m=15, w=6, hard_frac=0.3):
    RNG = np.random.default_rng(seed)
    G = RNG.normal(size=(n, n)) * 0.3
    P = jnp.asarray(G @ G.T + 0.2 * np.eye(n))
    q = jnp.asarray(RNG.normal(size=n))
    C = bd.make_banded(jnp.asarray(RNG.normal(size=(m, w))),
                       RNG.integers(0, n - w + 1, size=m), n)
    ctr = RNG.normal(size=m)
    l = jnp.asarray(ctr - 0.4)
    u = jnp.asarray(ctr + 0.4)
    c = jnp.asarray(np.where(RNG.uniform(size=m) < hard_frac, INF, 5.0))
    lb = jnp.asarray(RNG.normal(size=n) - 2.0)
    ub = jnp.asarray(RNG.normal(size=n) + 2.0)
    return StructuredQP(P=P, q=q, C=C, l=l, u=u, c=c, lb=lb, ub=ub)


def to_dense_qp(s: StructuredQP) -> QPData:
    n = s.P.shape[0]
    A = jnp.concatenate([bd.to_dense(s.C), jnp.eye(n)], axis=0)
    l = jnp.concatenate([s.l, s.lb])
    u = jnp.concatenate([s.u, s.ub])
    c = jnp.concatenate([s.c, jnp.full((n,), INF)])
    return QPData(P=s.P, q=s.q, A=A, l=l, u=u, c=c)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_structured_matches_dense(seed):
    s = random_structured(seed)
    n = s.P.shape[0]
    dres = solve_qp(to_dense_qp(s), jnp.zeros(n),
                    cfg=dataclasses.replace(CFG, adaptive_rho=False))
    sres = solve_qp_structured(s, jnp.zeros(n), cfg=CFG)
    assert bool(sres.converged)
    np.testing.assert_allclose(sres.x, dres.x, atol=1e-6)


def test_structured_warm_start():
    s = random_structured()
    n = s.P.shape[0]
    m = s.C.m
    r1 = solve_qp_structured(s, jnp.zeros(n), cfg=CFG)
    r2 = solve_qp_structured(s, r1.x, zc0=r1.z[:m], zb0=r1.z[m:],
                             yc0=r1.y[:m], yb0=r1.y[m:], cfg=CFG)
    assert bool(r2.converged)
    assert int(r2.iters) <= int(r1.iters)
    np.testing.assert_allclose(r2.x, r1.x, atol=1e-6)


def test_structured_vmap():
    """Batched problems share the static banded STRUCTURE (idx); only the
    runtime arrays batch — the solver use-case under vmap."""
    base = random_structured(7)
    n = base.P.shape[0]
    rng = np.random.default_rng(11)
    Ws = jnp.asarray(rng.normal(size=(3,) + base.C.W.shape))
    Ps = jnp.stack([base.P * (1.0 + 0.1 * k) for k in range(3)])

    def solve_one(P, W):
        s = base._replace(P=P, C=base.C._replace(W=W))
        return solve_qp_structured(s, jnp.zeros(n), cfg=CFG)

    res = jax.jit(jax.vmap(solve_one))(Ps, Ws)
    for i in range(3):
        single = solve_one(Ps[i], Ws[i])
        np.testing.assert_allclose(res.x[i], single.x, atol=1e-6)
