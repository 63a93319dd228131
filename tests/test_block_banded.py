"""Block-banded (gather-free) matrix ops and ADMM path vs dense references.

The block layout (qp/block_banded.py) must reproduce the gather-banded
semantics (qp/banded.py) row-for-row after block-order permutation, and
solve_qp_block must match the dense prox-ADMM solutions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.qp import banded as bd
from trajopt_tpu.qp import block_banded as bb
from trajopt_tpu.qp.admm import ADMMConfig, QPData, solve_qp
from trajopt_tpu.qp.admm_block import BlockQP, solve_qp_block


def _random_layout(rng, T, D, K, rows_per_step):
    """Random step-aligned banded rows, clamped-tail convention included."""
    n = T * D
    w = K * D
    starts = []
    for t in range(T):
        k = rng.integers(0, rows_per_step + 1)
        starts += [t * D] * int(k)
    if not starts:
        starts = [0]
    starts = np.asarray(starts, np.int64)
    m = starts.shape[0]
    W = rng.standard_normal((m, w))
    # zero weights on columns beyond the trajectory end (banded convention)
    for r in range(m):
        over = starts[r] + w - n
        if over > 0:
            W[r, w - over:] = 0.0
    return jnp.asarray(W), starts, n, w


@pytest.mark.parametrize("T,D,K,rps", [(6, 3, 1, 4), (8, 2, 2, 3),
                                       (5, 4, 3, 2), (7, 3, 4, 5)])
def test_block_ops_match_dense(T, D, K, rps):
    rng = np.random.default_rng(T * 100 + D * 10 + K)
    W, starts, n, w = _random_layout(rng, T, D, K, rps)
    m = W.shape[0]
    dense = bd.to_dense(bd.make_banded(W, starts, n))
    plan = bb.make_plan(starts, w, T, D)
    C = bb.from_rows(W, plan)

    np.testing.assert_allclose(np.asarray(bb.to_dense(C)).sum(),
                               np.asarray(dense).sum(), rtol=1e-12)

    x = jnp.asarray(rng.standard_normal(n))
    z_blk = bb.matvec(C, x)
    np.testing.assert_allclose(np.asarray(bb.from_block(z_blk, plan)),
                               np.asarray(dense @ x), rtol=1e-10, atol=1e-12)

    y = jnp.asarray(rng.standard_normal(m))
    y_blk = bb.to_block(y, plan)
    np.testing.assert_allclose(np.asarray(bb.rmatvec(C, y_blk)),
                               np.asarray(dense.T @ y), rtol=1e-10, atol=1e-12)

    rho = jnp.asarray(rng.uniform(0.5, 2.0, m))
    M = bb.at_r_a(C, bb.to_block(rho, plan))
    np.testing.assert_allclose(np.asarray(M),
                               np.asarray(dense.T @ (rho[:, None] * dense)),
                               rtol=1e-10, atol=1e-12)

    np.testing.assert_allclose(np.asarray(bb.col_inf_norms(C)),
                               np.asarray(jnp.max(jnp.abs(dense), axis=0)),
                               rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(bb.from_block(bb.row_inf_norms(C), plan)),
        np.asarray(jnp.max(jnp.abs(W), axis=1)), rtol=1e-12)

    # scale_cols / scale_rows
    d = jnp.asarray(rng.uniform(0.5, 2.0, n))
    np.testing.assert_allclose(
        np.asarray(bb.to_dense(bb.scale_cols(C, d))).sum(axis=0),
        np.asarray(dense * d[None, :]).sum(axis=0), rtol=1e-10, atol=1e-12)
    e = jnp.asarray(rng.uniform(0.5, 2.0, m))
    np.testing.assert_allclose(
        np.asarray(bb.from_block(
            bb.matvec(bb.scale_rows(C, bb.to_block(e, plan)), x), plan)),
        np.asarray(e * (dense @ x)), rtol=1e-10, atol=1e-12)


def test_make_plan_rejects_misaligned():
    with pytest.raises(ValueError):
        bb.make_plan(np.array([1, 3]), 3, 4, 3)


def _random_block_qp(rng, T=6, D=3, K=2, rps=3, seed_soft=True):
    W, starts, n, w = _random_layout(rng, T, D, K, rps)
    m = W.shape[0]
    G = rng.standard_normal((n, n))
    P = jnp.asarray(G @ G.T / n + 0.5 * np.eye(n))
    q = jnp.asarray(rng.standard_normal(n))
    mid = rng.standard_normal(m)
    l = jnp.asarray(mid - rng.uniform(0.1, 1.0, m))
    u = jnp.asarray(mid + rng.uniform(0.1, 1.0, m))
    c = rng.uniform(2.0, 20.0, m)
    if seed_soft:
        c[rng.uniform(size=m) < 0.5] = np.inf
    c = jnp.asarray(c)
    lb = jnp.asarray(-2.0 + rng.standard_normal(n) * 0.1)
    ub = jnp.asarray(2.0 + rng.standard_normal(n) * 0.1)
    return W, starts, n, w, P, q, l, u, c, lb, ub


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_solve_qp_block_matches_dense(seed):
    rng = np.random.default_rng(seed)
    W, starts, n, w, P, q, l, u, c, lb, ub = _random_block_qp(rng)
    T, D = 6, 3
    dense_C = bd.to_dense(bd.make_banded(W, starts, n))
    A = jnp.concatenate([dense_C, jnp.eye(n)])
    qp_dense = QPData(P=P, q=q, A=A,
                      l=jnp.concatenate([l, lb]),
                      u=jnp.concatenate([u, ub]),
                      c=jnp.concatenate([c, jnp.full((n,), jnp.inf)]))
    cfg = ADMMConfig(eps_abs=1e-9, eps_rel=1e-9, max_iter=20000,
                     adaptive_rho=False)
    x0 = jnp.zeros(n)
    rd = solve_qp(qp_dense, x0, cfg=cfg)

    plan = bb.make_plan(starts, w, T, D)
    inf = jnp.inf
    qp_blk = BlockQP(P=P, q=q, C=bb.from_rows(W, plan),
                     l=bb.to_block(l, plan, -inf),
                     u=bb.to_block(u, plan, inf),
                     c=bb.to_block(c, plan, 0.0),
                     lb=lb, ub=ub)
    rb = solve_qp_block(qp_blk, x0, cfg=cfg)
    assert bool(rd.converged) and bool(rb.converged)
    np.testing.assert_allclose(np.asarray(rb.x), np.asarray(rd.x),
                               rtol=1e-5, atol=1e-6)


def test_solve_qp_block_warm_start_fewer_iters():
    rng = np.random.default_rng(7)
    W, starts, n, w, P, q, l, u, c, lb, ub = _random_block_qp(rng)
    plan = bb.make_plan(starts, w, 6, 3)
    qp_blk = BlockQP(P=P, q=q, C=bb.from_rows(W, plan),
                     l=bb.to_block(l, plan, -jnp.inf),
                     u=bb.to_block(u, plan, jnp.inf),
                     c=bb.to_block(c, plan, 0.0), lb=lb, ub=ub)
    cfg = ADMMConfig(eps_abs=1e-9, eps_rel=1e-9, max_iter=20000,
                     adaptive_rho=False)
    cold = solve_qp_block(qp_blk, jnp.zeros(n), cfg=cfg)
    m_blk = plan.m_blk
    warm = solve_qp_block(qp_blk, cold.x,
                          zc0=cold.z[:m_blk], zb0=cold.z[m_blk:],
                          yc0=cold.y[:m_blk], yb0=cold.y[m_blk:], cfg=cfg)
    assert int(warm.iters) <= int(cold.iters)
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x),
                               rtol=1e-5, atol=1e-6)


def test_solve_qp_block_vmap():
    rng = np.random.default_rng(11)
    W, starts, n, w, P, q, l, u, c, lb, ub = _random_block_qp(rng)
    plan = bb.make_plan(starts, w, 6, 3)
    B = 4
    qs = jnp.stack([q + 0.1 * i for i in range(B)])
    qp0 = BlockQP(P=P, q=q, C=bb.from_rows(W, plan),
                  l=bb.to_block(l, plan, -jnp.inf),
                  u=bb.to_block(u, plan, jnp.inf),
                  c=bb.to_block(c, plan, 0.0), lb=lb, ub=ub)
    cfg = ADMMConfig(eps_abs=1e-8, eps_rel=1e-8, max_iter=20000,
                     adaptive_rho=False)

    def solve_one(qi):
        return solve_qp_block(qp0._replace(q=qi), jnp.zeros(n), cfg=cfg).x

    xs = jax.vmap(solve_one)(qs)
    for i in range(B):
        np.testing.assert_allclose(np.asarray(xs[i]),
                                   np.asarray(solve_one(qs[i])),
                                   rtol=1e-6, atol=1e-7)
