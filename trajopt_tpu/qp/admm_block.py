"""Block-banded prox-ADMM: the gather-free structured QP path.

Same splitting, Ruiz equilibration, termination, and warm-start semantics
as qp/admm.py (dense) and qp/admm_structured.py (gather-banded), but the
constraint block streams as per-step [T, R, K*D] windows
(qp/block_banded.py) so every iteration is reshapes + static slices +
einsums.  Measured per-iteration cost at the flagship shapes (B=96, T=30,
D=7): 49.8us vs 576us dense — the banded bandwidth win the XLA-gather
variant could not realize (ROADMAP round-1 finding).

Row vectors (l, u, c) and warm starts arrive in block order [T*R] — the
padded slots are inert rows (W=0, l=-inf, u=+inf, c=0) that stay
identically zero through the iteration and never touch the residuals.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from trajopt_tpu.qp import block_banded as bb
from trajopt_tpu.qp.admm import ADMMConfig, ADMMResult


class BlockQP(NamedTuple):
    """min 0.5 x'Px + q'x + sum_i c_i dist((Cx)_i, [l,u]) + box(x in [lb,ub]).

    C is block-banded; l, u, c are in block row order (length plan.m_blk).
    """

    P: jax.Array
    q: jax.Array
    C: bb.BlockBanded
    l: jax.Array
    u: jax.Array
    c: jax.Array
    lb: jax.Array
    ub: jax.Array


class _Scale(NamedTuple):
    D: jax.Array
    E_c: jax.Array
    E_b: jax.Array
    c_obj: jax.Array


def _ruiz(qp: BlockQP, iters: int):
    """Ruiz equilibration of [C; I] matching qp/admm_structured.py::_ruiz."""
    dtype = qp.P.dtype
    n = qp.P.shape[0]
    m = qp.C.plan.m_blk
    eps = jnp.asarray(1e-12, dtype)

    def inv_sqrt(v):
        return jnp.where(v < eps, 1.0, 1.0 / jnp.sqrt(v))

    P, q, C = qp.P, qp.q, qp.C
    b_diag = jnp.ones(n, dtype)
    D = jnp.ones(n, dtype)
    E_c = jnp.ones(m, dtype)
    E_b = jnp.ones(n, dtype)
    c_obj = jnp.ones((), dtype)

    for _ in range(iters):
        col = jnp.maximum(jnp.max(jnp.abs(P), axis=0),
                          jnp.maximum(bb.col_inf_norms(C), jnp.abs(b_diag)))
        d = inv_sqrt(col)
        P = d[:, None] * P * d[None, :]
        q = d * q
        C = bb.scale_cols(C, d)
        b_diag = b_diag * d
        e_c = inv_sqrt(bb.row_inf_norms(C))
        C = bb.scale_rows(C, e_c)
        e_b = inv_sqrt(jnp.abs(b_diag))
        b_diag = b_diag * e_b
        g_den = jnp.maximum(jnp.mean(jnp.max(jnp.abs(P), axis=0)),
                            jnp.max(jnp.abs(q)))
        g = jnp.where(g_den < eps, 1.0, 1.0 / g_den)
        P, q = g * P, g * q
        c_obj = c_obj * g
        D, E_c, E_b = D * d, E_c * e_c, E_b * e_b

    scaled = BlockQP(
        P=P, q=q, C=C,
        l=qp.l * E_c, u=qp.u * E_c,
        c=jnp.where(jnp.isinf(qp.c), jnp.inf, c_obj * qp.c / E_c),
        lb=qp.lb * E_b, ub=qp.ub * E_b,
    )
    return scaled, b_diag, _Scale(D=D, E_c=E_c, E_b=E_b, c_obj=c_obj)


def _prox(v, l, u, c_over_rho):
    above = v > u
    below = v < l
    return jnp.where(above, jnp.maximum(u, v - c_over_rho),
                     jnp.where(below, jnp.minimum(l, v + c_over_rho), v))


def _inf(v):
    return jnp.max(jnp.abs(v)) if v.size else jnp.zeros((), v.dtype)


class PreparedBlockQP(NamedTuple):
    """Scaled QP data + factorization, valid for any trust box.

    Everything here is independent of the box bounds (lb, ub): the Ruiz
    scalings come from P/C only and M = P + sigma I + A'RA does not involve
    bounds.  One prepare() therefore serves every QP solve of a trust-region
    loop (the reference refactorizes per QP inside OSQP; on TPU the
    factorization is the dominant cost, so it is hoisted — see qp/inverse.py).
    """

    sq: BlockQP          # scaled problem; its lb/ub fields are unused
    b_diag: jax.Array
    sc: _Scale
    rho_c: jax.Array
    rho_b: jax.Array
    Minv: jax.Array
    q_norm: jax.Array


def prepare_qp_block(qp: BlockQP, cfg: ADMMConfig = ADMMConfig(),
                     minv0: jax.Array | None = None) -> PreparedBlockQP:
    """Equilibrate and factor the x-update system.

    ``minv0``: optional warm seed for the inverse (the previous SQP
    step's ``Minv``); with a seed the explicit inverse is refreshed by
    safeguarded Newton-Schulz (batched matmuls, MXU-friendly) instead of
    the latency-bound batched Cholesky.
    """
    from trajopt_tpu.qp.admm import apply_dual_cost_scale
    from trajopt_tpu.qp.inverse import cholesky_inverse, ns_inverse

    dtype = qp.P.dtype
    n = qp.P.shape[0]
    sq, b_diag, sc = _ruiz(qp, cfg.ruiz_iters)
    # dual-magnitude OBJECTIVE rescale (ADMMConfig.rho_dual_scale):
    # mathematically identical to boosting every rho by gamma, but keeps
    # the rho vectors compile-time constants so the TPU iteration body
    # stays fused (a traced rho_b measured 4x the body cost at identical
    # trip counts — round-5 micro) — see qp/admm.py apply_dual_cost_scale.
    P2, q2, c2, c_obj2 = apply_dual_cost_scale(sq.P, sq.q, sq.c, sc.c_obj,
                                               cfg)
    sq = sq._replace(P=P2, q=q2, c=c2)
    sc = sc._replace(c_obj=c_obj2)

    hard_c = jnp.isinf(sq.c)
    eq_c = (sq.u - sq.l) < 1e-10
    rho_c = jnp.where(hard_c & eq_c, cfg.rho * cfg.rho_eq_scale, cfg.rho)
    rho_c = jnp.clip(rho_c, cfg.rho_min, cfg.rho_max)
    rho_b = jnp.full((n,), cfg.rho, dtype)

    M = sq.P + cfg.sigma * jnp.eye(n, dtype=dtype) \
        + bb.at_r_a(sq.C, rho_c) + jnp.diag(rho_b * b_diag * b_diag)
    if minv0 is None:
        Minv = cholesky_inverse(M)
    else:
        Minv = ns_inverse(M, minv0, tol=cfg.ns_tol, max_iter=cfg.ns_max_iter,
                          power_iters=cfg.ns_power_iters,
                          coarse=cfg.ns_coarse)
    return PreparedBlockQP(sq=sq, b_diag=b_diag, sc=sc, rho_c=rho_c,
                           rho_b=rho_b, Minv=Minv, q_norm=_inf(qp.q))


def solve_qp_block_prepared(prep: PreparedBlockQP, lb, ub, x0,
                            zc0=None, zb0=None, yc0=None, yb0=None,
                            cfg: ADMMConfig = ADMMConfig()) -> ADMMResult:
    """ADMM iterations on a prepared (equilibrated + factored) QP with the
    given box bounds.  Warm starts arrive unscaled (block row order)."""
    if cfg.use_pallas:
        # Fully fused path: each chunk (iterations + residual check) is one
        # VMEM-resident pallas launch; state stays slot-major across chunks
        # (qp/pallas_block.py).  Results match this path to float rounding.
        from trajopt_tpu.qp.pallas_block import solve_qp_block_fused
        return solve_qp_block_fused(prep, lb, ub, x0, zc0=zc0, zb0=zb0,
                                    yc0=yc0, yb0=yb0, cfg=cfg)
    sq_nobox, b_diag, sc = prep.sq, prep.b_diag, prep.sc
    dtype = sq_nobox.P.dtype
    n = sq_nobox.P.shape[0]
    m = sq_nobox.C.plan.m_blk
    sq = sq_nobox._replace(lb=lb * sc.E_b, ub=ub * sc.E_b)
    rho_c, rho_b, Minv, q_norm = prep.rho_c, prep.rho_b, prep.Minv, prep.q_norm

    x = x0.astype(dtype) / sc.D
    zc = bb.matvec(sq.C, x) if zc0 is None else zc0.astype(dtype) * sc.E_c
    zb = b_diag * x if zb0 is None else zb0.astype(dtype) * sc.E_b
    yc = (jnp.zeros(m, dtype) if yc0 is None
          else yc0.astype(dtype) * (sc.c_obj / sc.E_c))
    yb = (jnp.zeros(n, dtype) if yb0 is None
          else yb0.astype(dtype) * (sc.c_obj / sc.E_b))
    alpha = cfg.alpha
    sigma = cfg.sigma
    cr_c = jnp.where(jnp.isinf(sq.c), jnp.inf, sq.c / rho_c)
    inf_b = jnp.full((n,), jnp.inf, dtype)
    # Hoisted reciprocals: per-iteration divisions by TRACED rho vectors
    # measured 4x the whole body cost on TPU (a constant rho_b
    # strength-reduces to a multiply; a traced one emits a divide that
    # breaks the body's VPU fusion) — benchmarks round 5, /tmp/qp_micro3.
    inv_rho_c = 1.0 / rho_c
    inv_rho_b = 1.0 / rho_b

    def admm_iter(carry):
        x, zc, zb, yc, yb = carry
        rhs = sigma * x - sq.q + bb.rmatvec(sq.C, rho_c * zc - yc) \
            + b_diag * (rho_b * zb - yb)
        xt = Minv @ rhs
        ztc = bb.matvec(sq.C, xt)
        ztb = b_diag * xt
        x_new = alpha * xt + (1.0 - alpha) * x
        zrc = alpha * ztc + (1.0 - alpha) * zc
        zrb = alpha * ztb + (1.0 - alpha) * zb
        zc_new = _prox(zrc + yc * inv_rho_c, sq.l, sq.u, cr_c)
        zb_new = _prox(zrb + yb * inv_rho_b, sq.lb, sq.ub, inf_b)
        yc_new = yc + rho_c * (zrc - zc_new)
        yb_new = yb + rho_b * (zrb - zb_new)
        return (x_new, zc_new, zb_new, yc_new, yb_new)

    class _State(NamedTuple):
        x: jax.Array
        zc: jax.Array
        zb: jax.Array
        yc: jax.Array
        yb: jax.Array
        iters: jax.Array
        pri: jax.Array
        dua: jax.Array
        converged: jax.Array

    def chunk(s: _State) -> _State:
        carry = (s.x, s.zc, s.zb, s.yc, s.yb)
        carry = jax.lax.fori_loop(0, cfg.check_every,
                                  lambda _, c: admm_iter(c), carry)
        x, zc, zb, yc, yb = carry
        Cx = bb.matvec(sq.C, x)
        Bx = b_diag * x
        Px = sq.P @ x
        Aty = bb.rmatvec(sq.C, yc) + b_diag * yb
        pri = jnp.maximum(_inf((Cx - zc) / sc.E_c), _inf((Bx - zb) / sc.E_b))
        stat = (Px + sq.q + Aty) / (sc.c_obj * sc.D)
        dua = _inf(stat)
        ax_n = jnp.maximum(_inf(Cx / sc.E_c), _inf(Bx / sc.E_b))
        z_n = jnp.maximum(_inf(zc / sc.E_c), _inf(zb / sc.E_b))
        eps_pri = cfg.eps_abs + cfg.eps_rel * jnp.maximum(ax_n, z_n)
        eps_dua = cfg.eps_abs + cfg.eps_rel * jnp.maximum(
            jnp.maximum(_inf(Px / (sc.c_obj * sc.D)),
                        _inf(Aty / (sc.c_obj * sc.D))), q_norm)
        conv = (pri <= eps_pri) & (dua <= eps_dua)
        return _State(x=x, zc=zc, zb=zb, yc=yc, yb=yb,
                      iters=s.iters + cfg.check_every,
                      pri=pri, dua=dua, converged=conv)

    init = _State(x=x, zc=zc, zb=zb, yc=yc, yb=yb,
                  iters=jnp.asarray(0, jnp.int32),
                  pri=jnp.asarray(jnp.inf, dtype),
                  dua=jnp.asarray(jnp.inf, dtype),
                  converged=jnp.asarray(False))
    s = jax.lax.while_loop(lambda s: (~s.converged) & (s.iters < cfg.max_iter),
                           chunk, init)
    return ADMMResult(
        x=s.x * sc.D,
        z=jnp.concatenate([s.zc / sc.E_c, s.zb / sc.E_b]),
        y=jnp.concatenate([s.yc * (sc.E_c / sc.c_obj),
                           s.yb * (sc.E_b / sc.c_obj)]),
        iters=s.iters, pri_res=s.pri, dua_res=s.dua, converged=s.converged,
    )


def solve_qp_block(qp: BlockQP, x0, zc0=None, zb0=None, yc0=None, yb0=None,
                   cfg: ADMMConfig = ADMMConfig()) -> ADMMResult:
    """One-shot prepare + solve (box bounds taken from ``qp.lb``/``qp.ub``).

    Returns ADMMResult with z = concat([z_c (block order), z_b]), y
    likewise.  Semantics match solve_qp_structured row-for-row after
    block-order permutation."""
    prep = prepare_qp_block(qp, cfg)
    return solve_qp_block_prepared(prep, qp.lb, qp.ub, x0,
                                   zc0=zc0, zb0=zb0, yc0=yc0, yb0=yb0,
                                   cfg=cfg)
