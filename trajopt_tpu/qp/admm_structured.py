"""Structured prox-ADMM: constraint matrix = [banded rows; identity box].

The dense solver (qp/admm.py) streams a [m, n] A twice per iteration; for
trajectory problems A is [step-local constraint rows; identity trust-box
rows], so this variant runs the same OSQP-style iteration with:

  * banded matvec/rmatvec for the constraint block (w-window gathers), and
  * elementwise ops for the identity block,

cutting per-iteration HBM traffic by the density ratio (~50x on the
flagship problem).  The KKT matrix M = P + sigma I + C'RC + diag(rho_b)
is still assembled/inverted densely ONCE per solve (fixed rho), which the
iteration count amortizes.  Semantics (Ruiz equilibration, prox rows,
termination, warm starts) match qp/admm.py so the SQP driver can switch
paths freely.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from trajopt_tpu.qp import banded as bd
from trajopt_tpu.qp.admm import ADMMConfig, ADMMResult


class StructuredQP(NamedTuple):
    """min 0.5 x'Px + q'x + sum_i c_i dist(C_i x, [l,u]) + box(x in [lb,ub])."""

    P: jax.Array
    q: jax.Array
    C: bd.BandedMatrix
    l: jax.Array      # [m_c] bounds on C x
    u: jax.Array
    c: jax.Array      # [m_c] penalty (inf = hard)
    lb: jax.Array     # [n] hard box on x
    ub: jax.Array


class _Scale(NamedTuple):
    D: jax.Array
    E_c: jax.Array
    E_b: jax.Array
    c_obj: jax.Array


def _ruiz(qp: StructuredQP, iters: int):
    """Faithful port of qp/admm.py::ruiz_equilibrate for A = [C; I]."""
    dtype = qp.P.dtype
    n = qp.P.shape[0]
    m = qp.C.m
    eps = jnp.asarray(1e-12, dtype)

    def inv_sqrt(v):
        return jnp.where(v < eps, 1.0, 1.0 / jnp.sqrt(v))

    P, q, C = qp.P, qp.q, qp.C
    b_diag = jnp.ones(n, dtype)   # scaled identity-block entries
    D = jnp.ones(n, dtype)
    E_c = jnp.ones(m, dtype)
    E_b = jnp.ones(n, dtype)
    c_obj = jnp.ones((), dtype)

    for _ in range(iters):
        col = jnp.maximum(jnp.max(jnp.abs(P), axis=0),
                          jnp.maximum(bd.col_inf_norms(C), jnp.abs(b_diag)))
        d = inv_sqrt(col)
        P = d[:, None] * P * d[None, :]
        q = d * q
        C = bd.scale_cols(C, d)
        b_diag = b_diag * d
        e_c = inv_sqrt(bd.row_inf_norms(C))
        C = bd.scale_rows(C, e_c)
        e_b = inv_sqrt(jnp.abs(b_diag))
        b_diag = b_diag * e_b
        g_den = jnp.maximum(jnp.mean(jnp.max(jnp.abs(P), axis=0)),
                            jnp.max(jnp.abs(q)))
        g = jnp.where(g_den < eps, 1.0, 1.0 / g_den)
        P, q = g * P, g * q
        c_obj = c_obj * g
        D, E_c, E_b = D * d, E_c * e_c, E_b * e_b

    scaled = StructuredQP(
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
    return jnp.max(jnp.abs(v))


def solve_qp_structured(qp: StructuredQP, x0, zc0=None, zb0=None,
                        yc0=None, yb0=None,
                        cfg: ADMMConfig = ADMMConfig()) -> ADMMResult:
    """Returns ADMMResult with z = concat([z_c, z_b]), y likewise (matching
    the dense solver's row order [C; I])."""
    dtype = qp.P.dtype
    n = qp.P.shape[0]
    m = qp.C.m
    orig_q = qp.q
    sq, b_diag, sc = _ruiz(qp, cfg.ruiz_iters)
    # dual-magnitude objective rescale (see qp/admm.py
    # apply_dual_cost_scale) BEFORE the warm-start dual scaling below,
    # which must use the final c_obj
    from trajopt_tpu.qp.admm import apply_dual_cost_scale

    P2, q2, c2, c_obj2 = apply_dual_cost_scale(sq.P, sq.q, sq.c, sc.c_obj,
                                               cfg)
    sq = sq._replace(P=P2, q=q2, c=c2)
    sc = sc._replace(c_obj=c_obj2)

    x = x0.astype(dtype) / sc.D
    zc = bd.matvec(sq.C, x) if zc0 is None else zc0.astype(dtype) * sc.E_c
    zb = b_diag * x if zb0 is None else zb0.astype(dtype) * sc.E_b
    yc = (jnp.zeros(m, dtype) if yc0 is None
          else yc0.astype(dtype) * (sc.c_obj / sc.E_c))
    yb = (jnp.zeros(n, dtype) if yb0 is None
          else yb0.astype(dtype) * (sc.c_obj / sc.E_b))

    hard_c = jnp.isinf(sq.c)
    eq_c = (sq.u - sq.l) < 1e-10
    rho_c = jnp.where(hard_c & eq_c, cfg.rho * cfg.rho_eq_scale, cfg.rho)
    rho_c = jnp.clip(rho_c, cfg.rho_min, cfg.rho_max)
    rho_b = jnp.full((n,), cfg.rho, dtype)

    # KKT matrix (fixed rho -> factor once)
    M = sq.P + cfg.sigma * jnp.eye(n, dtype=dtype) \
        + bd.at_r_a(sq.C, rho_c) + jnp.diag(rho_b * b_diag * b_diag)
    L = jnp.linalg.cholesky(M)
    eye = jnp.eye(n, dtype=dtype)
    Minv = solve_triangular(L.T, solve_triangular(L, eye, lower=True),
                            lower=False)

    q_norm = _inf(orig_q)
    alpha = cfg.alpha
    sigma = cfg.sigma
    cr_c = jnp.where(hard_c, jnp.inf, sq.c / rho_c)
    inf_b = jnp.full((n,), jnp.inf, dtype)

    def admm_iter(carry):
        x, zc, zb, yc, yb = carry
        rhs = sigma * x - sq.q + bd.rmatvec(sq.C, rho_c * zc - yc) \
            + b_diag * (rho_b * zb - yb)
        xt = Minv @ rhs
        ztc = bd.matvec(sq.C, xt)
        ztb = b_diag * xt
        x_new = alpha * xt + (1.0 - alpha) * x
        zrc = alpha * ztc + (1.0 - alpha) * zc
        zrb = alpha * ztb + (1.0 - alpha) * zb
        zc_new = _prox(zrc + yc / rho_c, sq.l, sq.u, cr_c)
        zb_new = _prox(zrb + yb / rho_b, sq.lb, sq.ub, inf_b)
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
        Cx = bd.matvec(sq.C, x)
        Bx = b_diag * x
        Px = sq.P @ x
        Aty = bd.rmatvec(sq.C, yc) + b_diag * yb
        # unscaled residuals
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
