"""Pallas TPU kernel: fused block-banded ADMM chunks, sub-batch blocked.

The block-banded ADMM iteration (qp/admm_block.py) is HBM-bound: every
iteration re-streams the dense [n, n] explicit inverse Minv (~17 MB at the
flagship B=96, n=210 shapes) plus the banded constraint blocks from HBM,
because XLA cannot keep loop-invariant operands resident in VMEM across
``fori_loop`` iterations.  This kernel runs a whole ``check_every``-long
chunk of iterations as ONE ``pallas_call`` with Minv / banded weights /
bounds pinned in VMEM, so each chunk loads the working set once instead of
``check_every`` times.

Two design points, both forced by measurement:

1. BATCH BLOCKING.  One-problem-per-program (the natural vmap batching of
   a pallas_call, and what qp/pallas_admm.py does for the dense path)
   serializes the batch over the grid and loses the VPU's lane parallelism
   — measured round 1 at ~0.5 ms/iteration-wave, no better than XLA.  A
   ``custom_vmap`` rule intercepts the solver's ``vmap`` and launches a
   grid over SUB-BATCHES of ``sub_batch`` problems; inside the kernel every
   op is batched over the sub-batch while staying under the ~16 MB VMEM
   budget (~0.25 MB per problem at flagship shapes).

2. MOSAIC-LEGAL CONTRACTIONS.  Mosaic rejects in-kernel reshapes that
   merge/split the minor (tiled) dims and dot_generals with >1 batch dim,
   which rules out the [T, R, K*D]-windowed einsums of qp/block_banded.py.
   Instead the banded matvecs are expressed as SEGMENT-SUM MATMULS against
   constant one-hot step-indicator matrices (probed OK on v5e):

       (C x)[r, t]  = sum_k ((W_k ⊙ x) @ S_k)[t]      'brj,jt->brt'
       (C' y)[j]    = sum_k sum_r W_k[r, j] * (y_r @ S_k')[j]   'brt,tj->brj'

   where W_k is slot r's window-part-k weights scattered at their absolute
   columns and S_k[j, t] = 1 iff column j belongs to step t + k.  Rows in
   the [R, T] slot-major layout; conversions to/from the solver's block row
   order happen outside the kernel in XLA.

Residual checks and the convergence while_loop stay outside in XLA (once
per chunk), identical to the unfused path — the kernel replaces only the
``fori_loop`` of iterations, so results match admm_block.py to float
rounding.  Gated by ``ADMMConfig.use_pallas``; on non-TPU backends the
kernel runs in interpreter mode (tests validate numerics on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=32)
def _segment_mats(T: int, D: int, K: int):
    """S_k [K, n, T] one-hot step indicators: S_k[j, t] = 1 iff column j
    lies in step t + k (zero where t + k >= T)."""
    n = T * D
    S = np.zeros((K, n, T), np.float32)
    j_step = np.arange(n) // D
    for k in range(K):
        t = j_step - k
        ok = (t >= 0) & (t < T)
        S[k, np.arange(n)[ok], t[ok]] = 1.0
    return S


def _iter_chunk(S, Minv, Wk, q, lc, uc, cr, rho_c, lb, ub, b_diag,
                x, zc, zb, yc, yb, *, T, D, K, R, sigma, alpha, rho_b,
                n_iters):
    """``n_iters`` relaxed prox-ADMM iterations in the kernel layout
    (same update order as admm_block.solve_qp_block_prepared's admm_iter).

    Batched over a leading axis; zc/yc/lc/uc/cr/rho_c are [*, R, T]
    slot-major, x/zb/... are [*, n], Wk is [*, K, R, n]; S is the shared
    [K, n, T] one-hot step-indicator stack (pallas kernels cannot capture
    array constants, so it rides as an input).  Shared by the pallas
    kernel body and the XLA fallback, so both paths are one code.
    """
    dtype = x.dtype
    inv_rho_c = 1.0 / rho_c
    inv_rho_b = 1.0 / rho_b

    def cmatvec(v):
        """C @ v -> [*, R, T]"""
        out = None
        for k in range(K):
            zk = jnp.einsum("brj,jt->brt", Wk[:, k] * v[:, None, :], S[k],
                            preferred_element_type=dtype)
            out = zk if out is None else out + zk
        return out

    def crmatvec(y3):
        """C' @ y -> [*, n]"""
        out = None
        for k in range(K):
            ye = jnp.einsum("brt,tj->brj", y3, S[k].T,
                            preferred_element_type=dtype)
            gk = jnp.sum(Wk[:, k] * ye, axis=1)
            out = gk if out is None else out + gk
        return out

    def body(_, carry):
        x, zc, zb, yc, yb = carry
        rhs = (sigma * x - q + crmatvec(rho_c * zc - yc)
               + b_diag * (rho_b * zb - yb))
        xt = jnp.einsum("bij,bj->bi", Minv, rhs, preferred_element_type=dtype)
        ztc = cmatvec(xt)
        ztb = b_diag * xt
        x_new = alpha * xt + (1.0 - alpha) * x
        zrc = alpha * ztc + (1.0 - alpha) * zc
        zrb = alpha * ztb + (1.0 - alpha) * zb
        v = zrc + yc * inv_rho_c
        above = v > uc
        below = v < lc
        zc_new = jnp.where(above, jnp.maximum(uc, v - cr),
                           jnp.where(below, jnp.minimum(lc, v + cr), v))
        zb_new = jnp.clip(zrb + yb * inv_rho_b, lb, ub)
        yc_new = yc + rho_c * (zrc - zc_new)
        yb_new = yb + rho_b * (zrb - zb_new)
        return (x_new, zc_new, zb_new, yc_new, yb_new)

    return jax.lax.fori_loop(0, n_iters, body, (x, zc, zb, yc, yb))


def _chunk_and_check(S, Minv, Wk, P, q, lc, uc, cr, rho_c, lb, ub, b_diag,
                     Ec3, Eb, Dd, cobj, x, zc, zb, yc, yb, *,
                     T, D, K, R, sigma, alpha, rho_b, n_iters):
    """One fused chunk: ``n_iters`` iterations + the OSQP-style residual
    stats (the chunk() math of admm_block.solve_qp_block_prepared).

    Returns (x, zc, zb, yc, yb, pri, dua, ax_n, z_n, pAty_n) with the
    stats as [*, 1] per-problem values (rank-1 blocks cannot be
    sub-batch blocked); the eps comparisons (which also need q_norm)
    happen outside.  cobj is [*, 1]; rest as in _iter_chunk.
    """
    dtype = x.dtype
    x, zc, zb, yc, yb = _iter_chunk(
        S, Minv, Wk, q, lc, uc, cr, rho_c, lb, ub, b_diag,
        x, zc, zb, yc, yb, T=T, D=D, K=K, R=R, sigma=sigma, alpha=alpha,
        rho_b=rho_b, n_iters=n_iters)

    def cmatvec(v):
        out = None
        for k in range(K):
            zk = jnp.einsum("brj,jt->brt", Wk[:, k] * v[:, None, :], S[k],
                            preferred_element_type=dtype)
            out = zk if out is None else out + zk
        return out

    def crmatvec(y3):
        out = None
        for k in range(K):
            ye = jnp.einsum("brt,tj->brj", y3, S[k].T,
                            preferred_element_type=dtype)
            gk = jnp.sum(Wk[:, k] * ye, axis=1)
            out = gk if out is None else out + gk
        return out

    def inf3(v):   # [*, R, T] -> [*, 1]  (rank-1 outputs cannot be
        # sub-batch blocked by Mosaic, so stats stay 2D)
        return jnp.max(jnp.max(jnp.abs(v), axis=1), axis=1, keepdims=True)

    def inf2(v):   # [*, n] -> [*, 1]
        return jnp.max(jnp.abs(v), axis=1, keepdims=True)

    Cx = cmatvec(x)
    Bx = b_diag * x
    Px = jnp.einsum("bij,bj->bi", P, x, preferred_element_type=dtype)
    Aty = crmatvec(yc) + b_diag * yb
    inv_cD = 1.0 / (cobj * Dd)          # [*, n]
    pri = jnp.maximum(inf3((Cx - zc) / Ec3), inf2((Bx - zb) / Eb))
    dua = inf2((Px + q + Aty) * inv_cD)
    ax_n = jnp.maximum(inf3(Cx / Ec3), inf2(Bx / Eb))
    z_n = jnp.maximum(inf3(zc / Ec3), inf2(zb / Eb))
    pAty_n = jnp.maximum(inf2(Px * inv_cD), inf2(Aty * inv_cD))
    return x, zc, zb, yc, yb, pri, dua, ax_n, z_n, pAty_n


@functools.lru_cache(maxsize=64)
def _build_chunk_fn(T: int, D: int, K: int, R: int, n_iters: int,
                    sigma: float, alpha: float, rho_b: float,
                    sub_batch: int, interpret: bool):
    """Cached per problem-structure + config: a custom-vmap fused
    chunk+check function.

    Unbatched call -> plain XLA loop (identical math).  vmapped call ->
    one pallas_call with grid over ceil(B / sub_batch) sub-batches.
    """
    n = T * D
    S_np = _segment_mats(T, D, K)
    static = dict(T=T, D=D, K=K, R=R, sigma=sigma, alpha=alpha, rho_b=rho_b,
                  n_iters=n_iters)
    N_STATE, N_OUT = 5, 10
    N_ARGS = 20  # Minv Wk P q lc uc cr rho_c lb ub bd Ec3 Eb Dd cobj
    #            x zc zb yc yb   (S excluded)

    def kernel(*refs):
        ins = [r[:] for r in refs[:1 + N_ARGS]]
        outs = refs[1 + N_ARGS:]
        res = _chunk_and_check(*ins, **static)
        for o_ref, val in zip(outs, res):
            o_ref[:] = val

    def pallas_chunk(B, *args):
        Bs = min(sub_batch, B)
        nb = -(-B // Bs)
        pad = nb * Bs - B
        if pad:
            def padded(a, fill):
                return jnp.concatenate(
                    [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])
            # pad rho_c and the scale vectors (divided by) with 1;
            # everything else with 0 — padded lanes are discarded.
            one_pad = {7, 11, 12, 13, 14}  # rho_c, Ec3, Eb, Dd, cobj
            args = tuple(padded(a, 1.0 if i in one_pad else 0.0)
                         for i, a in enumerate(args))
        dtype = args[0].dtype
        S = jnp.asarray(S_np, dtype)  # shared block, pinned to index 0
        shapes = [a.shape[1:] for a in args]
        out_elem = [(n,), (R, T), (n,), (R, T), (n,),
                    (1,), (1,), (1,), (1,), (1,)]
        out_shapes = [(nb * Bs,) + s for s in out_elem]
        out = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((K, n, T), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)] +
                     [pl.BlockSpec((Bs,) + s,
                                   lambda i, _s=len(s): (i,) + (0,) * _s,
                                   memory_space=pltpu.VMEM) for s in shapes],
            out_specs=[pl.BlockSpec((Bs,) + s,
                                    lambda i, _s=len(s): (i,) + (0,) * _s,
                                    memory_space=pltpu.VMEM)
                       for s in out_elem],
            out_shape=[jax.ShapeDtypeStruct(s, dtype) for s in out_shapes],
            interpret=interpret,
        )(S, *args)
        if pad:
            out = [o[:B] for o in out]
        return tuple(out)

    @jax.custom_batching.custom_vmap
    def chunk(*args):
        S = jnp.asarray(S_np, args[0].dtype)
        out = _chunk_and_check(S, *[a[None] for a in args], **static)
        return tuple(o[0] for o in out)

    @chunk.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = tuple(a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                     for a, b in zip(args, in_batched))
        return pallas_chunk(axis_size, *args), (True,) * N_OUT

    return chunk


def pack_wk(Wb: jax.Array, plan) -> jax.Array:
    """[T, R, K*D] banded weights -> [K, R, n] absolute-column layers.

    Layer k holds window-part k's weights at columns (t + k) * D + d, i.e.
    the slot-major flat layout shifted right by k steps (zero fill).  Runs
    outside the kernel, once per QP solve.
    """
    T, D, K, R = plan.T, plan.D, plan.K, plan.R
    n = T * D
    layers = []
    for k in range(K):
        flat = jnp.transpose(Wb[:, :, k * D:(k + 1) * D],
                             (1, 0, 2)).reshape(R, n)
        if k:
            flat = jnp.pad(flat, ((0, 0), (k * D, 0)))[:, :n]
        layers.append(flat)
    return jnp.stack(layers)


def _to_slot_major(v: jax.Array, T: int, R: int) -> jax.Array:
    """Block row order [T*R] -> slot-major [R, T] (outside the kernel)."""
    return v.reshape(T, R).T


def _from_slot_major(v3: jax.Array) -> jax.Array:
    return v3.T.reshape(-1)


def solve_qp_block_fused(prep, lb, ub, x0, zc0=None, zb0=None, yc0=None,
                         yb0=None, cfg=None):
    """Fully fused counterpart of admm_block.solve_qp_block_prepared: every
    chunk (check_every iterations + the residual check) is ONE pallas
    launch, and the convergence while_loop carries slot-major state so no
    layout conversions happen between chunks (the per-chunk to3/from3 +
    separate check ops were measured to eat the kernel's 4x per-iteration
    win).  Per-problem call; batch via vmap.  Semantics and warm-start
    handling match solve_qp_block_prepared.
    """
    from typing import NamedTuple

    from trajopt_tpu.qp import block_banded as bb
    from trajopt_tpu.qp.admm import ADMMResult

    sq, b_diag, sc = prep.sq, prep.b_diag, prep.sc
    plan = sq.C.plan
    T, D, K, R = plan.T, plan.D, plan.K, plan.R
    n = T * D
    m = plan.m_blk
    dtype = sq.P.dtype
    rho_c, Minv, q_norm = prep.rho_c, prep.Minv, prep.q_norm

    lb_s = lb * sc.E_b
    ub_s = ub * sc.E_b
    x = x0.astype(dtype) / sc.D
    zc = bb.matvec(sq.C, x) if zc0 is None else zc0.astype(dtype) * sc.E_c
    zb = b_diag * x if zb0 is None else zb0.astype(dtype) * sc.E_b
    yc = (jnp.zeros(m, dtype) if yc0 is None
          else yc0.astype(dtype) * (sc.c_obj / sc.E_c))
    yb = (jnp.zeros(n, dtype) if yb0 is None
          else yb0.astype(dtype) * (sc.c_obj / sc.E_b))
    cr_c = jnp.where(jnp.isinf(sq.c), jnp.inf, sq.c / rho_c)

    # The kernel bakes rho_b in as the static cfg.rho; the unfused path
    # uses the prep.rho_b ARRAY (currently uniform == cfg.rho).  Guard the
    # assumption so a future non-uniform (adaptive-rho) prepare_qp_block
    # fails loudly here instead of silently diverging from the XLA path.
    if hasattr(prep, "rho_b"):
        from jax import core as _jc
        rb = prep.rho_b
        if not isinstance(rb, _jc.Tracer):
            rb_np = np.asarray(rb)
            if rb_np.size and not np.allclose(rb_np, float(cfg.rho)):
                raise ValueError(
                    "solve_qp_block_fused assumes uniform rho_b == cfg.rho; "
                    "prepare_qp_block produced a non-uniform rho_b — extend "
                    "the kernel to take rho_b as an operand first")
    interpret = jax.default_backend() != "tpu"
    fn = _build_chunk_fn(T, D, K, R, cfg.check_every, float(cfg.sigma),
                         float(cfg.alpha), float(cfg.rho),
                         int(cfg.pallas_sub_batch), interpret)
    Wk = pack_wk(sq.C.Wb, plan)
    to3 = lambda v: _to_slot_major(v, T, R)  # noqa: E731
    l3, u3, cr3, rho3, Ec3 = map(to3, (sq.l, sq.u, cr_c, rho_c, sc.E_c))
    cobj1 = jnp.reshape(sc.c_obj, (1,)).astype(dtype)

    class _FState(NamedTuple):
        x: jax.Array
        zc3: jax.Array
        zb: jax.Array
        yc3: jax.Array
        yb: jax.Array
        iters: jax.Array
        pri: jax.Array
        dua: jax.Array
        converged: jax.Array

    def chunk(s: _FState) -> _FState:
        x, zc3, zb, yc3, yb, pri, dua, ax_n, z_n, pAty_n = fn(
            Minv, Wk, sq.P, sq.q, l3, u3, cr3, rho3, lb_s, ub_s, b_diag,
            Ec3, sc.E_b, sc.D, cobj1, s.x, s.zc3, s.zb, s.yc3, s.yb)
        pri, dua, ax_n, z_n, pAty_n = (v[0] for v in
                                       (pri, dua, ax_n, z_n, pAty_n))
        eps_pri = cfg.eps_abs + cfg.eps_rel * jnp.maximum(ax_n, z_n)
        eps_dua = cfg.eps_abs + cfg.eps_rel * jnp.maximum(pAty_n, q_norm)
        conv = (pri <= eps_pri) & (dua <= eps_dua)
        return _FState(x=x, zc3=zc3, zb=zb, yc3=yc3, yb=yb,
                       iters=s.iters + cfg.check_every,
                       pri=pri, dua=dua, converged=conv)

    init = _FState(x=x, zc3=to3(zc), zb=zb, yc3=to3(yc), yb=yb,
                   iters=jnp.asarray(0, jnp.int32),
                   pri=jnp.asarray(jnp.inf, dtype),
                   dua=jnp.asarray(jnp.inf, dtype),
                   converged=jnp.asarray(False))
    s = jax.lax.while_loop(
        lambda s: (~s.converged) & (s.iters < cfg.max_iter), chunk, init)
    zc_f = _from_slot_major(s.zc3)
    yc_f = _from_slot_major(s.yc3)
    return ADMMResult(
        x=s.x * sc.D,
        z=jnp.concatenate([zc_f / sc.E_c, s.zb / sc.E_b]),
        y=jnp.concatenate([yc_f * (sc.E_c / sc.c_obj),
                           s.yb * (sc.E_b / sc.c_obj)]),
        iters=s.iters, pri_res=s.pri, dua_res=s.dua, converged=s.converged,
    )
