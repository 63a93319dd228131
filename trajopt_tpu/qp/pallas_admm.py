"""Pallas TPU kernel: a fused block of ADMM iterations in VMEM.

The XLA ADMM path launches ~6 small HBM-bound ops per iteration; for the
QP sizes trajectory optimization produces (n ~ 256, m ~ 512 padded) the
whole working set — A, A', M^-1, and the iterate vectors — fits in VMEM
(~1.3 MB/problem), so a chunk of ``n_iters`` iterations runs as ONE kernel
per problem with zero HBM traffic between iterations.  Residual checks and
rho adaptation stay outside (once per chunk), exactly as in
:mod:`trajopt_tpu.qp.admm`.

Row-vector matmuls ([1,m]@[m,n]) underfill the MXU's 8-sublane granularity
but the kernel is latency-bound, not FLOP-bound; the win is removing
per-op dispatch + HBM roundtrips.  Batched problems map to the Pallas grid
(one program per problem) via vmap's pallas batching rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _admm_chunk_kernel(Minv_ref, A_ref, At_ref, q_ref, l_ref, u_ref,
                       cr_ref, rho_ref, x_ref, z_ref, y_ref,
                       xo_ref, zo_ref, yo_ref, *, sigma, alpha, n_iters):
    """One fused chunk: state vectors as [1, N] rows; matrices in VMEM."""
    A = A_ref[:]          # [m, n]
    At = At_ref[:]        # [n, m]
    Minv = Minv_ref[:]    # [n, n]
    q = q_ref[:]          # [1, n]
    l = l_ref[:]          # [1, m]
    u = u_ref[:]          # [1, m]
    c_over_rho = cr_ref[:]  # [1, m] (inf for hard rows)
    rho = rho_ref[:]      # [1, m]

    def body(_, carry):
        x, z, y = carry
        rzy = rho * z - y
        rhs = sigma * x - q + jnp.dot(rzy, A, preferred_element_type=jnp.float32)
        xt = jnp.dot(rhs, Minv, preferred_element_type=jnp.float32)  # Minv symmetric
        zt = jnp.dot(xt, At, preferred_element_type=jnp.float32)
        x_new = alpha * xt + (1.0 - alpha) * x
        zr = alpha * zt + (1.0 - alpha) * z
        v = zr + y / rho
        above = v > u
        below = v < l
        z_new = jnp.where(above, jnp.maximum(u, v - c_over_rho),
                          jnp.where(below, jnp.minimum(l, v + c_over_rho), v))
        y_new = y + rho * (zr - z_new)
        return (x_new, z_new, y_new)

    x, z, y = jax.lax.fori_loop(
        0, n_iters, body, (x_ref[:], z_ref[:], y_ref[:]))
    xo_ref[:] = x
    zo_ref[:] = z
    yo_ref[:] = y


def admm_chunk_pallas(Minv, A, q, l, u, c, rho_vec, x, z, y, *,
                      sigma: float, alpha: float, n_iters: int):
    """Run n_iters ADMM iterations fused in VMEM.  Unpadded shapes in,
    unpadded out; padding to (8,128) tiles happens here.

    Padded rows behave as free rows (l=-inf, u=+inf, rho=1, c=inf) and
    padded cols ride an identity block in M^-1 with zero A columns.
    """
    m, n = A.shape
    dtype = A.dtype
    n_p = _round_up(n, 128)
    m_p = _round_up(m, 128)
    inf = jnp.asarray(jnp.inf, dtype)

    A_p = jnp.zeros((m_p, n_p), dtype).at[:m, :n].set(A)
    Minv_p = jnp.eye(n_p, dtype=dtype).at[:n, :n].set(Minv)
    q_p = jnp.zeros((1, n_p), dtype).at[0, :n].set(q)
    l_p = jnp.full((1, m_p), -inf, dtype).at[0, :m].set(l)
    u_p = jnp.full((1, m_p), inf, dtype).at[0, :m].set(u)
    rho_p = jnp.ones((1, m_p), dtype).at[0, :m].set(rho_vec)
    cr_p = jnp.full((1, m_p), inf, dtype).at[0, :m].set(c / rho_vec)
    x_p = jnp.zeros((1, n_p), dtype).at[0, :n].set(x)
    z_p = jnp.zeros((1, m_p), dtype).at[0, :m].set(z)
    y_p = jnp.zeros((1, m_p), dtype).at[0, :m].set(y)

    kernel = functools.partial(_admm_chunk_kernel, sigma=sigma, alpha=alpha,
                               n_iters=n_iters)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    xo, zo, yo = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n_p), dtype),
            jax.ShapeDtypeStruct((1, m_p), dtype),
            jax.ShapeDtypeStruct((1, m_p), dtype),
        ),
        in_specs=[vspec] * 11,
        out_specs=(vspec, vspec, vspec),
    )(Minv_p, A_p, A_p.T, q_p, l_p, u_p, cr_p, rho_p, x_p, z_p, y_p)
    return xo[0, :n], zo[0, :m], yo[0, :m]
