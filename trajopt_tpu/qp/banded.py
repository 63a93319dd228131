"""Banded (windowed) constraint matrices for the structured ADMM path.

Trajectory-optimization constraint rows touch only a small window of
decision variables: a discrete collision row touches one timestep's DOFs,
a cast/velocity row two adjacent steps, jerk four (SURVEY.md par. 5
'long-context': the KKT system is block-banded in time).  The dense
[m, n] A costs ~m*n floats of HBM traffic per ADMM matvec; the banded form
stores only [m, w] window weights plus static column indices — for the
flagship problem ~50x fewer bytes, which matters because the ADMM
iteration is bandwidth-bound, not FLOP-bound, on TPU.

A BandedMatrix is dense *within* each row's window (windows are static:
row r covers columns idx[r, :] = start[r] + arange(w)), so matvecs are a
gather + rowwise dot and the transpose is a segment scatter-add — all
static-shaped and vmap-friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BandedMatrix(NamedTuple):
    """A [m, n] matrix with per-row windows of static width w.

    W:   [m, w] window weights (the only runtime data).
    idx: [m, w] static column index of each weight (int32; may repeat a
         clamped column for rows narrower than w — their weights are 0).
    n:   number of columns.
    """

    W: jax.Array
    idx: jax.Array
    n: int

    @property
    def m(self) -> int:
        return self.W.shape[0]

    @property
    def w(self) -> int:
        return self.W.shape[1]


def make_banded(W, starts: np.ndarray, n: int) -> BandedMatrix:
    """Rows with windows [starts[r], starts[r] + w) (clamped to n)."""
    W = jnp.asarray(W)
    m, w = W.shape
    idx = np.minimum(np.asarray(starts)[:, None] + np.arange(w)[None, :],
                     n - 1).astype(np.int32)
    return BandedMatrix(W=W, idx=jnp.asarray(idx), n=n)


def matvec(B: BandedMatrix, x: jax.Array) -> jax.Array:
    """A @ x: gather windows, rowwise dot.  [m]"""
    return jnp.sum(B.W * x[B.idx], axis=1)


def rmatvec(B: BandedMatrix, y: jax.Array) -> jax.Array:
    """A' @ y: scatter-add of weighted rows.  [n]"""
    return jnp.zeros((B.n,), B.W.dtype).at[B.idx].add(B.W * y[:, None])


def to_dense(B: BandedMatrix) -> jax.Array:
    """[m, n] dense materialization (tests / fallback paths)."""
    out = jnp.zeros((B.m, B.n), B.W.dtype)
    rows = jnp.arange(B.m)[:, None]
    return out.at[rows, B.idx].add(B.W)


def at_r_a(B: BandedMatrix, rho: jax.Array) -> jax.Array:
    """A' diag(rho) A as a dense [n, n] (for the KKT factorization; built
    once per QP solve, so dense assembly cost is amortized)."""
    # outer products within each row's window, scattered into n x n
    WR = B.W * rho[:, None]                       # [m, w]
    contrib = jnp.einsum("mi,mj->mij", WR, B.W)   # [m, w, w]
    out = jnp.zeros((B.n, B.n), B.W.dtype)
    ii = B.idx[:, :, None]                        # [m, w, 1]
    jj = B.idx[:, None, :]                        # [m, 1, w]
    ii = jnp.broadcast_to(ii, contrib.shape)
    jj = jnp.broadcast_to(jj, contrib.shape)
    return out.at[ii, jj].add(contrib)


def row_inf_norms(B: BandedMatrix) -> jax.Array:
    return jnp.max(jnp.abs(B.W), axis=1)


def col_inf_norms(B: BandedMatrix) -> jax.Array:
    """Per-column max |A_ij| via scatter-max."""
    out = jnp.zeros((B.n,), B.W.dtype)
    return out.at[B.idx].max(jnp.abs(B.W))


def scale_rows(B: BandedMatrix, e: jax.Array) -> BandedMatrix:
    return B._replace(W=B.W * e[:, None])


def scale_cols(B: BandedMatrix, d: jax.Array) -> BandedMatrix:
    return B._replace(W=B.W * d[B.idx])
