"""Per-step block-banded constraint matrices: the gather-free banded form.

Trajectory constraint rows touch a window of K adjacent timesteps
(discrete collision: 1, velocity/cast: 2, acceleration: 3, jerk: 4 — the
block-tridiagonal time structure noted in SURVEY.md §5 'long-context').
The dense [m, n] A costs ~m*n floats of HBM traffic per ADMM matvec, and
the gather-banded form (qp/banded.py) is *slower* than dense on TPU
because XLA gathers/scatters don't realize the byte savings (measured in
round 1: ~3000us/iter vs 576us dense at the flagship shapes).

This module stores rows grouped by their window's step: ``Wb[T, R, K*D]``
where R is the (padded) max rows per step.  Matvecs become::

    z[t, r] = sum_k Wb[t, r, k] * xwin[t, k],   xwin[t] = x[t*D : t*D + K*D]

i.e. a windowed einsum whose operands are built with static slices and
shifted adds — NO gathers anywhere in the iteration.  Measured on a v5e-1
at the flagship shapes (B=96, T=30, D=7, R=16): 49.8us per ADMM iteration
vs 576us dense — 11.6x.

Row bookkeeping (which original row lands in which (step, slot)) is static
numpy computed once per problem structure in :func:`make_plan`; runtime
row vectors (bounds, penalties, duals) are permuted into block order with
a single small static gather per QP solve, never inside the iteration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BlockPlan(NamedTuple):
    """Static layout: original banded rows -> (step, slot) block positions.

    Attributes:
      T: number of timesteps (n = T * D).
      D: variables per step.
      K: window span in steps (window of step t covers cols [t*D, (t+K)*D)).
      R: padded rows per step (max over steps).
      m: number of real rows.
      w: original per-row window width (<= K*D).
      blk_index: [m] flat block-row index (step * R + slot) of each row.
      scatter_idx: [m * w] flat index into (T*R*K*D,) placing each row
        weight inside its block window.
    """

    T: int
    D: int
    K: int
    R: int
    m: int
    w: int
    blk_index: np.ndarray
    scatter_idx: np.ndarray

    @property
    def n(self) -> int:
        return self.T * self.D

    @property
    def m_blk(self) -> int:
        return self.T * self.R


class BlockBanded(NamedTuple):
    """Runtime block-banded matrix: window weights in block layout."""

    Wb: jax.Array  # [T, R, K*D]
    plan: BlockPlan


def make_plan(starts: np.ndarray, w: int, T: int, D: int) -> BlockPlan:
    """Layout rows with windows [starts[r], starts[r] + w) into step blocks.

    Requires step-aligned windows (starts % D == 0), which all trajectory
    terms produce (their rows start at a timestep boundary).  Rows whose
    window would overhang the trajectory end are assigned to the last
    feasible step with an in-window offset; their out-of-range weights are
    zero by the banded_jac clamping convention (qp/banded.py).
    """
    starts = np.asarray(starts, np.int64)
    n = T * D
    if starts.size and (np.any(starts % D != 0) or np.any(starts < 0)
                        or np.any(starts >= n)):
        raise ValueError("block-banded layout requires step-aligned row "
                         "windows (starts % n_dof_total == 0)")
    K = max(1, -(-w // D))  # ceil
    if K > T:
        raise ValueError(f"window spans {K} steps > T={T}")
    m = int(starts.shape[0])
    step = np.minimum(starts // D, T - K)
    offset = starts - step * D
    # slot assignment: running count per step
    slot = np.zeros(m, np.int64)
    counts = np.zeros(T, np.int64)
    for r in range(m):
        slot[r] = counts[step[r]]
        counts[step[r]] += 1
    R = max(int(counts.max()) if m else 1, 1)
    KD = K * D
    blk_index = step * R + slot
    # scatter target for weight (r, j): flat (step, slot, offset + j); the
    # clamped zero-weight tail of short rows lands (harmlessly, via add)
    # on the last in-window column.
    col = np.minimum(offset[:, None] + np.arange(w)[None, :], KD - 1)
    scatter_idx = (blk_index[:, None] * KD + col).reshape(-1)
    return BlockPlan(T=T, D=D, K=K, R=R, m=m, w=w,
                     blk_index=blk_index.astype(np.int32),
                     scatter_idx=scatter_idx.astype(np.int32))


def from_rows(W: jax.Array, plan: BlockPlan) -> BlockBanded:
    """Pack [m, w] row weights into the [T, R, K*D] block layout."""
    flat = jnp.zeros((plan.m_blk * plan.K * plan.D,), W.dtype)
    flat = flat.at[jnp.asarray(plan.scatter_idx)].add(W.reshape(-1))
    return BlockBanded(
        Wb=flat.reshape(plan.T, plan.R, plan.K * plan.D), plan=plan)


def to_block(v: jax.Array, plan: BlockPlan, fill: float = 0.0) -> jax.Array:
    """Permute an [m] row vector into padded block order [T*R]."""
    out = jnp.full((plan.m_blk,), fill, v.dtype)
    return out.at[jnp.asarray(plan.blk_index)].set(v)


def from_block(vb: jax.Array, plan: BlockPlan) -> jax.Array:
    """Recover the [m] original-order row vector from block order."""
    return vb[jnp.asarray(plan.blk_index)]


def _window(x: jax.Array, plan: BlockPlan) -> jax.Array:
    """[n] -> [T, K*D] sliding step windows via static slices (no gathers)."""
    T, D, K = plan.T, plan.D, plan.K
    xs = x.reshape(T, D)
    if K == 1:
        return xs
    xp = jnp.concatenate([xs, jnp.zeros((K - 1, D), x.dtype)])
    return jnp.concatenate([xp[k:k + T] for k in range(K)], axis=-1)


def _unwindow_add(g: jax.Array, plan: BlockPlan) -> jax.Array:
    """[T, K*D] windowed contributions -> [n] via shifted adds."""
    T, D, K = plan.T, plan.D, plan.K
    if K == 1:
        return g.reshape(T * D)
    parts = g.reshape(T, K, D)
    out = jnp.zeros((T + K - 1, D), g.dtype)
    for k in range(K):
        out = out.at[k:k + T].add(parts[:, k])
    return out[:T].reshape(T * D)


def matvec(B: BlockBanded, x: jax.Array) -> jax.Array:
    """A @ x in block row order [T*R]."""
    xw = _window(x, B.plan)
    return jnp.einsum("trk,tk->tr", B.Wb, xw).reshape(B.plan.m_blk)


def rmatvec(B: BlockBanded, y: jax.Array) -> jax.Array:
    """A' @ y for y in block row order."""
    g = jnp.einsum("trk,tr->tk", B.Wb, y.reshape(B.plan.T, B.plan.R))
    return _unwindow_add(g, B.plan)


def row_inf_norms(B: BlockBanded) -> jax.Array:
    return jnp.max(jnp.abs(B.Wb), axis=-1).reshape(B.plan.m_blk)


def col_inf_norms(B: BlockBanded) -> jax.Array:
    """Per-column max |A_ij| via windowed max + shifted combine."""
    T, D, K = B.plan.T, B.plan.D, B.plan.K
    cw = jnp.max(jnp.abs(B.Wb), axis=1)  # [T, K*D]
    if K == 1:
        return cw.reshape(T * D)
    parts = cw.reshape(T, K, D)
    out = jnp.zeros((T + K - 1, D), cw.dtype)
    for k in range(K):
        out = out.at[k:k + T].max(parts[:, k])
    return out[:T].reshape(T * D)


def scale_rows(B: BlockBanded, e: jax.Array) -> BlockBanded:
    """Scale rows by e given in block order [T*R]."""
    return B._replace(Wb=B.Wb * e.reshape(B.plan.T, B.plan.R)[:, :, None])


def scale_cols(B: BlockBanded, d: jax.Array) -> BlockBanded:
    dw = _window(d, B.plan)  # [T, K*D]
    return B._replace(Wb=B.Wb * dw[:, None, :])


def at_r_a(B: BlockBanded, rho: jax.Array) -> jax.Array:
    """A' diag(rho) A as dense [n, n] (rho in block order).

    Built once per QP solve for the KKT factorization; the per-step
    [K*D, K*D] outer blocks are scattered at static offsets.
    """
    plan = B.plan
    T, D, K = plan.T, plan.D, plan.K
    KD = K * D
    n = plan.n
    blocks = jnp.einsum("tri,tr,trj->tij", B.Wb,
                        rho.reshape(T, plan.R), B.Wb)  # [T, KD, KD]
    tt = np.arange(T)[:, None, None]
    # steps > T-K hold no rows (their blocks are zero); clamp their indices.
    ii = np.minimum(tt * D + np.arange(KD)[None, :, None], n - 1)
    jj = np.minimum(tt * D + np.arange(KD)[None, None, :], n - 1)
    out = jnp.zeros((n, n), B.Wb.dtype)
    return out.at[jnp.asarray(np.broadcast_to(ii, blocks.shape)),
                  jnp.asarray(np.broadcast_to(jj, blocks.shape))].add(blocks)


def to_dense(B: BlockBanded) -> jax.Array:
    """[m_blk, n] dense materialization in block row order (tests)."""
    plan = B.plan
    T, D, K, R = plan.T, plan.D, plan.K, plan.R
    out = jnp.zeros((plan.m_blk, plan.n), B.Wb.dtype)
    rows = (np.arange(T)[:, None, None] * R
            + np.arange(R)[None, :, None])
    # steps > T-K hold no rows; clamp their (zero-valued) column targets.
    cols = np.minimum(np.arange(T)[:, None, None] * D
                      + np.arange(K * D)[None, None, :], plan.n - 1)
    return out.at[jnp.asarray(np.broadcast_to(rows, B.Wb.shape)),
                  jnp.asarray(np.broadcast_to(cols, B.Wb.shape))].add(B.Wb)
