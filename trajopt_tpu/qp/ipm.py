"""Batched primal-dual interior-point QP solver (Mehrotra predictor-corrector).

A SECOND ALGORITHM CLASS next to the prox-ADMM backend — the role the
reference's qpOASES / Gurobi / BPMPD backends play beside OSQP
(``trajopt_sco/src/solver_interface.cpp:255-292``; BPMPD itself is an
interior-point code).  ADMM is a first-order splitting method: fast to
medium accuracy, the TPU throughput path.  This IPM is a second-order
method: ~15-30 Newton steps to 1e-8 KKT residuals, the high-accuracy /
cross-validation path.  On a single v5e TensorCore the batched dense
factorizations are latency-bound (see ROADMAP.md "batched interior-point"),
so it is opt-in: ``convex_solver: "ipm"`` in JSON / TRAJOPT_CONVEX_SOLVER,
or ``solve_qp_ipm`` directly.

Problem form (same :class:`~trajopt_tpu.qp.admm.QPData` prox form)::

    minimize 0.5 x'Px + q'x + sum_i c_i * dist(A_i x, [l_i, u_i])

is lifted to the epigraph QP over w = (x, t), t in R^m::

    minimize 0.5 x'Px + q'x + c_eff' t
    s.t.     A x - t <= u        (lam_u)
            -A x - t <= -l       (lam_l)
                  -t <= 0        (lam_t)

with ``c_eff = min(c, big_m)``: finite penalty rows keep their exact L1
weight; hard rows (c = +inf) become big-M exact penalties, which are exact
for any big_m larger than the optimal dual magnitude (classical exact-L1
penalty bound) — at convergence their t_i are 0 to solver tolerance.  This
keeps every shape static and data-independent (no trace-time row masks),
which is what jit/vmap need.

Each Newton step eliminates the 3m inequality duals against the slack
complementarity to a dense (n+m) x (n+m) SPD system solved by batched
Cholesky.  Everything is one ``lax.while_loop``; batching is ``jax.vmap``
of :func:`solve_qp_ipm`.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from trajopt_tpu.qp.admm import ADMMResult, QPData


@dataclasses.dataclass(frozen=True)
class IPMConfig:
    """Static-under-jit configuration."""

    max_iter: int = 50
    eps: float = 1e-8          # duality-gap and residual target (per scale)
    big_m: float = 1e6         # exact-penalty weight standing in for c = inf
    reg: float = 1e-9          # static Tikhonov on the reduced system
    tau: float = 0.995         # fraction-to-boundary step clamp
    min_mu: float = 1e-12


class _IPMState(NamedTuple):
    w: jax.Array        # [n + m] primal (x, t)
    lam: jax.Array      # [3m] inequality duals
    s: jax.Array        # [3m] slacks, s = h - G w
    iters: jax.Array
    mu: jax.Array
    res: jax.Array      # inf-norm of the primal-dual residual
    converged: jax.Array


def _apply_G(A: jax.Array, x: jax.Array, t: jax.Array):
    """G w for the three stacked blocks; returns (Ax - t, -Ax - t, -t)."""
    Ax = A @ x
    return Ax - t, -Ax - t, -t


def _apply_GT(A: jax.Array, lu: jax.Array, ll: jax.Array, lt: jax.Array):
    """G' lam, split into the x and t components."""
    gx = A.T @ (lu - ll)
    gt = -(lu + ll + lt)
    return gx, gt


def solve_qp_ipm(qp: QPData, x0: jax.Array | None = None,
                 cfg: IPMConfig = IPMConfig()) -> ADMMResult:
    """Solve one prox-form QP by primal-dual IPM; vmap over a batch.

    Returns an :class:`ADMMResult` for drop-in use where ``solve_qp`` is
    expected: ``y`` is the interval-row dual ``lam_u - lam_l`` (the same
    multiplier ADMM's y converges to), ``iters`` counts Newton steps.
    """
    dtype = qp.P.dtype
    n = qp.P.shape[0]
    m = qp.A.shape[0]
    c_eff = jnp.minimum(qp.c, cfg.big_m)

    # --- strictly-interior start (standard Mehrotra-style heuristic) ----
    x = jnp.zeros(n, dtype) if x0 is None else x0.astype(dtype)
    Ax = qp.A @ x
    viol = jnp.maximum(Ax - qp.u, qp.l - Ax)
    t = jnp.maximum(viol, 0.0) + 1.0
    w = jnp.concatenate([x, t])
    one = jnp.ones((), dtype)
    lam = jnp.concatenate([jnp.full(m, one), jnp.full(m, one),
                           jnp.full(m, one)])
    su, sl, st = _apply_G(qp.A, x, t)
    s = jnp.concatenate([qp.u - su, -qp.l - sl, -st])

    h_scale = 1.0 + jnp.maximum(jnp.max(jnp.abs(qp.u)), jnp.max(jnp.abs(qp.l)))
    g_scale = 1.0 + jnp.max(jnp.abs(qp.q))

    def residuals(w, lam, s):
        x, t = w[:n], w[n:]
        lu, ll, lt = lam[:m], lam[m:2 * m], lam[2 * m:]
        gx, gt = _apply_GT(qp.A, lu, ll, lt)
        r_dx = qp.P @ x + qp.q + gx
        r_dt = c_eff + gt
        gu, gl, gtt = _apply_G(qp.A, x, t)
        r_p = jnp.concatenate([gu + s[:m] - qp.u,
                               gl + s[m:2 * m] + qp.l,
                               gtt + s[2 * m:]])
        return jnp.concatenate([r_dx, r_dt]), r_p

    def step(state: _IPMState) -> _IPMState:
        w, lam, s = state.w, state.lam, state.s
        x, t = w[:n], w[n:]
        lam_s = lam / s                              # [3m] > 0
        du, dl, dt_ = lam_s[:m], lam_s[m:2 * m], lam_s[2 * m:]

        # Reduced Hessian of the barrier-augmented system:
        #   K = H + G' diag(lam/s) G, H = blkdiag(P, 0)
        # with blocks  Kxx = P + A'(du+dl)A,  Kxt = -A'(du-dl),
        #              Ktt = diag(du+dl+dt).
        dsum = du + dl
        Kxx = qp.P + qp.A.T @ (dsum[:, None] * qp.A)
        Kxt = -(qp.A.T * (du - dl)[None, :])          # [n, m]
        ktt = dsum + dt_
        K = jnp.zeros((n + m, n + m), dtype)
        K = K.at[:n, :n].set(Kxx)
        K = K.at[:n, n:].set(Kxt)
        K = K.at[n:, :n].set(Kxt.T)
        K = K.at[n:, n:].set(jnp.diag(ktt))
        K = K + cfg.reg * jnp.eye(n + m, dtype=dtype)
        chol = cho_factor(K)

        r_d, r_p = residuals(w, lam, s)
        mu = jnp.dot(lam, s) / (3 * m)

        def newton(r_d, r_p, r_c):
            """Solve the full PD system for (dw, dlam, ds) given residuals
            (dual, primal, complementarity r_c = Lam s - target)."""
            # ds = -(r_p + G dw);  dlam = -(r_c + Lam ds)/s
            # => K dw = -r_d + G'( (r_c - Lam r_p) / s )
            rhs_corr = (r_c - lam * r_p) / s
            gx, gt = _apply_GT(qp.A, rhs_corr[:m], rhs_corr[m:2 * m],
                               rhs_corr[2 * m:])
            rhs = -r_d + jnp.concatenate([gx, gt])
            dw = cho_solve(chol, rhs)
            gu, gl, gtt = _apply_G(qp.A, dw[:n], dw[n:])
            Gdw = jnp.concatenate([gu, gl, gtt])
            ds = -(r_p + Gdw)
            dlam = -(r_c + lam * ds) / s
            return dw, dlam, ds

        # Predictor (affine scaling): target complementarity 0
        dw_a, dlam_a, ds_a = newton(r_d, r_p, lam * s)

        def max_step(v, dv):
            # largest a in (0, 1] with v + a dv >= (1 - tau) v
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -one), jnp.inf)
            return jnp.minimum(1.0, cfg.tau * jnp.min(ratio))

        a_p = max_step(s, ds_a)
        a_d = max_step(lam, dlam_a)
        mu_aff = jnp.dot(lam + a_d * dlam_a, s + a_p * ds_a) / (3 * m)
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, cfg.min_mu)) ** 3, 0.0, 1.0)

        # Corrector: centering + Mehrotra second-order term
        r_c = lam * s + dlam_a * ds_a - sigma * mu
        dw_c, dlam_c, ds_c = newton(r_d, r_p, r_c)

        a_p = max_step(s, ds_c)
        a_d = max_step(lam, dlam_c)
        w_n = w + a_p * dw_c
        lam_n = lam + a_d * dlam_c
        s_n = s + a_p * ds_c

        r_d_n, r_p_n = residuals(w_n, lam_n, s_n)
        mu_n = jnp.dot(lam_n, s_n) / (3 * m)
        res = jnp.maximum(jnp.max(jnp.abs(r_d_n)) / g_scale,
                          jnp.max(jnp.abs(r_p_n)) / h_scale)
        conv = (mu_n <= cfg.eps * 10.0) & (res <= cfg.eps * 10.0)
        # guard: a non-finite step (singular K) keeps the previous iterate
        ok = jnp.all(jnp.isfinite(w_n)) & jnp.all(jnp.isfinite(lam_n)) \
            & jnp.all(s_n > 0) & jnp.all(lam_n > 0)
        return _IPMState(
            w=jnp.where(ok, w_n, w), lam=jnp.where(ok, lam_n, lam),
            s=jnp.where(ok, s_n, s), iters=state.iters + 1,
            mu=jnp.where(ok, mu_n, state.mu),
            res=jnp.where(ok, res, state.res),
            converged=jnp.where(ok, conv, jnp.asarray(True)),
        )

    r_d0, r_p0 = residuals(w, lam, s)
    init = _IPMState(
        w=w, lam=lam, s=s, iters=jnp.asarray(0, jnp.int32),
        mu=jnp.dot(lam, s) / (3 * m),
        res=jnp.maximum(jnp.max(jnp.abs(r_d0)) / g_scale,
                        jnp.max(jnp.abs(r_p0)) / h_scale),
        converged=jnp.asarray(False),
    )
    state = jax.lax.while_loop(
        lambda st: (~st.converged) & (st.iters < cfg.max_iter), step, init)

    x = state.w[:n]
    lam = state.lam
    y = lam[:m] - lam[m:2 * m]
    return ADMMResult(
        x=x, z=qp.A @ x, y=y, iters=state.iters,
        pri_res=state.res, dua_res=state.mu, converged=state.converged)
