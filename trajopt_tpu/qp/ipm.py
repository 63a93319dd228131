"""Batched primal-dual interior-point QP solver (Mehrotra predictor-corrector).

A SECOND ALGORITHM CLASS next to the prox-ADMM backend — the role the
reference's qpOASES / Gurobi / BPMPD backends play beside OSQP
(``trajopt_sco/src/solver_interface.cpp:255-292``; BPMPD itself is an
interior-point code).  ADMM is a first-order splitting method: fast to
medium accuracy, the TPU throughput path.  This IPM is a second-order
method: ~10-30 Newton steps to a 1e-10-level complementarity gap and
~1e-6-relative KKT residuals, the high-accuracy / cross-validation path.  On a single v5e TensorCore the batched dense
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

with ``c_eff = where(isfinite(c), c, big_m)``: finite penalty rows keep
their exact L1 weight (including SQP merit coefficients escalated to
``initial_merit_error_coeff * ratio^max_increases`` = 1e6); ONLY hard rows
(c = +inf) become big-M exact penalties, which are exact for any big_m
larger than the optimal dual magnitude (classical exact-L1 penalty bound)
— at convergence their t_i are 0 to solver tolerance, and convergence is
gated on that slack so big-M inexactness cannot report success.  This
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
    eps: float = 1e-8          # complementarity-gap (mu) target
    # Relative primal/dual residual target.  Looser than eps by design: at
    # big-M *equality* rows (l = u) all three slacks collapse to
    # t = 3mu/c_eff ~ 1e-15, the barrier weights lam/s reach ~1e18, and K
    # is numerically singular in f64.  The residual floor is then problem-
    # dependent (2e-7 .. 2e-4 relative observed) even with iterative
    # refinement — the error lives in the degenerate dual-split directions
    # while the PRIMAL iterate matches a 1e-9 ADMM solve to ~5e-5 and the
    # objective to ~1e-8 (see test_ipm_matches_admm_on_random_qps).
    # Solution quality is governed by the mu gate; this gate only rejects
    # genuinely unsolved problems.
    eps_res: float = 1e-3
    # FLOOR of the exact-penalty weight standing in for c = inf.  The
    # effective big-M is derived from data per problem:
    #   max(big_m, 10 * max finite c, 10 * max |q|)
    # so hard rows always dominate every finite penalty row (SQP merit
    # escalation reaches 1e6 -> big-M 1e7 there) and the box-row dual bound
    # O(|Px + q|) stays covered, while well-scaled problems keep the
    # well-conditioned 1e4 weight.  A fixed large value instead (1e7
    # always) stretches the central path ~1e3x and stalls mu within
    # max_iter on ordinary problems.
    big_m: float = 1e4
    # Hard-row slack gate: a lane only reports converged when every
    # c = +inf row's epigraph slack t_i is below this (relative to the
    # bound scale) — big-M inexactness then surfaces as NOT converged
    # instead of a silently-violated hard constraint.
    hard_tol: float = 1e-6
    # Static Tikhonov on the reduced system.  1e-11 is the f64 default:
    # 1e-9 leaves a ~1e-7 relative-residual floor on ill-conditioned
    # big-M systems (grazes the eps=1e-8 gate); f32 callers should raise
    # this to ~1e-6 together with eps.
    reg: float = 1e-11
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
    # Only c = +inf rows get the big-M stand-in; finite rows (however
    # large — merit escalation reaches 1e6) keep their exact L1 weight.
    # The stand-in is data-derived (see IPMConfig.big_m).
    hard = ~jnp.isfinite(qp.c)
    c_fin_max = jnp.max(jnp.where(hard, 0.0, qp.c), initial=0.0)
    big_m = jnp.maximum(jnp.asarray(cfg.big_m, dtype),
                        10.0 * jnp.maximum(c_fin_max,
                                           jnp.max(jnp.abs(qp.q))))
    c_eff = jnp.where(hard, big_m, qp.c)

    # One-sided rows (l = -inf or u = +inf, e.g. hinge penalty rows) are
    # MASKED out of their barrier block instead of clamped to a fake finite
    # bound: the masked block keeps lam = 0 and a dummy slack s = 1 forever
    # (dlam = -(r_c + lam ds)/s is identically 0 when lam = r_c = 0), so it
    # contributes nothing to K, mu, or the residuals — all shapes stay
    # static for jit/vmap.
    mask_u = jnp.isfinite(qp.u)
    mask_l = jnp.isfinite(qp.l)
    u_s = jnp.where(mask_u, qp.u, 0.0)
    l_s = jnp.where(mask_l, qp.l, 0.0)
    mask = jnp.concatenate([mask_u, mask_l, jnp.ones(m, bool)])
    n_act = jnp.sum(mask_u) + jnp.sum(mask_l) + m  # complementarity pairs

    # --- strictly-interior start ----------------------------------------
    x = jnp.zeros(n, dtype) if x0 is None else x0.astype(dtype)
    Ax = qp.A @ x
    viol = jnp.maximum(jnp.where(mask_u, Ax - u_s, 0.0),
                       jnp.where(mask_l, l_s - Ax, 0.0))
    t = jnp.maximum(viol, 0.0) + 1.0
    w = jnp.concatenate([x, t])
    # Duals start on the t-stationarity manifold (lu + ll + lt = c_eff per
    # row, so r_dt = 0 at the first iterate): big-M rows otherwise need the
    # duals to climb orders of magnitude from lam = 1, which Mehrotra
    # steps overshoot into divergence on ill-conditioned problems.
    n_blocks = mask_u.astype(dtype) + mask_l.astype(dtype) + 1.0
    lam1 = jnp.maximum(c_eff / n_blocks, 1e-3)
    lam = jnp.concatenate([lam1, lam1, lam1])
    su, sl, st = _apply_G(qp.A, x, t)
    s = jnp.concatenate([u_s - su, -l_s - sl, -st])
    lam = jnp.where(mask, lam, 0.0)
    s = jnp.where(mask, s, 1.0)

    h_scale = 1.0 + jnp.maximum(jnp.max(jnp.abs(u_s)), jnp.max(jnp.abs(l_s)))
    # Per-block dual scales: x-stationarity rows scale with the gradient
    # data, t-stationarity rows with the (possibly big-M) penalty weights.
    # One combined max would let big_m = 1e4 hide a 1e-5-absolute
    # x-stationarity error behind a "relative" 1e-9.
    gx_scale = 1.0 + jnp.max(jnp.abs(qp.q))
    gt_scale = 1.0 + jnp.max(c_eff)
    g_scale = jnp.concatenate([jnp.full(n, gx_scale), jnp.full(m, gt_scale)])

    def residuals(w, lam, s):
        x, t = w[:n], w[n:]
        lu, ll, lt = lam[:m], lam[m:2 * m], lam[2 * m:]
        gx, gt = _apply_GT(qp.A, lu, ll, lt)
        r_dx = qp.P @ x + qp.q + gx
        r_dt = c_eff + gt
        gu, gl, gtt = _apply_G(qp.A, x, t)
        r_p = jnp.concatenate([gu + s[:m] - u_s,
                               gl + s[m:2 * m] + l_s,
                               gtt + s[2 * m:]])
        return jnp.concatenate([r_dx, r_dt]), jnp.where(mask, r_p, 0.0)

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
        mu = jnp.dot(lam, s) / n_act

        def newton(r_d, r_p, r_c):
            """Solve the full PD system for (dw, dlam, ds) given residuals
            (dual, primal, complementarity r_c = Lam s - target).  r_c must
            be 0 on masked rows so their (lam, s) stay pinned at (0, 1)."""
            # ds = -(r_p + G dw);  dlam = -(r_c + Lam ds)/s
            # => K dw = -r_d + G'( (r_c - Lam r_p) / s )
            rhs_corr = (r_c - lam * r_p) / s
            gx, gt = _apply_GT(qp.A, rhs_corr[:m], rhs_corr[m:2 * m],
                               rhs_corr[2 * m:])
            rhs = -r_d + jnp.concatenate([gx, gt])
            dw = cho_solve(chol, rhs)
            # One round of iterative refinement: near convergence the
            # barrier weights lam/s reach ~1e12, and the raw Cholesky solve
            # leaves ~cond * eps_machine absolute error in dw; refinement
            # recovers ~4 digits of x-stationarity at the cost of one
            # extra matvec + trisolve pair.
            dw = dw + cho_solve(chol, rhs - K @ dw)
            gu, gl, gtt = _apply_G(qp.A, dw[:n], dw[n:])
            Gdw = jnp.concatenate([gu, gl, gtt])
            ds = jnp.where(mask, -(r_p + Gdw), 0.0)
            dlam = -(r_c + lam * ds) / s
            return dw, dlam, ds

        # Predictor (affine scaling): target complementarity 0
        dw_a, dlam_a, ds_a = newton(r_d, r_p, lam * s)

        def max_step(v, dv):
            # largest a in (0, 1] with v + a dv >= (1 - tau) v
            one = jnp.ones((), dtype)
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -one), jnp.inf)
            return jnp.minimum(1.0, cfg.tau * jnp.min(ratio))

        a_p = max_step(s, ds_a)
        a_d = max_step(lam, dlam_a)
        mu_aff = jnp.dot(lam + a_d * dlam_a, s + a_p * ds_a) / n_act
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, cfg.min_mu)) ** 3, 0.0, 1.0)

        # Corrector: centering + Mehrotra second-order term (masked rows
        # keep r_c = 0: lam*s = dlam_a*ds_a = 0 there, and the centering
        # term must not leak in)
        r_c = jnp.where(mask, lam * s + dlam_a * ds_a - sigma * mu, 0.0)
        dw_c, dlam_c, ds_c = newton(r_d, r_p, r_c)

        a_p = max_step(s, ds_c)
        a_d = max_step(lam, dlam_c)
        w_n = w + a_p * dw_c
        lam_n = lam + a_d * dlam_c
        s_n = s + a_p * ds_c

        r_d_n, r_p_n = residuals(w_n, lam_n, s_n)
        mu_n = jnp.dot(lam_n, s_n) / n_act
        res = jnp.maximum(jnp.max(jnp.abs(r_d_n) / g_scale),
                          jnp.max(jnp.abs(r_p_n)) / h_scale)
        # Hard rows must end with ~zero epigraph slack: big-M is only
        # exact when the t_i of every c = +inf row vanish.
        t_hard = jnp.max(jnp.where(hard, w_n[n:], 0.0))
        conv = ((mu_n <= cfg.eps * 10.0) & (res <= cfg.eps_res)
                & (t_hard <= cfg.hard_tol * h_scale))
        # guard: a non-finite step (singular K) keeps the previous iterate;
        # masked rows are pinned at (lam, s) = (0, 1), exclude them from
        # the strict-positivity check
        ok = jnp.all(jnp.isfinite(w_n)) & jnp.all(jnp.isfinite(lam_n)) \
            & jnp.all(jnp.where(mask, s_n, 1.0) > 0) \
            & jnp.all(jnp.where(mask, lam_n, 1.0) > 0)
        # Freeze converged lanes: under vmap the combined while_loop keeps
        # stepping until EVERY lane's cond is false, and extra Newton steps
        # at mu ~ min_mu would drift a converged lane away from the
        # single-problem result.
        ok = ok & ~state.converged
        # A failed (non-finite / boundary-crossing) step keeps the previous
        # iterate, reports NOT converged, and forces loop exit via the
        # iteration counter — it must not masquerade as success.
        halt = ~ok & ~state.converged
        return _IPMState(
            w=jnp.where(ok, w_n, w), lam=jnp.where(ok, lam_n, lam),
            s=jnp.where(ok, s_n, s),
            iters=jnp.where(halt, jnp.asarray(cfg.max_iter, jnp.int32),
                            state.iters + 1),
            mu=jnp.where(ok, mu_n, state.mu),
            res=jnp.where(ok, res, state.res),
            converged=jnp.where(ok, conv, state.converged),
        )

    r_d0, r_p0 = residuals(w, lam, s)
    init = _IPMState(
        w=w, lam=lam, s=s, iters=jnp.asarray(0, jnp.int32),
        mu=jnp.dot(lam, s) / n_act,
        res=jnp.maximum(jnp.max(jnp.abs(r_d0) / g_scale),
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
