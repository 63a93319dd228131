"""Batched proximal-ADMM convex QP solver (OSQP-style splitting).

Solves problems of the form::

    minimize    0.5 x'Px + q'x + sum_i phi_i(z_i)
    subject to  z = A x

where each row penalty is ``phi_i(z) = c_i * dist(z, [l_i, u_i])``:

* ``c_i = +inf``  -> hard constraint row (indicator of the interval); the
  prox is a plain projection, which recovers the classic OSQP row.
* finite ``c_i``  -> exact L1 / hinge penalty row; the prox is a
  soft-threshold clamped toward the interval.

This fills the role of ``sco::Model::optimize()`` and its OSQP backend in
the reference (``trajopt_sco/src/osqp_interface.cpp:440``), but replaces the
slack-variable reformulation of hinge/abs penalties
(``trajopt_sco/src/modeling.cpp:18-40`` and the slack blocks of
``trajopt_optimizers/trajopt_sqp/src/trajopt_qp_problem.cpp:29-35``) with
proximal operators.  That keeps the KKT system small and static-shaped and
turns every penalty into an elementwise VPU op — the right trade for
TPU/XLA.  Everything is pure-functional and jit/vmap friendly: batching over
problems is a single ``jax.vmap`` of :func:`solve_qp`.

The ADMM iteration (with relaxation ``alpha`` and per-row step ``rho_i``)::

    xt     = (P + sigma I + A' R A)^-1 (sigma x - q + A'(R z - y))
    zt     = A xt
    x+     = alpha xt + (1 - alpha) x
    v      = alpha zt + (1 - alpha) z + y / rho
    z+     = prox_{phi/rho}(v)
    y+     = y + R (alpha zt + (1 - alpha) z - z+)

Termination mirrors OSQP: ``||Ax - z||_inf <= eps_abs + eps_rel * scale``
and the analogous dual criterion, checked every ``check_every`` iterations,
with optional adaptive rescaling of ``rho`` (and refactorization).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


class QPData(NamedTuple):
    """One convex QP in prox form.  All arrays share a float dtype.

    Attributes:
      P: [n, n] PSD quadratic cost matrix (0.5 x'Px + q'x).
      q: [n] linear cost.
      A: [m, n] constraint matrix (z = Ax).
      l: [m] lower interval bounds on z.
      u: [m] upper interval bounds on z.
      c: [m] per-row penalty weight; +inf marks a hard row.
    """

    P: jax.Array
    q: jax.Array
    A: jax.Array
    l: jax.Array
    u: jax.Array
    c: jax.Array


@dataclasses.dataclass(frozen=True)
class ADMMConfig:
    """Solver configuration (static under jit).

    Defaults track OSQP's (sigma, alpha, rho, adaptivity) which is the
    reference's default backend (``OSQPModelConfig``,
    ``trajopt_sco/include/trajopt_sco/osqp_interface.hpp:14-33``).
    """

    sigma: float = 1e-6
    alpha: float = 1.6
    rho: float = 0.1
    rho_eq_scale: float = 1e3  # boost for hard equality rows, as in OSQP
    max_iter: int = 500
    check_every: int = 25
    eps_abs: float = 1e-6
    eps_rel: float = 1e-6
    adaptive_rho: bool = True
    adaptive_rho_threshold: float = 5.0  # adapt when pri/dual imbalance exceeds
    rho_min: float = 1e-6
    rho_max: float = 1e6
    # Dual-magnitude-aware GLOBAL rho scaling: when > 0, every row's rho
    # is multiplied by clip(rho_dual_scale * max_i(finite c_i), 1, .) in
    # Ruiz-scaled units.  Rationale: at a trust-region QP optimum whose
    # penalty rows cannot be satisfied inside the box, the optimal duals
    # reach ~c on the violated rows AND on the box rows opposing them;
    # ADMM grows duals at ~rho*residual per iteration, so with fixed
    # rho=0.1 an escalated-penalty QP (c ~ 1e4-1e6) is dual-starved at
    # any practical iteration cap and every later SQP penalty round is
    # wasted (round-5 hard-mix root cause, benchmarks/hard_mix_diag.py:
    # 33/64 -> 63/64 borderline lanes at 4000 iters).  Boosting only the
    # soft rows fails (the opposing box-row duals starve instead —
    # tests/test_qp_admm.py); the toy sweep shows global rho in
    # [1e-3 c, c] converges in 150-2650 iterations vs millions at 0.1.
    # 0.1 reproduces OSQP's adaptive-rho fixed point on that regime
    # without per-chunk refactorization (the block path factors once per
    # SQP step).  The boost only fires once max c exceeds
    # rho_dual_thresh (scaled units): c upper-bounds the duals but easy
    # QPs have interior duals ~O(1), where boosting rho slows the primal
    # (measured: unconditional gs=3.3 on the unescalated flagship cost
    # 3x headline throughput).  Typical unescalated scaled max c is
    # ~30-50; the first x10 escalation crosses the threshold.
    rho_dual_scale: float = 0.0
    rho_dual_thresh: float = 100.0
    ruiz_iters: int = 10  # OSQP default `scaling` passes
    # Fuse each check_every-iteration chunk into one Pallas VMEM kernel:
    # dense path -> trajopt_tpu/qp/pallas_admm.py (one problem/program);
    # block-banded path -> trajopt_tpu/qp/pallas_block.py (sub-batch
    # blocked grid; pallas_sub_batch problems per program, sized to VMEM).
    use_pallas: bool = False
    pallas_sub_batch: int = 32
    # Newton-Schulz refresh of the explicit KKT inverse across SQP steps
    # (block-banded path only): seed the inverse with the previous step's
    # Minv and refresh with batched matmuls instead of re-running the
    # latency-bound batched Cholesky (7.5ms -> ~1.5ms at flagship shapes).
    # See qp/inverse.py for the safeguards.
    ns_refresh: bool = False
    ns_tol: float = 1e-5
    ns_max_iter: int = 25
    ns_power_iters: int = 8  # lam_max estimate for the seed safeguard
    # run early NS iterations with bf16 MXU matmuls (~4x faster), then
    # polish at full precision — NS self-corrects, see qp/inverse.py
    ns_coarse: bool = False
    # Anderson acceleration memory applied at chunk boundaries on the
    # (z, y/rho) fixed-point state (0 = off).  Safeguarded: if the primal
    # residual grows after an accelerated step, the step is reverted and
    # the history cleared.  Targets the measured bottleneck: sequential
    # ADMM iteration count (SCS-style type-II AA).
    anderson: int = 0


class Scaling(NamedTuple):
    """Ruiz equilibration scalings: x = D @ x_scaled, z rows scaled by E,
    objective scaled by c_obj (OSQP's default preprocessing, `scaling: 10`)."""

    D: jax.Array      # [n]
    E: jax.Array      # [m]
    c_obj: jax.Array  # scalar


def ruiz_equilibrate(qp: QPData, iters: int = 10) -> tuple[QPData, Scaling]:
    """Scale the QP so rows/cols of [P A'; A 0] have ~unit inf-norms.

    Mirrors OSQP's modified Ruiz equilibration; without it ADMM converges
    arbitrarily slowly on badly-row-scaled problems (e.g. constraint
    Jacobian rows with norm ~1e2 vs unit box rows).
    Penalty rows transform as c_scaled = c_obj * c / E (hard rows stay inf).
    """
    dtype = qp.P.dtype
    n = qp.P.shape[0]
    m = qp.A.shape[0]
    eps = jnp.asarray(1e-12, dtype)

    def safe_inv_sqrt(v):
        return jnp.where(v < eps, 1.0, 1.0 / jnp.sqrt(v))

    def body(_, carry):
        P, q, A, D, E, c_obj = carry
        col_norm = jnp.maximum(
            jnp.max(jnp.abs(P), axis=0), jnp.max(jnp.abs(A), axis=0)
        )
        d = safe_inv_sqrt(col_norm)
        P = d[:, None] * P * d[None, :]
        q = d * q
        A = A * d[None, :]
        row_norm = jnp.max(jnp.abs(A), axis=1)
        e = safe_inv_sqrt(row_norm)
        A = e[:, None] * A
        # Cost scaling (OSQP): normalize by max(mean col norm of P, ||q||inf)
        g_den = jnp.maximum(jnp.mean(jnp.max(jnp.abs(P), axis=0)),
                            jnp.max(jnp.abs(q)))
        g = jnp.where(g_den < eps, 1.0, 1.0 / g_den)
        return (g * P, g * q, A, D * d, E * e, c_obj * g)

    init = (qp.P, qp.q, qp.A, jnp.ones(n, dtype), jnp.ones(m, dtype),
            jnp.ones((), dtype))
    P, q, A, D, E, c_obj = jax.lax.fori_loop(0, iters, body, init)
    l = qp.l * E
    u = qp.u * E
    c = jnp.where(jnp.isinf(qp.c), jnp.inf, c_obj * qp.c / E)
    return QPData(P, q, A, l, u, c), Scaling(D=D, E=E, c_obj=c_obj)


class ADMMState(NamedTuple):
    x: jax.Array
    z: jax.Array
    y: jax.Array
    rho_scale: jax.Array  # scalar multiplier on the base rho vector
    iters: jax.Array
    pri_res: jax.Array
    dua_res: jax.Array
    converged: jax.Array
    # Anderson acceleration history (unused when cfg.anderson == 0)
    aa_V: jax.Array       # [K, 2m] fixed-point outputs v_end
    aa_F: jax.Array       # [K, 2m] residuals v_end - v_start
    aa_cnt: jax.Array


class ADMMResult(NamedTuple):
    x: jax.Array
    z: jax.Array
    y: jax.Array
    iters: jax.Array
    pri_res: jax.Array
    dua_res: jax.Array
    converged: jax.Array


def _prox_dist(v: jax.Array, l: jax.Array, u: jax.Array, c_over_rho: jax.Array) -> jax.Array:
    """Prox of c * dist(., [l, u]) with step 1/rho, elementwise.

    For c = +inf this reduces to clip(v, l, u).
    """
    above = v > u
    below = v < l
    z_above = jnp.maximum(u, v - c_over_rho)
    z_below = jnp.minimum(l, v + c_over_rho)
    return jnp.where(above, z_above, jnp.where(below, z_below, v))


def _dual_rho_scale(c: jax.Array, cfg: ADMMConfig) -> jax.Array:
    """Global dual-magnitude factor gamma >= 1 from the largest finite
    (Ruiz-scaled) penalty weight — see ADMMConfig.rho_dual_scale."""
    if cfg.rho_dual_scale <= 0.0:
        return jnp.ones((), c.dtype)
    max_c = jnp.max(jnp.where(jnp.isinf(c), 0.0, c))
    gs = jnp.maximum(1.0, cfg.rho_dual_scale * max_c)
    return jnp.where(max_c >= cfg.rho_dual_thresh, gs, 1.0)


def apply_dual_cost_scale(P, q, c, c_obj, cfg: ADMMConfig):
    """Fold the dual-magnitude heuristic into the COST normalization:
    scaling the objective (P, q, penalty weights c) down by gamma is
    EXACTLY equivalent to boosting every rho by gamma (ADMM iterates map
    1:1 with duals scaled by 1/gamma; sigma differs by the negligible
    1e-6 regularizer) — but keeps the rho vectors compile-time constants,
    which the TPU iteration body needs to stay fused (a traced rho_b
    measured 4x the body cost at identical trip counts).  OSQP's cost
    scaling normalizes by the P/q magnitudes only; penalty rows are part
    of the objective too, so max_c belongs in the denominator once it
    dominates.  Returns (P, q, c, c_obj) scaled."""
    gamma = _dual_rho_scale(c, cfg)
    c = jnp.where(jnp.isinf(c), jnp.inf, c / gamma)
    return P / gamma, q / gamma, c, c_obj / gamma


def _row_rho(qp: QPData, cfg: ADMMConfig, rho_scale: jax.Array) -> jax.Array:
    """Per-row rho: base rho, boosted on hard equality rows (OSQP heuristic)."""
    hard = jnp.isinf(qp.c)
    eq = (qp.u - qp.l) < 1e-10
    base = jnp.where(hard & eq, cfg.rho * cfg.rho_eq_scale, cfg.rho)
    return jnp.clip(base * rho_scale, cfg.rho_min, cfg.rho_max)


def _factor(qp: QPData, cfg: ADMMConfig, rho_vec: jax.Array) -> jax.Array:
    """Explicit inverse of the x-update system M = P + sigma I + A' R A.

    On TPU a dense inverse-apply is a single MXU matmul per iteration;
    batched triangular solves are ~5x slower (latency-bound).  M is
    Ruiz-equilibrated and sigma-regularized, so the explicit inverse is
    numerically safe at f32.
    """
    n = qp.P.shape[-1]
    M = qp.P + cfg.sigma * jnp.eye(n, dtype=qp.P.dtype) + qp.A.T @ (rho_vec[:, None] * qp.A)
    L = jnp.linalg.cholesky(M)
    eye = jnp.eye(n, dtype=qp.P.dtype)
    w = solve_triangular(L, eye, lower=True)
    return solve_triangular(L.T, w, lower=False)


def _cho_solve(Minv: jax.Array, b: jax.Array) -> jax.Array:
    return Minv @ b


def _inf_norm(v: jax.Array) -> jax.Array:
    return jnp.max(jnp.abs(v))


def solve_qp(
    qp: QPData,
    x0: jax.Array,
    z0: jax.Array | None = None,
    y0: jax.Array | None = None,
    cfg: ADMMConfig = ADMMConfig(),
) -> ADMMResult:
    """Solve one QP; warm-startable via (x0, z0, y0).  vmap over a batch.

    Internally runs on a Ruiz-equilibrated problem (like OSQP); termination
    residuals are computed in unscaled units.
    """
    dtype = qp.P.dtype
    orig = qp
    qp, sc = ruiz_equilibrate(qp, cfg.ruiz_iters)
    P2, q2, c2, c_obj2 = apply_dual_cost_scale(qp.P, qp.q, qp.c, sc.c_obj,
                                               cfg)
    qp = qp._replace(P=P2, q=q2, c=c2)
    sc = sc._replace(c_obj=c_obj2)

    x0 = x0.astype(dtype) / sc.D
    z = qp.A @ x0 if z0 is None else z0.astype(dtype) * sc.E
    y = (jnp.zeros(qp.A.shape[0], dtype) if y0 is None
         else y0.astype(dtype) * (sc.c_obj / sc.E))

    q_norm = _inf_norm(orig.q)

    def admm_iter(carry, rho_vec, L):
        x, z, y, Ax = carry
        rhs = cfg.sigma * x - qp.q + qp.A.T @ (rho_vec * z - y)
        xt = _cho_solve(L, rhs)
        zt = qp.A @ xt
        x_new = cfg.alpha * xt + (1.0 - cfg.alpha) * x
        Ax_new = cfg.alpha * zt + (1.0 - cfg.alpha) * Ax
        # Relaxation mixes zt with the previous *projected* z (OSQP alg. 1),
        # not with A @ x_old.
        zr = cfg.alpha * zt + (1.0 - cfg.alpha) * z
        v = zr + y / rho_vec
        z_new = _prox_dist(v, qp.l, qp.u, qp.c / rho_vec)
        y_new = y + rho_vec * (zr - z_new)
        return (x_new, z_new, y_new, Ax_new)

    if not cfg.adaptive_rho:
        # rho never changes: factor once, outside the iteration loop.
        _rho_const = _row_rho(qp, cfg, jnp.asarray(1.0, dtype))
        _Minv_const = _factor(qp, cfg, _rho_const)

    def chunk(state: ADMMState) -> ADMMState:
        if cfg.adaptive_rho:
            rho_vec = _row_rho(qp, cfg, state.rho_scale)
            L = _factor(qp, cfg, rho_vec)
        else:
            rho_vec, L = _rho_const, _Minv_const
        v_start = jnp.concatenate([state.z, state.y / rho_vec])
        if cfg.use_pallas:
            from trajopt_tpu.qp.pallas_admm import admm_chunk_pallas
            x, z, y = admm_chunk_pallas(
                L, qp.A, qp.q, qp.l, qp.u, qp.c, rho_vec,
                state.x, state.z, state.y,
                sigma=cfg.sigma, alpha=cfg.alpha, n_iters=cfg.check_every)
            Ax = qp.A @ x
        else:
            carry = (state.x, state.z, state.y, qp.A @ state.x)
            carry = jax.lax.fori_loop(
                0, cfg.check_every, lambda _, c: admm_iter(c, rho_vec, L), carry
            )
            x, z, y, Ax = carry

        # Unscaled residuals (OSQP computes termination in original units).
        Px = qp.P @ x
        Aty = qp.A.T @ y
        Ax_un = Ax / sc.E
        z_un = z / sc.E
        pri = _inf_norm(Ax_un - z_un)
        stat_un = (Px + qp.q + Aty) / (sc.c_obj * sc.D)
        dua = _inf_norm(stat_un)
        eps_pri = cfg.eps_abs + cfg.eps_rel * jnp.maximum(
            _inf_norm(Ax_un), _inf_norm(z_un))
        eps_dua = cfg.eps_abs + cfg.eps_rel * jnp.maximum(
            jnp.maximum(_inf_norm(Px / (sc.c_obj * sc.D)),
                        _inf_norm(Aty / (sc.c_obj * sc.D))), q_norm
        )
        converged = (pri <= eps_pri) & (dua <= eps_dua)

        rho_scale = state.rho_scale
        if cfg.adaptive_rho:
            tiny = jnp.asarray(1e-30, dtype)
            ratio = jnp.sqrt((pri / jnp.maximum(eps_pri, tiny)) /
                             jnp.maximum(dua / jnp.maximum(eps_dua, tiny), tiny))
            ratio = jnp.clip(jnp.nan_to_num(ratio, nan=1.0), 1e-2, 1e2)
            adapt = (ratio > cfg.adaptive_rho_threshold) | (
                ratio < 1.0 / cfg.adaptive_rho_threshold
            )
            rho_scale = jnp.where(adapt & ~converged, rho_scale * ratio, rho_scale)

        aa_V, aa_F, aa_cnt = state.aa_V, state.aa_F, state.aa_cnt
        if cfg.anderson > 0:
            # Type-II Anderson (DIIS mixing) on v = (z, y/rho) at chunk
            # granularity, safeguarded by primal-residual progress.
            K = cfg.anderson
            m_rows = qp.A.shape[0]
            v_end = jnp.concatenate([z, y / rho_vec])
            f = v_end - v_start
            # reset history if the last accelerated step made things worse
            diverged = pri > state.pri_res
            aa_cnt = jnp.where(diverged, 0, aa_cnt)
            aa_V = jnp.roll(aa_V, 1, axis=0).at[0].set(v_end)
            aa_F = jnp.roll(aa_F, 1, axis=0).at[0].set(f)
            aa_cnt = aa_cnt + 1
            valid = (jnp.arange(K) < jnp.minimum(aa_cnt, K))
            # alpha = G^-1 1 / (1' G^-1 1), G = F F' (+ Tikhonov), masked
            G = aa_F @ aa_F.T
            G = jnp.where(valid[:, None] & valid[None, :], G,
                          jnp.eye(K, dtype=dtype))
            G = G + 1e-10 * jnp.trace(G) * jnp.eye(K, dtype=dtype)
            ones = valid.astype(dtype)
            sol = jnp.linalg.solve(G, ones)
            alpha = sol / jnp.maximum(jnp.sum(sol * ones), 1e-12)
            alpha = alpha * ones
            v_aa = alpha @ aa_V
            use_aa = (aa_cnt >= 2) & (~diverged) & (~converged) & \
                jnp.all(jnp.isfinite(v_aa))
            z = jnp.where(use_aa, v_aa[:m_rows], z)
            y = jnp.where(use_aa, v_aa[m_rows:] * rho_vec, y)

        return ADMMState(
            x=x, z=z, y=y, rho_scale=rho_scale,
            iters=state.iters + cfg.check_every,
            pri_res=pri, dua_res=dua, converged=converged,
            aa_V=aa_V, aa_F=aa_F, aa_cnt=aa_cnt,
        )

    K_aa = max(cfg.anderson, 1)
    m_rows_total = qp.A.shape[0]
    init = ADMMState(
        x=x0, z=z, y=y,
        rho_scale=jnp.asarray(1.0, dtype),
        iters=jnp.asarray(0, jnp.int32),
        pri_res=jnp.asarray(jnp.inf, dtype),
        dua_res=jnp.asarray(jnp.inf, dtype),
        converged=jnp.asarray(False),
        aa_V=jnp.zeros((K_aa, 2 * m_rows_total), dtype),
        aa_F=jnp.zeros((K_aa, 2 * m_rows_total), dtype),
        aa_cnt=jnp.asarray(0, jnp.int32),
    )

    state = jax.lax.while_loop(
        lambda s: (~s.converged) & (s.iters < cfg.max_iter), chunk, init
    )
    return ADMMResult(
        x=state.x * sc.D,
        z=state.z / sc.E,
        y=state.y * (sc.E / sc.c_obj),
        iters=state.iters,
        pri_res=state.pri_res, dua_res=state.dua_res, converged=state.converged,
    )


def qp_objective(qp: QPData, x: jax.Array) -> jax.Array:
    """Full prox-form objective 0.5 x'Px + q'x + sum_i c_i dist(A_i x, [l, u])."""
    z = qp.A @ x
    viol = jnp.maximum(z - qp.u, 0.0) + jnp.maximum(qp.l - z, 0.0)
    soft = jnp.where(jnp.isinf(qp.c), jnp.zeros_like(viol), qp.c * viol)
    return 0.5 * x @ (qp.P @ x) + qp.q @ x + jnp.sum(soft)
