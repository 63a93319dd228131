"""Warm-started Newton-Schulz refresh of the explicit KKT inverse.

The ADMM x-update applies ``Minv = (P + sigma I + A'RA)^-1`` as an explicit
inverse (one batched matvec per iteration — the TPU-friendly form; see
qp/admm.py:199).  Computing that inverse with a batched Cholesky + two
triangular solves costs ~7.5ms at the flagship shapes ([96, 210, 210] on
v5e-1) because batched factorizations are latency-bound on the single
TensorCore (ROADMAP round-1 finding).  But across SQP iterations M changes
only by the re-linearization of the active constraint rows, so the previous
step's inverse is an excellent seed for the quadratically-convergent
Newton-Schulz iteration

    X <- X (2I - M X)

which is nothing but batched [n, n] matmuls — exactly what the MXU is fast
at (~0.2ms per iteration at the same shapes; typically <= 8 iterations to
reach f32-level residual from a warm seed).

Safeguards (the seed may be arbitrarily stale):

* NS converges for SPD ``M``/SPD seed iff ``lam_max(X0 M) < 2``.  A few
  power iterations estimate ``lam_max`` and the seed is scaled by
  ``t = min(1, target / lam_max)``, which guarantees contraction
  (eigenvalues of ``t X0 M`` lie in ``(0, target]``).
* The loop is residual-guarded: it runs until ``||I - M X||_F <= tol`` or
  ``max_iter``, whichever first.  The residual matrix is a free by-product
  of the iteration (no extra matmul).
* A non-converged refresh yields an inexact ``Minv``; the SQP's
  exact-merit accept/reject machinery (optimizers.cpp:899-913 semantics)
  rejects any bad step it induces, so correctness degrades to extra
  iterations, never to wrong solutions.

No reference-file counterpart: the reference refactorizes inside OSQP on
every QP; this module exists because of the TPU's matmul-vs-factorization
cost asymmetry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def cholesky_inverse(M: jax.Array) -> jax.Array:
    """Explicit SPD inverse via Cholesky + two triangular solves."""
    n = M.shape[-1]
    L = jnp.linalg.cholesky(M)
    eye = jnp.eye(n, dtype=M.dtype)
    return solve_triangular(L.T, solve_triangular(L, eye, lower=True),
                            lower=False)


def _lam_max_estimate(M: jax.Array, X0: jax.Array, iters: int) -> jax.Array:
    """Power-iteration estimate of lam_max(X0 M) (positive real spectrum
    for SPD M, X0).  Matvec-only: two [n, n] @ [n] products per iteration."""
    n = M.shape[-1]
    # Deterministic full-spectrum start (no PRNG inside the solver): a
    # cosine ramp (frequency 0.7 rad/index, offset to avoid exact zeros)
    # is never orthogonal to the dominant eigenvector in practice; the
    # safety margin in ns_inverse covers the power-iteration slack.
    v = jnp.cos(jnp.arange(n, dtype=M.dtype) * 0.7) + 0.01
    v = v / jnp.linalg.norm(v)

    def body(_, carry):
        v, lam = carry
        w = X0 @ (M @ v)
        nw = jnp.linalg.norm(w)
        lam = nw  # ||X0 M v|| -> lam_max as v aligns
        return w / (nw + jnp.asarray(1e-30, M.dtype)), lam

    _, lam = jax.lax.fori_loop(
        0, iters, body, (v, jnp.asarray(1.0, M.dtype)))
    return lam


def ns_inverse(M: jax.Array, X0: jax.Array, *, tol: float = 1e-5,
               max_iter: int = 25, power_iters: int = 8,
               target: float = 1.8, coarse: bool = False,
               coarse_tol: float = 5e-2) -> jax.Array:
    """Refresh an SPD inverse from seed ``X0`` by safeguarded Newton-Schulz.

    Per-problem ([n, n]); batch by ``vmap``.  Returns an approximation of
    ``M^-1`` with ``||I - M X||_F <= tol`` when converged within
    ``max_iter`` (quadratic convergence: a warm seed takes ~5-8 steps).

    ``coarse=True`` runs the early iterations with default-precision
    matmuls (bf16 MXU passes, ~4x faster on TPU) until the residual drops
    below ``coarse_tol``, then polishes at HIGHEST precision.  NS is
    self-correcting — each full-precision step squares the residual, so
    the bf16 phase's ~1e-2 noise floor is erased by the polish; coarse_tol
    sits safely above that floor.
    """
    n = M.shape[-1]
    dtype = M.dtype
    eye = jnp.eye(n, dtype=dtype)

    lam = _lam_max_estimate(M, X0, power_iters)
    # Power iteration LOWER-bounds lam_max(X0 M); with few iterations and a
    # clustered spectrum the true value can exceed the estimate, so the
    # margin scales with how little the iteration has converged: 10% at
    # power_iters >= 8 (empirically converged at these spectra), doubling
    # the slack for very short budgets.  Scaling cannot hurt a good seed
    # much (t = 1 when lam_max is already inside the contraction region),
    # and the isfinite fallback below catches any residual divergence.
    margin = 1.1 if power_iters >= 8 else 1.2 + 0.8 / max(power_iters, 1)
    t = jnp.minimum(jnp.asarray(1.0, dtype),
                    jnp.asarray(target, dtype) / (margin * lam))
    X = t * X0

    def phase(X, phase_tol, budget, precision):
        def cond(carry):
            _, r, k = carry
            return (r > phase_tol) & (k < budget)

        def body(carry):
            X, _, k = carry
            E = eye - jnp.matmul(M, X, precision=precision)
            r = jnp.linalg.norm(E)  # free by-product: no extra matmul
            return X + jnp.matmul(X, E, precision=precision), r, k + 1

        X, _, k = jax.lax.while_loop(
            cond, body,
            (X, jnp.asarray(jnp.inf, dtype), jnp.asarray(0, jnp.int32)))
        return X, k

    if coarse:
        # The polish keeps its own full budget: if bf16 noise floors above
        # coarse_tol the coarse loop burns its budget without converging,
        # and the refresh must still reach tol in f32 (measured on v5e:
        # sharing one budget left 0 polish iterations and broke 39/96
        # solves).
        X, _ = phase(X, coarse_tol, max_iter, jax.lax.Precision.DEFAULT)
    X, _ = phase(X, tol, max_iter, jax.lax.Precision.HIGHEST)

    # Divergence rescue: a stale seed or an underestimated lam_max can
    # leave X non-finite or far from M^-1; carrying that back into solver
    # state would poison every later SQP step of the lane (it would only
    # fail safe through merit rejection -> FAILED).  Bad lanes restart NS
    # from the GUARANTEED-convergent seed (target/||M||_F) I — for SPD M,
    # eigenvalues of that seed times M lie in (0, target] — which is pure
    # matmuls and therefore cheap under vmap (a lax.cond Cholesky fallback
    # would execute on every lane under batching and erase the NS win).
    # When every lane is healthy the rescue while_loop exits immediately:
    # the check costs one extra matmul.
    E = eye - jnp.matmul(M, X, precision=jax.lax.Precision.HIGHEST)
    r = jnp.linalg.norm(E)
    bad = ~jnp.isfinite(r) | (r > jnp.asarray(1.0, dtype))
    lam_ub = jnp.linalg.norm(M)  # Frobenius >= lam_max for SPD M
    X_safe = (jnp.asarray(target, dtype) / (lam_ub + 1e-30)) * eye
    X = jnp.where(bad, X_safe, X)

    def rescue_cond(carry):
        _, rr, k = carry
        return (rr > jnp.asarray(tol, dtype)) & (k < 4 * max_iter)

    def rescue_body(carry):
        Xc, _, k = carry
        Ec = eye - jnp.matmul(M, Xc, precision=jax.lax.Precision.HIGHEST)
        rr = jnp.linalg.norm(Ec)
        return (Xc + jnp.matmul(Xc, Ec, precision=jax.lax.Precision.HIGHEST),
                rr, k + 1)

    r0 = jnp.where(bad, jnp.asarray(jnp.inf, dtype), jnp.asarray(0.0, dtype))
    X, _, _ = jax.lax.while_loop(rescue_cond, rescue_body,
                                 (X, r0, jnp.asarray(0, jnp.int32)))
    return X
