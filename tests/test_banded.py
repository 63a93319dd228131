"""Banded-matrix kernels: matvec/rmatvec/AtRA/scalings vs dense."""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.qp.banded import (
    BandedMatrix, at_r_a, col_inf_norms, make_banded, matvec, rmatvec,
    row_inf_norms, scale_cols, scale_rows, to_dense)

RNG = np.random.default_rng(0)


def random_banded(m=11, n=20, w=5):
    W = jnp.asarray(RNG.normal(size=(m, w)))
    starts = RNG.integers(0, n - w + 1, size=m)
    return make_banded(W, starts, n)


def test_matvec_matches_dense():
    B = random_banded()
    x = jnp.asarray(RNG.normal(size=B.n))
    np.testing.assert_allclose(matvec(B, x), to_dense(B) @ x, atol=1e-12)


def test_rmatvec_matches_dense():
    B = random_banded()
    y = jnp.asarray(RNG.normal(size=B.m))
    np.testing.assert_allclose(rmatvec(B, y), to_dense(B).T @ y, atol=1e-12)


def test_at_r_a_matches_dense():
    B = random_banded()
    rho = jnp.asarray(RNG.uniform(0.5, 2.0, B.m))
    D = np.asarray(to_dense(B))
    np.testing.assert_allclose(at_r_a(B, rho),
                               D.T @ (np.asarray(rho)[:, None] * D),
                               atol=1e-12)


def test_norms_and_scaling():
    B = random_banded()
    D = np.asarray(to_dense(B))
    np.testing.assert_allclose(row_inf_norms(B), np.abs(D).max(axis=1),
                               atol=1e-12)
    np.testing.assert_allclose(col_inf_norms(B), np.abs(D).max(axis=0),
                               atol=1e-12)
    e = jnp.asarray(RNG.uniform(0.5, 2.0, B.m))
    d = jnp.asarray(RNG.uniform(0.5, 2.0, B.n))
    np.testing.assert_allclose(to_dense(scale_rows(B, e)),
                               np.asarray(e)[:, None] * D, atol=1e-12)
    np.testing.assert_allclose(to_dense(scale_cols(B, d)),
                               D * np.asarray(d)[None, :], atol=1e-12)


def test_clamped_windows_at_edge():
    # rows whose window would exceed n get clamped indices with usable zeros
    W = jnp.asarray(RNG.normal(size=(2, 4)))
    B = make_banded(W.at[1, 2:].set(0.0), np.array([0, 18]), 20)
    x = jnp.asarray(RNG.normal(size=20))
    d = to_dense(B)
    np.testing.assert_allclose(matvec(B, x), d @ x, atol=1e-12)
