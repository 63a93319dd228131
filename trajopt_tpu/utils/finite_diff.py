"""Forward-difference derivatives (num_diff.hpp/cpp analog).

The reference differentiates everything by forward differences with
eps=1e-5 (``calcForwardNumGrad/Jac/Hessian``,
``trajopt_sco/src/num_diff.cpp``; DEFAULT_EPSILON at
modeling_utils.cpp:13).  Our terms use exact autodiff, but FD remains part
of the toolkit: validating user-supplied analytic Jacobians (the role of
the ifopt stack's *_numerical_constraint variants) and differentiating
genuinely non-differentiable black boxes.

All functions are jit/vmap compatible (static input sizes).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

DEFAULT_EPSILON = 1e-5  # modeling_utils.cpp:13


def num_grad(f: Callable, x: jax.Array, eps: float = DEFAULT_EPSILON):
    """Forward-difference gradient of a scalar function."""
    f0 = f(x)
    eye = jnp.eye(x.shape[0], dtype=x.dtype)
    return jax.vmap(lambda d: (f(x + eps * d) - f0) / eps)(eye)

def num_jac(f: Callable, x: jax.Array, eps: float = DEFAULT_EPSILON):
    """Forward-difference Jacobian [m, n] (calcForwardNumJac)."""
    f0 = jnp.atleast_1d(f(x))
    eye = jnp.eye(x.shape[0], dtype=x.dtype)
    cols = jax.vmap(lambda d: (jnp.atleast_1d(f(x + eps * d)) - f0) / eps)(eye)
    return cols.T


def num_hessian_diag(f: Callable, x: jax.Array, eps: float = DEFAULT_EPSILON):
    """Central second differences for the Hessian diagonal
    (calcGradAndDiagHess)."""
    f0 = f(x)
    eye = jnp.eye(x.shape[0], dtype=x.dtype)

    def second(d):
        return (f(x + eps * d) - 2.0 * f0 + f(x - eps * d)) / (eps * eps)

    return jax.vmap(second)(eye)


def num_hessian(f: Callable, x: jax.Array, eps: float = 1e-4):
    """Full FD Hessian via gradient differencing (calcGradHess)."""
    g0 = num_grad(f, x, eps)
    eye = jnp.eye(x.shape[0], dtype=x.dtype)
    H = jax.vmap(lambda d: (num_grad(f, x + eps * d, eps) - g0) / eps)(eye)
    return 0.5 * (H + H.T)


def fd_jac_fn(term_fn: Callable, eps: float = DEFAULT_EPSILON):
    """Wrap a term residual fn into a TermSet-compatible FD jac_fn
    (the numerical-constraint validation variants of the ifopt stack)."""

    def jac(x, params):
        return num_jac(lambda v: term_fn(v, params), x, eps)

    return jac
