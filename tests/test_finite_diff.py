"""FD utility tests (num_diff-unit analog): FD vs autodiff on smooth
functions, and an FD-jacobian term solving the same problem as autodiff."""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.problem.trajectory import TrajOptProblem, stationary_init
from trajopt_tpu.sqp.nlp import Kind, Nlp, TermSet
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.sqp.solver import make_solver
from trajopt_tpu.utils.finite_diff import (
    fd_jac_fn, num_grad, num_hessian, num_hessian_diag, num_jac)


def f_scalar(x):
    return jnp.sin(x[0]) * x[1] + x[2] ** 3


def f_vec(x):
    return jnp.array([x[0] * x[1], jnp.cos(x[2]), x[0] + 2.0 * x[2]])


X = jnp.array([0.3, -0.7, 0.5])


def test_num_grad_matches_autodiff():
    np.testing.assert_allclose(num_grad(f_scalar, X), jax.grad(f_scalar)(X),
                               atol=1e-4)


def test_num_jac_matches_autodiff():
    np.testing.assert_allclose(num_jac(f_vec, X), jax.jacfwd(f_vec)(X),
                               atol=1e-4)


def test_num_hessian_matches_autodiff():
    np.testing.assert_allclose(num_hessian(f_scalar, X),
                               jax.hessian(f_scalar)(X), atol=1e-2)
    np.testing.assert_allclose(num_hessian_diag(f_scalar, X),
                               jnp.diagonal(jax.hessian(f_scalar)(X)),
                               atol=1e-4)


def test_fd_jacobian_term_solves():
    """A term with an FD jac_fn reaches the same solution as autodiff."""

    def err(x, p):
        return jnp.array([jnp.sin(x[0]) + x[1] - 0.7])

    nlp_fd = Nlp(n=2, term_sets=(
        TermSet("pull", Kind.COST_SQ, lambda x, p: x - jnp.array([1.0, 1.0]),
                n_rows=2),
        TermSet("g", Kind.CNT_EQ, err, 1, jac_fn=fd_jac_fn(err)),
    ))
    res = make_solver(nlp_fd)(jnp.zeros(2), jnp.full(2, -jnp.inf),
                              jnp.full(2, jnp.inf), {})
    assert int(res.status) == SQPStatus.CONVERGED
    x = np.asarray(res.x)
    np.testing.assert_allclose(np.sin(x[0]) + x[1], 0.7, atol=1e-4)


def test_joint_subset_mapping():
    """getSubset / updateFromSubset / subset-jacobian expansion
    (trajopt/utils.hpp:14-69 analog)."""
    from trajopt_tpu.utils.joints import (
        expand_jacobian_rows, get_subset, update_from_subset)
    sup = ["a", "b", "c", "d"]
    sub = ["d", "b"]
    v = jnp.array([1.0, 2.0, 3.0, 4.0])
    np.testing.assert_allclose(get_subset(sup, v, sub), [4.0, 2.0])
    out = update_from_subset(sup, v, sub, jnp.array([40.0, 20.0]))
    np.testing.assert_allclose(out, [1.0, 20.0, 3.0, 40.0])
    J = jnp.array([[1.0, 2.0]])
    Je = expand_jacobian_rows(sup, sub, J)
    np.testing.assert_allclose(Je, [[0.0, 2.0, 0.0, 1.0]])
