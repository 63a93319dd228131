"""Scalar-form (SoA) unrolled FK must match the matrix-form references.

The SoA FK (kinematics/chain.py _fk_soa) is the default fk_mode; it claims
IDENTICAL math to the scan/unrolled forms (same op order, structural zeros
folded).  These tests pin that equivalence on a revolute tree (pr2ish, 8
DOF + fixed joints) and a prismatic robot (boxbot), in f64, including the
joint axes/origins used by the geometric-Jacobian composition.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.models.benchmarks import pr2ish_table_problem
from trajopt_tpu.models.robots import arm7, boxbot


def _trees():
    _, scene = pr2ish_table_problem(n_steps=3)
    yield "pr2ish", scene.tree
    yield "boxbot", boxbot()
    yield "arm7", arm7()


@pytest.mark.parametrize("name,tree", list(_trees()),
                         ids=[n for n, _ in _trees()])
def test_fk_soa_matches_reference_forms(name, tree):
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.uniform(-1.5, 1.5, (6, tree.n_dof)))

    R2, p2, z2, o2 = jax.vmap(lambda qq: tree._fk_soa(qq, True))(q)

    # matrix-form unrolled is the semantic reference
    Ru, pu = jax.vmap(tree._fk_unrolled)(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(Ru), atol=1e-14)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(pu), atol=1e-14)

    if len(tree.joints) >= 10:
        Rs, ps = jax.vmap(tree._fk_scan)(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(Rs), atol=1e-14)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(ps), atol=1e-14)

    # axes/origins vs the cache-based fk_with_axes path
    object.__setattr__(tree, "fk_mode", "unrolled")
    try:
        Ro, po, zo, oo = jax.vmap(tree.fk_with_axes)(q)
    finally:
        object.__setattr__(tree, "fk_mode", "soa")
    np.testing.assert_allclose(np.asarray(z2), np.asarray(zo), atol=1e-14)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(oo), atol=1e-14)


def test_fk_soa_grads_match(subtests=None):
    """d(FK)/dq agrees between SoA and matrix forms (autodiff through the
    scalar form must stay exact — the collision Jacobians ride on it)."""
    _, scene = pr2ish_table_problem(n_steps=3)
    tree = scene.tree
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-1.0, 1.0, (tree.n_dof,)))

    def f_soa(qq):
        R, p, _, _ = tree._fk_soa(qq, False)
        return jnp.sum(R * 0.3) + jnp.sum(p * 0.7)

    def f_ref(qq):
        R, p = tree._fk_unrolled(qq)
        return jnp.sum(R * 0.3) + jnp.sum(p * 0.7)

    g1 = jax.grad(f_soa)(q)
    g2 = jax.grad(f_ref)(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-12)
