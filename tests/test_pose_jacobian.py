"""Pose-space collision Jacobian (CollisionScene.distances_and_jac):
the analytic composition of narrowphase pose-cotangents with the
geometric-Jacobian velocity relations must match full autodiff exactly
(it is the reference's grad = +/- n' J_link with ref-point shift,
collision_terms.cpp:203-323, generalized by pose-space vjp)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_collision import boxbot_scene, spherebot_scene
from trajopt_tpu.models.benchmarks import arm_table_problem
from trajopt_tpu.models.robots import arm6_scene

SCENES = {
    "arm7": lambda: arm_table_problem(n_steps=3)[1],   # revolute chain
    "arm6": arm6_scene,                                # revolute + shelf
    "boxbot": boxbot_scene,                            # prismatic, boxes
    "spherebot": spherebot_scene,                      # prismatic, spheres
}


@pytest.mark.parametrize("name", sorted(SCENES))
def test_matches_autodiff(name):
    scene = SCENES[name]()
    nd = scene.tree.n_dof
    for seed in range(3):
        q = jax.random.uniform(jax.random.PRNGKey(seed), (nd,),
                               minval=-1.0, maxval=1.0)
        ds, J = scene.distances_and_jac(q)
        np.testing.assert_allclose(np.asarray(ds),
                                   np.asarray(scene.distances(q)), rtol=0)
        np.testing.assert_allclose(np.asarray(J),
                                   np.asarray(jax.jacrev(scene.distances)(q)),
                                   atol=1e-12)


@pytest.mark.parametrize("name", ["arm7", "boxbot"])
def test_swept_matches_autodiff(name):
    scene = SCENES[name]()
    nd = scene.tree.n_dof
    q0 = jax.random.uniform(jax.random.PRNGKey(1), (nd,), minval=-0.8,
                            maxval=0.8)
    q1 = q0 + 0.3
    ds, J0, J1 = scene.swept_distances_and_jac(q0, q1)
    np.testing.assert_allclose(
        np.asarray(ds), np.asarray(scene.swept_distances(q0, q1)), rtol=0)
    J0_ref = jax.jacrev(scene.swept_distances, argnums=0)(q0, q1)
    J1_ref = jax.jacrev(scene.swept_distances, argnums=1)(q0, q1)
    np.testing.assert_allclose(np.asarray(J0), np.asarray(J0_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J1_ref), atol=1e-12)


@pytest.mark.parametrize("evaluator", ["lvs_discrete", "cast"])
def test_gap_term_banded_jac_matches_autodiff(evaluator):
    from trajopt_tpu.terms.collision import collision_term
    scene = SCENES["boxbot"]()
    n = 3
    term = collision_term(scene, n, margin=0.05, coeff=7.0, is_cost=False,
                          evaluator=evaluator, lvs_substeps=3)
    x = jnp.linspace(-0.5, 0.5, n * scene.tree.n_dof)
    r, W = term.val_banded_jac(x, {})
    np.testing.assert_allclose(np.asarray(r), np.asarray(term.fn(x, {})),
                               rtol=0, atol=1e-14)
    J_dense = term.val_jac_fn(x, {})[1]
    J_ref = jax.jacrev(lambda v: term.fn(v, {}))(x)
    np.testing.assert_allclose(np.asarray(J_dense), np.asarray(J_ref),
                               atol=1e-10)


@pytest.mark.parametrize("evaluator", ["discrete", "cast"])
def test_topk_jacobians_match_autodiff(evaluator):
    """max_num_cnt top-k now keeps analytic banded/dense Jacobians (the
    selection is within a step/gap window); they must match autodiff
    through the top_k gather of the raw fn."""
    from trajopt_tpu.terms.collision import collision_term
    scene = SCENES["arm7"]()
    n = 3
    term = collision_term(scene, n, margin=0.05, coeff=9.0, is_cost=False,
                          evaluator=evaluator, lvs_substeps=2, max_num_cnt=3)
    assert term.banded_jac is not None and term.val_banded_jac is not None
    x = jnp.linspace(-0.4, 0.6, n * scene.tree.n_dof)
    r, W = term.val_banded_jac(x, {})
    np.testing.assert_allclose(np.asarray(r), np.asarray(term.fn(x, {})),
                               rtol=0, atol=1e-14)
    J_dense = term.val_jac_fn(x, {})[1]
    J_ref = jax.jacrev(lambda v: term.fn(v, {}))(x)
    np.testing.assert_allclose(np.asarray(J_dense), np.asarray(J_ref),
                               atol=1e-10)
    assert r.shape[0] == term.n_rows == J_dense.shape[0]


def test_topk_structured_solve_converges():
    from trajopt_tpu.problem.trajectory import TrajOptProblem, stationary_init
    from trajopt_tpu.sqp.params import SQPStatus
    from trajopt_tpu.terms.collision import collision_term
    from trajopt_tpu.terms.joint import joint_pos, joint_vel
    scene = SCENES["spherebot"]()
    n = 4
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets="goal",
                            first_step=n - 1, last_step=n - 1))
    prob.add_term(collision_term(scene, n, margin=0.1, coeff=20.0,
                                 is_cost=False, fixed_steps=[0],
                                 max_num_cnt=2))
    res = prob.make_solve(structured=True)(
        stationary_init(jnp.array([-2.0, 0.0]), n),
        {"goal": jnp.array([2.0, 0.3])})
    assert int(res.status) == SQPStatus.CONVERGED


def test_jits_and_vmaps():
    scene = SCENES["arm7"]()
    nd = scene.tree.n_dof
    qs = jax.random.uniform(jax.random.PRNGKey(7), (5, nd))
    ds, J = jax.jit(jax.vmap(lambda q: scene.distances_and_jac(q)))(qs)
    assert ds.shape == (5, scene.n_pairs)
    assert J.shape == (5, scene.n_pairs, nd)
