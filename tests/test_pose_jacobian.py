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


def test_jits_and_vmaps():
    scene = SCENES["arm7"]()
    nd = scene.tree.n_dof
    qs = jax.random.uniform(jax.random.PRNGKey(7), (5, nd))
    ds, J = jax.jit(jax.vmap(lambda q: scene.distances_and_jac(q)))(qs)
    assert ds.shape == (5, scene.n_pairs)
    assert J.shape == (5, scene.n_pairs, nd)
