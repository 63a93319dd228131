"""Fused block-banded ADMM chunks (qp/pallas_block.py): the pallas path
must match the XLA fori_loop path bit-for-bit-ish (same update order, same
float ops) on CPU interpret mode, both unbatched and vmapped (the
custom_vmap rule launches the sub-batch-blocked kernel)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_collision import spherebot_scene
from trajopt_tpu.problem.trajectory import TrajOptProblem, stationary_init
from trajopt_tpu.qp.admm import ADMMConfig
from trajopt_tpu.sqp.params import SQPParams, SQPStatus
from trajopt_tpu.terms.collision import collision_term
from trajopt_tpu.terms.joint import joint_acc, joint_pos, joint_vel


def _problem(n=4):
    sc = spherebot_scene()
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_acc(n, 2, is_cost=True, coeffs=np.full(2, 0.5)))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets="goal",
                            first_step=n - 1, last_step=n - 1))
    prob.add_term(collision_term(sc, n, margin=0.1, coeff=20.0, is_cost=False,
                                 fixed_steps=[0]))
    return prob


def _solves(prob, qp_cfg):
    sqp = dataclasses.replace(SQPParams(), qp=qp_cfg)
    return prob.make_solve(sqp, structured=True)


def test_pallas_chunk_matches_fori_loop_single():
    prob = _problem()
    init = stationary_init(jnp.array([-2.0, 0.0]), 4)
    params = {"goal": jnp.array([2.0, 0.3])}
    base = _solves(prob, ADMMConfig())(init, params)
    fused = _solves(prob, ADMMConfig(use_pallas=True))(init, params)
    assert int(base.status) == SQPStatus.CONVERGED
    assert int(fused.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(base.x),
                               atol=1e-8)
    assert int(fused.n_qp_solves) == int(base.n_qp_solves)


@pytest.mark.parametrize("batch,sub_batch", [(5, 2), (4, 8)])
def test_pallas_chunk_matches_fori_loop_vmapped(batch, sub_batch):
    # batch=5, sub_batch=2 exercises grid blocking WITH padding; batch=4,
    # sub_batch=8 exercises the sub_batch > batch clamp.
    prob = _problem()
    init = stationary_init(jnp.array([-2.0, 0.0]), 4)
    goals = jnp.stack([jnp.array([2.0, 0.2 + 0.05 * i])
                       for i in range(batch)])
    base = jax.vmap(lambda g: _solves(prob, ADMMConfig())(
        init, {"goal": g}))(goals)
    cfg = ADMMConfig(use_pallas=True, pallas_sub_batch=sub_batch)
    fused = jax.vmap(lambda g: _solves(prob, cfg)(init, {"goal": g}))(goals)
    np.testing.assert_array_equal(np.asarray(fused.status),
                                  np.asarray(base.status))
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(base.x),
                               atol=1e-8)
