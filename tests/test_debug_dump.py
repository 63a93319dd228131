"""Failure postmortem dump (utils/debug.py, the /tmp/fail.lp analog,
optimizers.cpp:821) and the avoid_singularity joint-subset variant."""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.models.robots import arm6
from trajopt_tpu.problem.trajectory import TrajOptProblem, stationary_init
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.cartesian import avoid_singularity
from trajopt_tpu.terms.joint import joint_pos, joint_vel
from trajopt_tpu.utils.debug import dump_failed_qps


def _prob(n=4, d=2):
    prob = TrajOptProblem(n_steps=n, n_dof=d, joint_lower=[-5] * d,
                          joint_upper=[5] * d, fixed_steps=[0])
    prob.add_term(joint_vel(n, d, is_cost=True))
    prob.add_term(joint_pos(n, d, is_cost=False, targets="goal",
                            first_step=n - 1, last_step=n - 1))
    return prob


def test_dump_writes_failed_lanes(tmp_path):
    prob = _prob()
    solve = prob.make_solve()
    goals = jnp.array([[1.0, 1.0], [2.0, -1.0]])
    res = jax.vmap(lambda g: solve(stationary_init(jnp.zeros(2), 4),
                                   {"goal": g}))(goals)
    # healthy solves -> nothing dumped
    path = str(tmp_path / "fail.npz")
    assert dump_failed_qps(prob.build(), res, {"goal": goals}, path) == 0
    # force a "failure" by dumping CONVERGED lanes instead — exercises the
    # re-convexify + npz write path on real data
    n = dump_failed_qps(prob.build(), res, {"goal": goals}, path,
                        statuses=(SQPStatus.CONVERGED,))
    assert n == 2
    blob = np.load(path)
    assert set(blob["failed_lanes"]) == {0, 1}
    assert blob["lane0_P"].shape == (8, 8)
    assert blob["lane0_x"].shape == (8,)


def test_avoid_singularity_subset():
    tree = arm6()
    n = 3
    full = avoid_singularity(tree, tree.link_names[-1], n)
    sub = avoid_singularity(tree, tree.link_names[-1], n, joints=[0, 1, 2])
    x = jnp.zeros((n * 6,)) + 0.3
    v_full = full.fn(x, {})
    v_sub = sub.fn(x, {})
    assert v_full.shape == v_sub.shape == (n,)
    # sigma_min over a column subset minimizes over a restricted input
    # subspace, so sigma_min(J_sub) >= sigma_min(J) and the subset error
    # 1/(sigma+lambda) can only be smaller
    assert float(v_sub[0]) <= float(v_full[0]) + 1e-9
    # and it must differ from the full-jacobian value (really a subset)
    assert abs(float(v_sub[0]) - float(v_full[0])) > 1e-9
