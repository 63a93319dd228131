"""Cluttered-scene planning: many candidate pairs, max_num_cnt top-k
contact cap keeps the QP small while still producing collision-free
trajectories (the fixed-size formulation of collision_types.h:162 at
working scale)."""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.collision.check import check_trajectory
from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.models.robots import arm7
from trajopt_tpu.problem.trajectory import TrajOptProblem, interpolated_init
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.collision import collision_term
from trajopt_tpu.terms.joint import joint_pos, joint_vel

HOME = np.array([-0.5, 1.0, 0.0, -1.2, 0.0, 0.8, 0.0])
GOAL = np.array([0.9, 1.0, 0.0, -1.2, 0.0, 0.8, 0.0])


def cluttered_scene():
    tree = arm7()
    s = CollisionScene(tree, check_self_collision=False)
    s.add_link_capsule("link_2", 0.08, [0, 0, 0.10], [0, 0, 0.36])
    s.add_link_capsule("link_4", 0.07, [0, 0, 0.0], [0, 0, 0.36])
    s.add_link_capsule("link_6", 0.06, [0, 0, 0.0], [0, 0, 0.10])
    s.add_link_sphere("link_7", 0.05, [0, 0, 0.08])
    # a ring of clutter around the workspace + the swing-blocking post
    s.add_world_box("post", [0.05, 0.05, 0.30], [0.39, 0.03, 1.00])
    rng = np.random.default_rng(7)
    for k in range(8):
        ang = 2 * np.pi * k / 8
        c = [0.8 * np.cos(ang), 0.8 * np.sin(ang),
             1.0 + 0.3 * rng.standard_normal()]
        if k % 2 == 0:
            s.add_world_sphere(f"clutter_s{k}", 0.12, c)
        else:
            s.add_world_box(f"clutter_b{k}", [0.1, 0.1, 0.1], c)
    return s


def test_topk_cap_reduces_rows_and_still_solves():
    s = cluttered_scene()
    assert s.n_pairs >= 30
    n = 8

    def build(max_num_cnt):
        prob = TrajOptProblem(n_steps=n, n_dof=7, joint_lower=s.tree.lower,
                              joint_upper=s.tree.upper, fixed_steps=[0])
        prob.add_term(joint_vel(n, 7, is_cost=True, coeffs=np.full(7, 5.0)))
        prob.add_term(joint_pos(n, 7, is_cost=False, targets=GOAL,
                                first_step=n - 1, last_step=n - 1))
        prob.add_term(collision_term(s, n, margin=0.02, coeff=20.0,
                                     is_cost=False, fixed_steps=[0],
                                     max_num_cnt=max_num_cnt))
        return prob

    prob_k = build(max_num_cnt=8)
    prob_full = build(max_num_cnt=None)
    rows_k = [t.n_rows for t in prob_k.term_sets if "collision" in t.name][0]
    rows_f = [t.n_rows for t in prob_full.term_sets if "collision" in t.name][0]
    assert rows_k == rows_f * 8 // s.n_pairs

    init = interpolated_init(jnp.asarray(HOME), jnp.asarray(GOAL), n)
    res = prob_k.make_solve()(init)
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(n, 7)
    for q in traj:
        assert float(jnp.min(s.distances(jnp.asarray(q)))) >= 0.02 - 1e-3
