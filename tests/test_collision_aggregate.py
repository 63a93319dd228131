"""Weighted-average fixed-size contact aggregation + per-timestep
coeff/margin vectors (reference: weighted_average_methods.cpp:31-108,
discrete_collision_constraint.cpp:60-140; per-step collision data in
TrajOptCollisionConfig)."""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.models.robots import boxbot
from trajopt_tpu.problem.trajectory import TrajOptProblem, given_init
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.collision import collision_term
from trajopt_tpu.terms.joint import joint_pos


def _two_sphere_scene():
    """One moving link with TWO spheres vs one world box: 2 geom pairs in
    a single link pair (the aggregation unit)."""
    tree = boxbot()
    s = CollisionScene(tree, check_self_collision=False)
    s.add_link_sphere("boxbot_link", 0.25, center=[0.0, 0.3, 0.0],
                      name="s_up")
    s.add_link_sphere("boxbot_link", 0.25, center=[0.0, -0.3, 0.0],
                      name="s_dn")
    s.add_world_box("obstacle", [0.5, 0.5, 0.5], [0.0, 0.0, 0.0])
    return tree, s


def test_weighted_average_value_is_max_of_members():
    tree, s = _two_sphere_scene()
    t_raw = collision_term(s, 1, margin=0.3, coeff=2.0, is_cost=False)
    t_agg = collision_term(s, 1, margin=0.3, coeff=2.0, is_cost=False,
                           aggregate="weighted_average")
    assert t_raw.n_rows == 2 and t_agg.n_rows == 1
    x = jnp.array([1.0, 0.2])   # off-center: the two spheres differ
    rows_raw = np.asarray(t_raw.fn(x, {}))
    rows_agg = np.asarray(t_agg.fn(x, {}))
    np.testing.assert_allclose(rows_agg[0], rows_raw.max(), atol=1e-12)


def test_weighted_average_jacobian_matches_hand_formula():
    tree, s = _two_sphere_scene()
    margin, coeff, buf = 0.3, 2.0, 0.05
    t_agg = collision_term(s, 1, margin=margin, coeff=coeff, is_cost=False,
                           aggregate="weighted_average",
                           safety_margin_buffer=buf)
    x = jnp.array([0.9, 0.15])
    # member data from the scene directly
    ds, Js = s.distances_and_jac(x)
    ds, Js = np.asarray(ds), np.asarray(Js)
    viol = coeff * (margin - ds)
    w = np.maximum(viol + coeff * buf, 0.0)
    expect = (w[:, None] * (-coeff * Js)).sum(0) / w.sum()
    J = np.asarray(t_agg.jac_fn(x.reshape(-1), {}))
    np.testing.assert_allclose(J[0], expect, atol=1e-9)
    # banded form agrees
    W = np.asarray(t_agg.banded_jac(x.reshape(-1), {}))
    np.testing.assert_allclose(W[0], expect, atol=1e-9)


def test_weighted_average_zero_weight_guard():
    tree, s = _two_sphere_scene()
    t_agg = collision_term(s, 1, margin=0.1, coeff=1.0, is_cost=False,
                           aggregate="weighted_average")
    # far away: all buffered errors <= 0 -> zero rows, no NaNs
    J = np.asarray(t_agg.jac_fn(jnp.array([8.0, 0.0]), {}))
    assert np.all(np.isfinite(J))
    np.testing.assert_allclose(J, 0.0)


def test_weighted_average_cast_and_solve():
    tree = boxbot()
    s = CollisionScene(tree, check_self_collision=False)
    s.add_link_sphere("boxbot_link", 0.25, center=[0.0, 0.3, 0.0],
                      name="s_up")
    s.add_link_sphere("boxbot_link", 0.25, center=[0.0, -0.3, 0.0],
                      name="s_dn")
    # obstacle offset in y so the straight-line init sees an escape
    # direction (a perfectly symmetric head-on init is a gradient saddle
    # for ANY formulation; the reference inits are offset the same way)
    s.add_world_box("obstacle", [0.5, 0.5, 0.5], [0.0, -0.4, 0.0])
    n = 4
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    from trajopt_tpu.terms.joint import joint_vel
    prob.add_term(joint_vel(n, 2, is_cost=True, coeffs=np.full(2, 2.0)))
    prob.add_term(joint_pos(n, 2, is_cost=False,
                            targets=np.array([2.0, 0.0]),
                            first_step=n - 1, last_step=n - 1))
    t = collision_term(s, n, margin=0.05, coeff=20.0, is_cost=False,
                       evaluator="cast", lvs_substeps=3,
                       aggregate="weighted_average",
                       safety_margin_buffer=0.05)
    assert t.n_groups == n - 1
    prob.add_term(t)
    init = given_init(jnp.array([[-2.0, 0.0], [-0.7, 0], [0.7, 0],
                                 [2.0, 0.0]]))
    res = prob.make_solve()(init)
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(n, 2)
    # dense interpolated clearance check (independent of the term)
    for k in range(60):
        f = k / 59.0
        seg = int(min(f * (n - 1), n - 2))
        q = traj[seg] + (f * (n - 1) - seg) * (traj[seg + 1] - traj[seg])
        assert float(jnp.min(s.distances(jnp.asarray(q)))) > 0.0


def test_per_step_coeff_and_margin_vectors():
    tree, s = _two_sphere_scene()
    n = 3
    coeffs = np.array([1.0, 2.0, 4.0])
    margins = np.array([0.1, 0.2, 0.3])
    t = collision_term(s, n, margin=margins, coeff=coeffs, is_cost=False)
    x = jnp.tile(jnp.array([0.9, 0.0]), (n,))
    rows = np.asarray(t.fn(x, {})).reshape(n, 2)
    d = np.asarray(s.distances(jnp.array([0.9, 0.0])))
    for step in range(n):
        np.testing.assert_allclose(rows[step],
                                   coeffs[step] * (margins[step] - d),
                                   atol=1e-9)


def test_max_num_cnt_caps_link_pairs_under_aggregation():
    tree = boxbot()
    s = CollisionScene(tree, check_self_collision=False)
    s.add_link_sphere("boxbot_link", 0.25)
    for i, cx in enumerate((1.2, 2.5, 4.0)):
        s.add_world_box(f"b{i}", [0.3, 0.3, 0.3], [cx, 0.0, 0.0])
    t = collision_term(s, 1, margin=0.3, coeff=1.0, is_cost=False,
                       aggregate="weighted_average", max_num_cnt=2)
    assert t.n_rows == 2
    rows = np.asarray(t.fn(jnp.array([0.0, 0.0]), {}))
    # keeps the two nearest obstacles' rows
    d = np.asarray(s.distances(jnp.array([0.0, 0.0])))
    expect = np.sort(0.3 - d)[::-1][:2]
    np.testing.assert_allclose(np.sort(rows), np.sort(expect), atol=1e-9)
