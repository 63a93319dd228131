"""Per-constraint-group merit granularity tests.

The reference hatches one CollisionCost/Constraint per step/gap
(problem_description.cpp:1726-1770) so per-constraint merit inflation
(optimizers.cpp:947-959) and the cnt_tolerance decision operate per step.
TermSet.groups reproduces that: violations are summed per group and each
group carries its own merit coefficient.
"""

import jax.numpy as jnp
import numpy as np

from trajopt_tpu.sqp import nlp as nlp_mod
from trajopt_tpu.sqp.nlp import Kind, Nlp, TermSet
from trajopt_tpu.sqp.params import SQPParams, SQPStatus
from trajopt_tpu.sqp.solver import make_solver


def _grouped_problem():
    # x in R^2; grouped INEQ set: group 0 row x0 - 10 <= 0 (satisfiable),
    # group 1 row 0.5 - x1 <= 0 (x1 >= 0.5, infeasible under ub = 0).
    cnt = TermSet(
        "grouped", Kind.CNT_INEQ,
        lambda x, p: jnp.stack([x[0] - 10.0, 0.5 - x[1]]),
        n_rows=2, groups=np.array([0, 1]), n_groups=2)
    cost = TermSet("reg", Kind.COST_SQ, lambda x, p: x, n_rows=2)
    return Nlp(n=2, term_sets=(cost, cnt))


def test_only_violated_group_inflates():
    nlp = _grouped_problem()
    assert nlp_mod.num_cnt_groups(nlp) == 2
    sqp = SQPParams(inflate_constraints_individually=True)
    solve = make_solver(nlp, sqp=sqp)
    res = solve(jnp.zeros(2), jnp.full(2, -1.0), jnp.zeros(2), {})
    # group 1 is infeasible: penalty escalation exhausts on it alone
    assert int(res.status) == SQPStatus.PENALTY_ITERATION_LIMIT
    coeffs = np.asarray(res.merit_coeffs)
    assert coeffs.shape == (2,)
    assert coeffs[0] == sqp.initial_merit_error_coeff          # untouched
    assert coeffs[1] > sqp.initial_merit_error_coeff * 100     # inflated
    viols = np.asarray(res.cnt_viols)
    assert viols[0] < sqp.cnt_tolerance
    assert viols[1] > 0.4  # pinned at the bound, ~0.5 violation


def test_group_names_and_viol_vector_shapes():
    nlp = _grouped_problem()
    assert nlp_mod.cnt_group_names(nlp) == ["grouped[0]", "grouped[1]"]
    v = nlp_mod.eval_exact_cnt_viols(nlp, jnp.array([0.0, -0.25]), {})
    np.testing.assert_allclose(np.asarray(v), [0.0, 0.75], atol=1e-12)


def test_collision_term_reports_per_step_viols():
    from trajopt_tpu.collision.world import CollisionScene
    from trajopt_tpu.models.robots import boxbot
    from trajopt_tpu.terms.collision import collision_term

    tree = boxbot()
    scene = CollisionScene(tree, check_self_collision=False)
    scene.add_link_sphere("boxbot_link", 0.25)
    scene.add_world_box("obstacle", [0.5, 0.5, 0.5], [0.0, 0.0, 0.0])
    n_steps = 4
    t = collision_term(scene, n_steps, margin=0.1, coeff=1.0, is_cost=False)
    assert t.n_groups == n_steps
    assert t.groups.shape == (t.n_rows,)
    nlp = Nlp(n=n_steps * 2, term_sets=(t,), block=(n_steps, 2))
    # trajectory: steps 0/3 far from the obstacle, steps 1/2 inside it
    x = jnp.asarray(np.array([[3.0, 0], [0.3, 0], [0.0, 0.2], [-3.0, 0]],
                             float).reshape(-1))
    v = np.asarray(nlp_mod.eval_exact_cnt_viols(nlp, x, {}))
    assert v.shape == (n_steps,)
    assert v[0] == 0.0 and v[3] == 0.0
    assert v[1] > 0.0 and v[2] > 0.0


def test_cast_collision_groups_per_gap():
    from trajopt_tpu.collision.world import CollisionScene
    from trajopt_tpu.models.robots import boxbot
    from trajopt_tpu.terms.collision import collision_term

    tree = boxbot()
    scene = CollisionScene(tree, check_self_collision=False)
    scene.add_link_sphere("boxbot_link", 0.25)
    scene.add_world_box("obstacle", [0.5, 0.5, 0.5], [0.0, 0.0, 0.0])
    n_steps = 4
    t = collision_term(scene, n_steps, margin=0.05, coeff=1.0,
                       is_cost=False, evaluator="cast", lvs_substeps=3)
    assert t.n_groups == n_steps - 1          # one group per gap
    assert t.groups.max() == n_steps - 2
    # rows within a gap (all substeps, all pairs) share the gap's group
    rows_per_gap = t.n_rows // (n_steps - 1)
    assert np.all(t.groups[:rows_per_gap] == 0)
