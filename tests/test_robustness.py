"""Failure-handling and determinism tests (SURVEY par. 5: per-problem
status codes, NaN guards, determinism under batching replacing the
reference's multithreaded re-run tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.problem.trajectory import TrajOptProblem, stationary_init
from trajopt_tpu.sqp.nlp import Kind, Nlp, TermSet
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.sqp.solver import make_solver
from trajopt_tpu.terms.joint import joint_pos, joint_vel

INF = float("inf")


def test_nan_cost_fails_cleanly():
    """A term producing NaN must end in FAILED, not hang or 'converge'."""
    def bad(x, p):
        return jnp.array([jnp.sqrt(x[0])])  # NaN for x[0] < 0

    nlp = Nlp(n=1, term_sets=(
        TermSet("bad", Kind.COST_SQ, bad, 1),
        TermSet("pull", Kind.CNT_EQ, lambda x, p: x + 5.0, 1),
    ))
    solver = make_solver(nlp)
    res = solver(jnp.array([4.0]), jnp.full(1, -INF), jnp.full(1, INF), {})
    # constraint pulls x negative -> NaN cost; solver must terminate with a
    # definite status (not RUNNING) and finite iterate bookkeeping
    assert int(res.status) != SQPStatus.RUNNING
    assert int(res.n_iter) < 300


def test_unsatisfiable_constraints_hit_penalty_limit():
    nlp = Nlp(n=1, term_sets=(
        TermSet("a", Kind.CNT_EQ, lambda x, p: x - 1.0, 1),
        TermSet("b", Kind.CNT_EQ, lambda x, p: x + 1.0, 1),
    ))
    solver = make_solver(nlp)
    res = solver(jnp.zeros(1), jnp.full(1, -INF), jnp.full(1, INF), {})
    assert int(res.status) == SQPStatus.PENALTY_ITERATION_LIMIT
    # merit coeffs escalated the full 5 rounds (10 * 10^5)
    assert float(res.merit_coeffs.max()) >= 10.0 * 10.0 ** 4


def test_second_chance_restart_recovers():
    """max_restarts: a lane that exhausts its merit escalations under a
    hopeless initial coefficient recovers when the restart re-seeds the
    penalty schedule at restart_merit_coeff (round-5 hard-mix knob)."""
    import dataclasses

    from trajopt_tpu.sqp.params import SQPParams

    # strong cost pulls x to 0; constraint wants x = 1.  With coeff
    # starting at 1e-6 and only 2 escalations (max coeff 1e-4 << cost
    # curvature) the violation never closes -> PENALTY_ITERATION_LIMIT.
    nlp = Nlp(n=1, term_sets=(
        TermSet("pull", Kind.COST_SQ, lambda x, p: 100.0 * x, 1),
        TermSet("goal", Kind.CNT_EQ, lambda x, p: x - 1.0, 1),
    ))
    base = dataclasses.replace(
        SQPParams(), initial_merit_error_coeff=1e-6,
        max_merit_coeff_increases=2)
    res = make_solver(nlp, sqp=base)(
        jnp.zeros(1), jnp.full(1, -INF), jnp.full(1, INF), {})
    assert int(res.status) == SQPStatus.PENALTY_ITERATION_LIMIT

    # One restart with a live coefficient converges (x -> 1 within the
    # exact-penalty threshold; 1e6 >> 2*100^2 makes the L1 penalty exact).
    res2 = make_solver(nlp, sqp=dataclasses.replace(
        base, max_restarts=1, restart_merit_coeff=1e6))(
        jnp.zeros(1), jnp.full(1, -INF), jnp.full(1, INF), {})
    assert int(res2.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(float(res2.x[0]), 1.0, atol=1e-3)


def test_box_reset_to_initial_flag():
    """box_reset_to_initial must not change results on an easy problem
    (escalation never fires) and must compile cleanly."""
    import dataclasses

    from trajopt_tpu.sqp.params import SQPParams

    n = 4
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets=np.array([1.0, 2.0]),
                            first_step=n - 1, last_step=n - 1))
    init = stationary_init(jnp.zeros(2), n)
    r1 = prob.make_solve(SQPParams())(init, {})
    r2 = prob.make_solve(dataclasses.replace(
        SQPParams(), box_reset_to_initial=True))(init, {})
    assert int(r2.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-10)


def test_batch_order_invariance():
    """Permuting the batch permutes the results identically (determinism
    under batching — the analog of the reference's threaded re-run
    determinism)."""
    n = 4
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets="goal",
                            first_step=n - 1, last_step=n - 1))
    solve = prob.make_solve()
    init = stationary_init(jnp.zeros(2), n)
    goals = jnp.asarray(np.random.default_rng(1).normal(size=(6, 2)))
    f = jax.jit(jax.vmap(lambda g: solve(init, {"goal": g})))
    x1 = np.asarray(f(goals).x)
    perm = np.array([3, 1, 5, 0, 4, 2])
    x2 = np.asarray(f(goals[perm]).x)
    np.testing.assert_allclose(x2, x1[perm], atol=1e-12)


def test_repeat_call_bitwise_deterministic():
    n = 4
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets=np.array([1.0, 2.0]),
                            first_step=n - 1, last_step=n - 1))
    solve = jax.jit(prob.make_solve())
    init = stationary_init(jnp.zeros(2), n)
    r1 = solve(init, {})
    r2 = solve(init, {})
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))


def test_rescale_duals_on_escalation_preserves_results():
    """The saturated-dual rescale (opt-in) must not change what a solve
    converges to on problems with penalty escalation; it only re-seeds
    ADMM warm starts."""
    import dataclasses

    from trajopt_tpu.sqp.params import SQPParams

    # needs escalation: strong-ish cost vs a constraint, feasible
    nlp = Nlp(n=2, term_sets=(
        TermSet("pull", Kind.COST_SQ, lambda x, p: 3.0 * x, 2),
        TermSet("sum", Kind.CNT_EQ,
                lambda x, p: jnp.atleast_1d(x[0] + x[1] - 2.0), 1),
    ))
    base = dataclasses.replace(SQPParams(), initial_merit_error_coeff=0.1)
    r0 = make_solver(nlp, sqp=base)(
        jnp.zeros(2), jnp.full(2, -INF), jnp.full(2, INF), {})
    r1 = make_solver(nlp, sqp=dataclasses.replace(
        base, rescale_duals_on_escalation=True))(
        jnp.zeros(2), jnp.full(2, -INF), jnp.full(2, INF), {})
    assert int(r0.status) == SQPStatus.CONVERGED
    assert int(r1.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r0.x),
                               atol=1e-6)


def test_multistart_restart_escapes_zero_gradient_trap():
    """params["restart_inits"]: a lane stuck at a zero-gradient point of
    its constraint (1 - x^2 <= 0 at x = 0: every linearization is the
    unimprovable constant row 1 <= 0) exhausts penalty escalations in
    place, and an IN-PLACE restart cannot help — but a restart re-seeded
    from the caller's family row x = 0.5 sees a live gradient and
    converges to the feasible set |x| >= 1 (round-5 multi-start knob for
    the residual hard-mix local minima)."""
    import dataclasses

    from trajopt_tpu.sqp.params import SQPParams

    nlp = Nlp(n=1, term_sets=(
        TermSet("center", Kind.COST_SQ, lambda x, p: 0.1 * x, 1),
        TermSet("ring", Kind.CNT_INEQ, lambda x, p: 1.0 - x * x, 1),
    ))
    lo, hi = jnp.full(1, -INF), jnp.full(1, INF)

    base = SQPParams()
    res = make_solver(nlp, sqp=base)(jnp.zeros(1), lo, hi, {})
    assert int(res.status) == SQPStatus.PENALTY_ITERATION_LIMIT

    # In-place restart: still trapped (control for the family's effect).
    inplace = dataclasses.replace(base, max_restarts=1)
    res_ip = make_solver(nlp, sqp=inplace)(jnp.zeros(1), lo, hi, {})
    assert int(res_ip.status) == SQPStatus.PENALTY_ITERATION_LIMIT

    # Family-seeded restart: escapes and satisfies the constraint.
    res_ms = make_solver(nlp, sqp=inplace)(
        jnp.zeros(1), lo, hi,
        {"restart_inits": jnp.array([[0.5]])})
    assert int(res_ms.status) == SQPStatus.CONVERGED
    assert abs(float(res_ms.x[0])) >= 1.0 - 1e-3

    # Presence of the key must not disturb a lane that never restarts.
    easy = make_solver(nlp, sqp=inplace)(
        jnp.full(1, 2.0), lo, hi,
        {"restart_inits": jnp.array([[0.5]])})
    easy_ref = make_solver(nlp, sqp=inplace)(jnp.full(1, 2.0), lo, hi, {})
    assert int(easy.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(easy.x), np.asarray(easy_ref.x),
                               atol=1e-12)


def test_multistart_restart_last_rows_rule():
    """With max_restarts=2 and a 1-row family, restart 0 is in place and
    restart 1 consumes the family row (the LAST R restarts re-seed)."""
    import dataclasses

    from trajopt_tpu.sqp.params import SQPParams

    nlp = Nlp(n=1, term_sets=(
        TermSet("center", Kind.COST_SQ, lambda x, p: 0.1 * x, 1),
        TermSet("ring", Kind.CNT_INEQ, lambda x, p: 1.0 - x * x, 1),
    ))
    lo, hi = jnp.full(1, -INF), jnp.full(1, INF)
    sqp = dataclasses.replace(SQPParams(), max_restarts=2)
    res = make_solver(nlp, sqp=sqp)(
        jnp.zeros(1), lo, hi, {"restart_inits": jnp.array([[-0.5]])})
    # second restart seeds x=-0.5 -> converges to the nearer ring point -1
    assert int(res.status) == SQPStatus.CONVERGED
    np.testing.assert_allclose(float(res.x[0]), -1.0, atol=1e-3)
