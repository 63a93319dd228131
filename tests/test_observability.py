"""Callback/logging tests: per-iteration host callbacks fire from inside
jit, CSV logs are written, merit tables render (plot_callback /
file_write_callback / results-print analogs)."""

import os

import jax.numpy as jnp
import numpy as np

from trajopt_tpu.callbacks import (
    CsvLogger, format_merit_table, make_iteration_callback)
from trajopt_tpu.problem.trajectory import TrajOptProblem, stationary_init
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.joint import joint_pos, joint_vel


def _problem(n=4, d=2):
    prob = TrajOptProblem(n_steps=n, n_dof=d, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, d, is_cost=True))
    prob.add_term(joint_pos(n, d, is_cost=False, targets=np.array([1.0, -1.0]),
                            first_step=n - 1, last_step=n - 1))
    return prob


def test_iteration_callback_fires(tmp_path):
    logger = CsvLogger()
    prob = _problem()
    solve = prob.make_solve(callback=make_iteration_callback(logger))
    res = solve(stationary_init(jnp.zeros(2), 4))
    assert int(res.status) == SQPStatus.CONVERGED
    assert len(logger.rows) >= 1
    assert logger.rows[0].x.shape == (8,)
    assert logger.rows[0].cnt_viols.shape == (1,)

    solver_log = os.path.join(tmp_path, "trajopt_solver.log")
    vars_log = os.path.join(tmp_path, "trajopt_vars.log")
    logger.write_solver_log(solver_log)
    logger.write_vars_log(vars_log)
    assert open(solver_log).readline().startswith("iteration,")
    assert len(open(vars_log).readlines()) == len(logger.rows)


def test_merit_table_renders():
    table = format_merit_table(
        ["joint_vel"], np.array([1.5]),
        ["goal"], np.array([0.02]), np.array([10.0]))
    assert "joint_vel" in table
    assert "merit" in table
    assert "x10" in table


def test_plotting_writes_pngs(tmp_path):
    import os
    from trajopt_tpu.callbacks import CsvLogger, make_iteration_callback
    from trajopt_tpu.plotting import plot_iterations, plot_trajectory_joints
    import jax.numpy as jnp
    logger = CsvLogger()
    prob = _problem()
    solve = prob.make_solve(callback=make_iteration_callback(logger))
    res = solve(stationary_init(jnp.zeros(2), 4))
    p1 = os.path.join(tmp_path, "iters.png")
    p2 = os.path.join(tmp_path, "traj.png")
    plot_iterations(logger, p1, n_steps=4, n_dof=2)
    plot_trajectory_joints(np.asarray(res.x).reshape(4, 2), p2)
    assert os.path.getsize(p1) > 1000
    assert os.path.getsize(p2) > 1000


def test_checkpoint_roundtrip(tmp_path):
    import os
    from trajopt_tpu.utils.checkpoint import (
        load_result, load_trajectories, save_result, save_trajectories)
    import jax.numpy as jnp
    prob = _problem()
    res = prob.make_solve()(stationary_init(jnp.zeros(2), 4))
    p = os.path.join(tmp_path, "ckpt.npz")
    save_result(p, res, extra={"tag": 7})
    res2, extra = load_result(p)
    np.testing.assert_array_equal(np.asarray(res.x), res2.x)
    assert int(extra["tag"]) == 7
    p2 = os.path.join(tmp_path, "trajs.npz")
    save_trajectories(p2, np.asarray(res.x).reshape(1, 4, 2),
                      params={"goal": np.ones(2)})
    trajs, params = load_trajectories(p2)
    assert trajs.shape == (1, 4, 2)
    np.testing.assert_allclose(params["goal"], 1.0)


def test_timer_and_counters():
    import jax.numpy as jnp
    from trajopt_tpu.utils.profiling import Timer, solve_counters
    prob = _problem()
    solve = prob.make_solve()
    with Timer() as t:
        res = t.observe(solve(stationary_init(jnp.zeros(2), 4)))
    assert t.elapsed > 0
    c = solve_counters(res)
    assert c["n_qp_solves"] >= 1 and c["n_func_evals"] >= 1


# ---------------------------------------------------------------- callbacks


def _tiny_problem():
    from trajopt_tpu.sqp.nlp import Kind, Nlp, TermSet
    import jax.numpy as jnp

    return Nlp(n=2, term_sets=(
        TermSet(name="quad", kind=Kind.COST_SQ,
                fn=lambda x, p: x - jnp.asarray([1.0, -1.0]), n_rows=2),
        TermSet(name="sum", kind=Kind.CNT_INEQ,
                fn=lambda x, p: jnp.sum(x)[None] - 10.0, n_rows=1),
    ))


def test_stopping_callback_aborts_solve():
    import jax.numpy as jnp
    import numpy as np

    from trajopt_tpu.callbacks import make_stopping_callback
    from trajopt_tpu.sqp.params import SQPStatus
    from trajopt_tpu.sqp.solver import make_solver

    nlp = _tiny_problem()
    seen = []

    def host(snap):
        seen.append(snap.iteration)
        return snap.iteration < 2  # abort at iteration 2

    solve = make_solver(nlp, callback=make_stopping_callback(host))
    res = solve(jnp.zeros(2), jnp.full(2, -5.0), jnp.full(2, 5.0), {})
    assert int(res.status) == SQPStatus.STOPPED_BY_CALLBACK
    assert int(res.n_iter) == 3          # stopped during the 3rd iteration
    assert seen == [0, 1, 2]
    # iterate unchanged by the aborted iteration: x is the accepted iterate
    # of iteration 1 (not further optimized)
    assert np.all(np.isfinite(np.asarray(res.x)))


def test_wait_for_input_continue_and_abort(monkeypatch):
    from trajopt_tpu.callbacks import IterationSnapshot, WaitForInput
    import numpy as np

    snap = IterationSnapshot(0, np.zeros(2), np.zeros(1), np.zeros(1),
                             np.zeros(1), 0.1)
    w = WaitForInput()
    monkeypatch.setattr("builtins.input", lambda *_: "")
    assert w(snap) is True
    monkeypatch.setattr("builtins.input", lambda *_: "q")
    assert w(snap) is False


def test_plotter_callbacks_write_and_clear(tmp_path):
    import jax.numpy as jnp
    import numpy as np

    from trajopt_tpu.callbacks import (CartesianErrorPlotter, ClearPlotter,
                                       CollisionPlotter, IterationSnapshot,
                                       JointStatePlotter, chain)
    from trajopt_tpu.collision.world import CollisionScene
    from trajopt_tpu.models.robots import spherebot

    n_steps, n_dof = 4, 2
    x = np.linspace(0.0, 1.0, n_steps * n_dof)
    snap = IterationSnapshot(0, x, np.zeros(1), np.zeros(1), np.zeros(1), 0.1)

    jp = JointStatePlotter(n_steps, n_dof, prefix=str(tmp_path / "js_"))
    assert jp(snap) is True
    assert (tmp_path / "js_000.png").exists()
    assert len(jp.history) == 1

    tree = spherebot()
    scene = CollisionScene(tree)
    scene.add_link_sphere(tree.link_names[-1], 0.2)
    scene.add_world_box("obs", [0.3, 0.3, 0.3], center=[1.0, 0.0, 0.0])
    cp = CollisionPlotter(scene, n_steps, n_dof,
                          prefix=str(tmp_path / "cp_"))
    assert cp(snap) is True
    assert (tmp_path / "cp_000.png").exists()

    ce = CartesianErrorPlotter(lambda xv: xv[:3] - 1.0,
                               path=str(tmp_path / "cart.png"))
    assert ce(snap) is True
    assert (tmp_path / "cart.png").exists()

    combined = chain(jp, ClearPlotter(jp))
    assert combined(snap) is True
    assert len(jp.history) == 0  # cleared after plotting
