"""PR2-class cast-collision flagship workload (the reference's headline
planning benchmark shape: solve_benchmarks.cpp:48-61 / arm_around_table
with evaluator_type 4): 8-DOF whole-body robot (torso lift + 7R arm) with
self-collision ON over 90+ candidate pairs, straight-line init sweeping
the wrist THROUGH the table between waypoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.models.benchmarks import (PR2ISH_GOAL, PR2ISH_HOME,
                                           pr2ish_table_batch,
                                           pr2ish_table_problem)
from trajopt_tpu.problem.trajectory import interpolated_init
from trajopt_tpu.sqp.params import SQPStatus


def test_scene_is_pr2_class():
    """Richness guarantees from VERDICT: 50+ candidate pairs,
    self-collision pairs present, 8 DOF."""
    prob, scene = pr2ish_table_problem(n_steps=5)
    pairs = scene.pairs()
    assert len(pairs) >= 50
    assert prob.n_dof == 8
    self_pairs = [(a, b) for a, b in pairs
                  if a.link is not None and b.link is not None]
    assert len(self_pairs) >= 30
    # left-arm (tucked, fixed) vs right-arm pairs are live
    lr = [(a, b) for a, b in self_pairs
          if (a.link or "").startswith("l_") or (b.link or "").startswith("l_")]
    assert len(lr) >= 5


def test_cast_is_load_bearing():
    """The straight-line init is waypoint-collision-free in the gap that
    penetrates mid-sweep: only the swept narrowphase can see it."""
    _, scene = pr2ish_table_problem(n_steps=10)
    home = jnp.asarray(PR2ISH_HOME)
    goal = jnp.asarray(PR2ISH_GOAL)
    init = np.asarray(interpolated_init(home, goal, 10)).reshape(10, 8)
    worst_swept = 1e9
    worst_disc = 1e9
    for g in range(9):
        qa, qb = jnp.asarray(init[g]), jnp.asarray(init[g + 1])
        worst_swept = min(worst_swept,
                          float(jnp.min(scene.swept_distances(qa, qb))))
        worst_disc = min(worst_disc, float(jnp.min(scene.distances(qa))))
    assert worst_swept < 0.0          # real penetration between waypoints
    assert worst_disc > worst_swept   # invisible at the waypoints alone


def test_pr2ish_cast_solve():
    n = 10
    prob, scene = pr2ish_table_problem(n_steps=n)
    solve = prob.make_solve(structured=True)
    init = interpolated_init(jnp.asarray(PR2ISH_HOME),
                             jnp.asarray(PR2ISH_GOAL), n)
    res = solve(init, {"goal": jnp.asarray(PR2ISH_GOAL)})
    assert int(res.status) == SQPStatus.CONVERGED
    traj = np.asarray(res.x).reshape(n, 8)
    # independent continuous check (the checkTrajectory role): swept
    # clearance across every gap >= margin (within constraint tolerance)
    for g in range(n - 1):
        d = float(jnp.min(scene.swept_distances(jnp.asarray(traj[g]),
                                                jnp.asarray(traj[g + 1]))))
        assert d >= 0.025 - 2e-3
    np.testing.assert_allclose(traj[-1], PR2ISH_GOAL, atol=1e-4)
    np.testing.assert_allclose(traj[0], PR2ISH_HOME, atol=1e-9)


def test_pr2ish_batch_goals_feasible():
    """Sampled bench goals keep full clearance (no infeasible lanes in the
    throughput metric)."""
    _, scene = pr2ish_table_problem(n_steps=5)
    inits, goals = pr2ish_table_batch(jax.random.PRNGKey(0), 64, 5,
                                      dtype=jnp.float64)
    d = jax.vmap(lambda g: jnp.min(scene.distances(g)))(goals)
    assert float(jnp.min(d)) >= 0.03


def test_pr2ish_hard_mix_goals_feasible_and_distinct():
    """hard_frac routes the first lanes to the borderline detour goals
    (models/benchmarks.py PR2ISH_GOALS_BORDERLINE): the goals themselves
    stay collision-free (the instances are hard because of the PATH, not
    an infeasible target), and the hard lanes differ from the standard
    mode."""
    from trajopt_tpu.models.benchmarks import PR2ISH_GOALS_BORDERLINE

    _, scene = pr2ish_table_problem(n_steps=5)
    inits, goals = pr2ish_table_batch(jax.random.PRNGKey(0), 32, 5,
                                      dtype=jnp.float64, hard_frac=0.25)
    d = jax.vmap(lambda g: jnp.min(scene.distances(g)))(goals)
    assert float(jnp.min(d)) >= 0.02
    # first ceil(0.25*32)=8 lanes are near the borderline cluster
    g = np.asarray(goals)
    base = PR2ISH_GOALS_BORDERLINE[np.arange(8) % 3]
    assert np.abs(g[:8] - base).max() < 0.5
    # ...and far from the standard goal mode
    assert np.abs(g[:8] - np.asarray(PR2ISH_GOAL)).max() > 0.5
    # standard lanes unchanged vs hard_frac=0 for the same key
    _, goals0 = pr2ish_table_batch(jax.random.PRNGKey(0), 32, 5,
                                   dtype=jnp.float64, hard_frac=0.0)
    np.testing.assert_allclose(g[8:], np.asarray(goals0)[8:], atol=0)
