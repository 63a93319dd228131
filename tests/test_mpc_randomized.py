"""Batched MPC with randomized scenes: per-problem obstacle positions from
params (center_param), receding-horizon re-solves via make_mpc_step, all
vmapped — the 'Batched MPC: randomized scenes/goals' BASELINE config at
test scale."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_collision import SPHEREBOT
from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.problem.mpc import make_mpc_step
from trajopt_tpu.problem.trajectory import TrajOptProblem, stationary_init
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.collision import collision_term
from trajopt_tpu.terms.joint import joint_pos, joint_vel


def param_scene():
    s = CollisionScene(SPHEREBOT)
    s.add_link_sphere("ball", 0.25)
    s.add_world_box("obstacle", [0.5, 0.5, 0.5], center_param="obstacle_pos")
    return s


def test_randomized_obstacle_positions_batched():
    s = param_scene()
    n = 5
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets="goal",
                            first_step=n - 1, last_step=n - 1))
    prob.add_term(collision_term(s, n, margin=0.1, coeff=20.0, is_cost=False,
                                 evaluator="cast", fixed_steps=[0]))
    solve = prob.make_solve()
    init = stationary_init(jnp.array([-2.0, 0.0]), n)

    # per-problem obstacle y-offsets; path must bend differently per lane
    obs = jnp.array([[0.0, 0.4, 0.0], [0.0, -0.4, 0.0], [0.3, 0.0, 0.0]])
    goals = jnp.tile(jnp.array([2.0, 0.0]), (3, 1))
    res = jax.jit(jax.vmap(
        lambda o, g: solve(init, {"obstacle_pos": o, "goal": g})))(obs, goals)
    assert np.all(np.asarray(res.status) == SQPStatus.CONVERGED)
    from trajopt_tpu.collision.check import check_trajectory
    for b in range(3):
        traj = np.asarray(res.x[b]).reshape(n, 2)
        params = {"obstacle_pos": obs[b], "goal": goals[b]}
        ok, dmin = check_trajectory(s, traj, margin=0.0, substeps=8,
                                    params=params)
        assert ok, (b, dmin)
    # different obstacles produce different paths
    assert not np.allclose(np.asarray(res.x[0]), np.asarray(res.x[1]),
                           atol=1e-3)


def test_mpc_steps_track_moving_goal():
    s = param_scene()
    n = 5
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets="goal",
                            first_step=n - 1, last_step=n - 1))
    prob.add_term(collision_term(s, n, margin=0.1, coeff=20.0, is_cost=False,
                                 fixed_steps=[0]))
    step = jax.jit(make_mpc_step(prob))

    obstacle = jnp.array([0.0, 0.0, 0.0])
    traj = np.asarray(stationary_init(jnp.array([-2.0, 0.0]), n))
    goal = np.array([2.0, 0.5])
    for k in range(4):
        goal_k = jnp.asarray(goal + 0.05 * k)
        traj_j, res = step(jnp.asarray(traj),
                           {"goal": goal_k, "obstacle_pos": obstacle})
        assert int(res.status) == SQPStatus.CONVERGED
        traj = np.asarray(traj_j)
        np.testing.assert_allclose(traj[-1], np.asarray(goal_k), atol=1e-3)


def test_mpc_diverged_lane_reinit():
    """reinit_goal_key: a lane whose solve did not converge hands the
    next cycle a fresh straight-line warm start instead of its diverged
    iterate (warm-start repair, ROADMAP round-4 decay fix)."""
    import dataclasses

    from trajopt_tpu.sqp.params import SQPParams

    n = 5
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets="goal",
                            first_step=n - 1, last_step=n - 1))
    # max_iter=0 forces SCO_ITERATION_LIMIT... use max_merit tiny instead:
    # an unreachable goal (outside joint bounds is clipped, so use a
    # conflicting fixed-step + goal with zero iterations allowed)
    sqp = dataclasses.replace(SQPParams(), max_iter=1,
                              min_approx_improve=1e10)  # every solve stalls
    step = jax.jit(make_mpc_step(prob, sqp, reinit_goal_key="goal"))
    traj0 = stationary_init(jnp.array([-2.0, 0.0]), n)
    goal = jnp.array([2.0, 0.5])
    new_traj, res = step(traj0, {"goal": goal})
    assert int(res.status) != SQPStatus.CONVERGED
    # the handed-off plan is the straight line start -> goal, not the
    # diverged iterate
    start = np.asarray(traj0)[0]
    expect = np.linspace(start, np.asarray(goal), n)
    np.testing.assert_allclose(np.asarray(new_traj), expect, atol=1e-6)
