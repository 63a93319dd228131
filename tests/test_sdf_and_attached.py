"""SDF-grid worlds (octomap analog), attached objects, and MPC-style
warm-started re-solves (cast_cost_attached/octomap_unit + online planning
hooks of the reference)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_collision import SPHEREBOT, spherebot_scene
from trajopt_tpu.collision import geometry as geom
from trajopt_tpu.collision.sdf_grid import bake_sdf, sphere_sdf_distance
from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.problem.trajectory import TrajOptProblem, given_init, stationary_init
from trajopt_tpu.sqp.params import SQPStatus
from trajopt_tpu.terms.collision import collision_term
from trajopt_tpu.terms.joint import joint_pos, joint_vel


def box_sdf_fn(p):
    return geom.point_box_sdf(p, jnp.array([0.5, 0.5, 0.5]))


def test_sdf_grid_matches_analytic_box():
    grid = bake_sdf(box_sdf_fn, [-2, -2, -2], [2, 2, 2], spacing=0.05)
    rng = np.random.default_rng(0)
    for _ in range(20):
        p = jnp.asarray(rng.uniform(-1.8, 1.8, 3))
        got = float(grid.query(p))
        want = float(box_sdf_fn(p))
        assert abs(got - want) < 0.01  # trilinear error ~ h^2-level


def test_sdf_grid_gradients_finite():
    grid = bake_sdf(box_sdf_fn, [-2, -2, -2], [2, 2, 2], spacing=0.1)
    g = jax.grad(lambda p: grid.query(p))(jnp.array([1.2, 0.1, -0.3]))
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(g)), 1.0, atol=0.1)


def test_solve_against_sdf_world():
    """Same spherebot scenario but with the obstacle only known via an SDF
    grid (the octomap-world test analog)."""
    grid = bake_sdf(box_sdf_fn, [-2, -2, -2], [2, 2, 2], spacing=0.05)
    s = CollisionScene(SPHEREBOT)
    s.add_link_sphere("ball", 0.25)
    s.add_world_sdf("world_sdf", grid)
    prob = TrajOptProblem(n_steps=1, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10])
    prob.add_term(collision_term(s, 1, margin=0.3, coeff=1.0, is_cost=True))
    prob.add_term(collision_term(s, 1, margin=0.2, coeff=1.0, is_cost=False))
    prob.add_term(joint_pos(1, 2, is_cost=True, targets=np.zeros(2),
                            first_step=0, last_step=0))
    res = prob.make_solve()(given_init(jnp.array([[-0.75, 0.75]])))
    assert int(res.status) == SQPStatus.CONVERGED
    d = float(s.distances(res.x.reshape(2))[0])
    assert d >= 0.2 - 0.02  # within grid interpolation error


def test_attached_object_changes_clearance():
    """Attaching a box to the robot (pick-and-place attach) grows the
    required clearance (cast_cost_attached_unit analog)."""
    bare = spherebot_scene()
    attached = spherebot_scene()
    attached.add_link_box("ball", [0.3, 0.1, 0.1], center=(0.4, 0.0, 0.0),
                          name="carried_part")
    q = jnp.array([-1.2, 0.0])
    d_bare = float(jnp.min(bare.distances(q)))
    d_attached = float(jnp.min(attached.distances(q)))
    assert d_attached < d_bare  # the carried part reduces clearance

    # and the solver respects it: the goal pull stops farther out
    def solve_min_dist(scene):
        prob = TrajOptProblem(n_steps=1, n_dof=2, joint_lower=[-10, -10],
                              joint_upper=[10, 10])
        prob.add_term(collision_term(scene, 1, margin=0.1, coeff=1.0,
                                     is_cost=False))
        prob.add_term(joint_pos(1, 2, is_cost=True, targets=np.zeros(2),
                                first_step=0, last_step=0))
        res = prob.make_solve()(given_init(jnp.array([[-1.2, 0.0]])))
        assert int(res.status) == SQPStatus.CONVERGED
        return np.asarray(res.x)

    x_bare = solve_min_dist(bare)
    x_attached = solve_min_dist(attached)
    assert np.linalg.norm(x_attached) > np.linalg.norm(x_bare)


def test_mpc_warm_start_resolve():
    """Receding-horizon re-solve warm-started from the previous solution
    (GIVEN_TRAJ warm start + online re-solve hooks,
    trust_region_sqp_solver.h:57): fewer iterations than cold start."""
    s = spherebot_scene()
    n = 6
    prob = TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(joint_vel(n, 2, is_cost=True))
    prob.add_term(joint_pos(n, 2, is_cost=False, targets="goal",
                            first_step=n - 1, last_step=n - 1))
    prob.add_term(collision_term(s, n, margin=0.1, coeff=20.0, is_cost=False,
                                 fixed_steps=[0]))
    solve = prob.make_solve()

    goal1 = jnp.array([2.0, 0.5])
    res1 = solve(stationary_init(jnp.array([-2.0, 0.0]), n), {"goal": goal1})
    assert int(res1.status) == SQPStatus.CONVERGED

    # shift horizon: drop the first step, duplicate the last, nudge goal
    traj = res1.x.reshape(n, 2)
    shifted = jnp.concatenate([traj[1:], traj[-1:]], axis=0)
    goal2 = goal1 + jnp.array([0.1, -0.05])
    res_warm = solve(given_init(shifted), {"goal": goal2})
    res_cold = solve(stationary_init(traj[1], n), {"goal": goal2})
    assert int(res_warm.status) == SQPStatus.CONVERGED
    assert int(res_warm.n_iter) <= int(res_cold.n_iter)
