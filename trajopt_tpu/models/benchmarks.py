"""Benchmark problem builders — the headline workloads from BASELINE.json
and the reference benchmark harness (solve_benchmarks.cpp):

* arm_table_problem: 30-step 7-DOF collision-constrained solve (north-star
  metric: converged solves/s), analog of BM_TRAJOPT_PLANNING_SOLVE's
  arm-around-table scene.
* simple_collision_problem: spherebot 1-step scene
  (BM_TRAJOPT_SIMPLE_COLLISION_SOLVE analog).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.models.robots import arm7, arm7_scene, boxbot
from trajopt_tpu.problem.trajectory import TrajOptProblem, interpolated_init
from trajopt_tpu.terms.collision import collision_term
from trajopt_tpu.terms.joint import joint_pos, joint_vel

ARM7_HOME = np.array([-0.5, 1.0, 0.0, -1.2, 0.0, 0.8, 0.0])
ARM7_GOAL = np.array([0.9, 1.0, 0.0, -1.2, 0.0, 0.8, 0.0])


def arm_table_problem(n_steps: int = 30, *, evaluator: str = "discrete",
                      margin: float = 0.025, coeff: float = 20.0,
                      lvs_substeps: int = 3) -> tuple[TrajOptProblem, CollisionScene]:
    """7-DOF arm reaching across a table post: joint_vel smoothing cost,
    goal joint-pose equality constraint (params key 'goal'), collision
    inequality constraints."""
    tree = arm7()
    scene = arm7_scene()
    prob = TrajOptProblem(
        n_steps=n_steps, n_dof=7,
        joint_lower=tree.lower, joint_upper=tree.upper,
        fixed_steps=[0],
    )
    prob.add_term(joint_vel(n_steps, 7, is_cost=True, coeffs=np.full(7, 5.0)))
    prob.add_term(joint_pos(n_steps, 7, is_cost=False, targets="goal",
                            first_step=n_steps - 1, last_step=n_steps - 1))
    prob.add_term(collision_term(
        scene, n_steps, margin=margin, coeff=coeff, is_cost=False,
        evaluator=evaluator, fixed_steps=[0], lvs_substeps=lvs_substeps))
    return prob, scene


def arm_table_batch(key, batch: int, n_steps: int = 30, dtype=jnp.float32):
    """Random goals around ARM7_GOAL + interpolated inits, batched."""
    # Per-joint noise: small on the shoulder/elbow joints that place the
    # arm relative to the post (keeps sampled goals collision-free),
    # larger on wrist joints.
    scale = jnp.asarray([0.05, 0.03, 0.05, 0.05, 0.1, 0.1, 0.3], dtype)
    noise = scale * jax.random.normal(key, (batch, 7), dtype)
    goals = jnp.asarray(ARM7_GOAL, dtype)[None, :] + noise
    tree = arm7()
    goals = jnp.clip(goals, jnp.asarray(tree.lower + 0.05, dtype),
                     jnp.asarray(tree.upper - 0.05, dtype))
    home = jnp.asarray(ARM7_HOME, dtype)
    inits = jax.vmap(lambda g: interpolated_init(home, g, n_steps))(goals)
    return inits, goals


def simple_collision_problem() -> tuple[TrajOptProblem, CollisionScene]:
    """Spherebot simple-collision scene (simple_collision_test.json): one
    step pulled into the obstacle by a joint_pos cost, pushed out by
    collision cost + constraint."""
    tree = boxbot()
    scene = CollisionScene(tree)
    scene.add_link_sphere("boxbot_link", 0.25)
    scene.add_world_box("obstacle", [0.5, 0.5, 0.5], [0.0, 0.0, 0.0])
    prob = TrajOptProblem(n_steps=1, n_dof=2, joint_lower=[-10, -10],
                          joint_upper=[10, 10])
    prob.add_term(collision_term(scene, 1, margin=0.3, coeff=1.0, is_cost=True))
    prob.add_term(collision_term(scene, 1, margin=0.2, coeff=1.0, is_cost=False))
    prob.add_term(joint_pos(1, 2, is_cost=True, targets=np.zeros(2),
                            first_step=0, last_step=0))
    return prob, scene
