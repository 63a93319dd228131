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


PR2ISH_HOME = np.array([0.05, -1.9, 1.2, -1.0, -1.4, 0.0, -0.6, 0.0])
PR2ISH_GOAL = np.array([0.15, -0.3, 0.3, -0.5, -0.9, 0.0, -1.0, 0.0])
# Detour-forcing second goal mode (VERDICT r3 weak #5): the wrist ends
# UNDER the table slab inside its footprint (FK wrist ~[0.55, -0.34,
# 0.40]; slab z in [0.59, 0.65]), collision-free at the goal (clearance
# > 0.04) but with straight-line inits that drag the forearm through the
# table edge/leg region.
PR2ISH_GOAL_HARD = np.array([0.143, -0.158, 0.853, 0.644, -0.28, 1.399,
                             -1.347, -0.736])
# BORDERLINE hard goal cluster (round-4 sweep, /tmp recipe recorded in
# ROADMAP): wrist high over the table (z in [1.0, 1.4] above the slab),
# collision-free at the goal, where noise clusters show MIXED outcomes —
# lanes converge at 6-7 SQP iterations after several penalty escalations
# or exhaust merit increases.  These drive the bench's hard-mix line
# (exercises penalty escalation + trust shrink, the reference's
# hard-scene benchmark regime).
PR2ISH_GOALS_BORDERLINE = np.array([
    [0.1143, -0.5558, -0.1523, 0.0904, -0.5861, 1.357, -1.2312, 0.7872],
    [0.2411, 0.0659, -0.3671, -1.8761, -0.7197, 3.0094, -1.1766, -2.5179],
    [0.2331, -0.4895, -0.2305, -0.6582, -0.3882, -1.6229, -1.8168,
     -3.0383],
])


def pr2ish_table_problem(n_steps: int = 30, *, evaluator: str = "cast",
                         margin: float = 0.025, coeff: float = 20.0,
                         lvs_substeps: int = 3,
                         max_num_cnt: int | None = 16,
                         unify_narrowphase: bool = False,
                         ) -> tuple[TrajOptProblem, CollisionScene]:
    """PR2-class arm-around-table CAST workload: 8-DOF (torso lift + 7R
    arm), self-collision ON, 90+ candidate pairs (tucked left arm, head,
    base, table + cabinet world).  The straight-line init sweeps the wrist
    THROUGH the table top between steps, so the swept/cast narrowphase is
    load-bearing — the discrete evaluator at the waypoints alone would
    accept colliding gaps.

    This is the reference's headline planning benchmark shape
    (solve_benchmarks.cpp:48-61 runs arm_around_table.json with
    evaluator_type 4 = CAST_CONTINUOUS on PR2 with self-collision pairs).
    ``max_num_cnt`` caps QP rows per (gap, sub-segment) via worst-k, the
    fixed-size analog of the reference's dynamic contact sets
    (collision_types.h:156-162)."""
    from trajopt_tpu.models.robots import pr2ish, pr2ish_scene

    tree = pr2ish()
    scene = pr2ish_scene()
    scene.unify_narrowphase = unify_narrowphase
    prob = TrajOptProblem(
        n_steps=n_steps, n_dof=8,
        joint_lower=tree.lower, joint_upper=tree.upper,
        fixed_steps=[0],
    )
    prob.add_term(joint_vel(n_steps, 8, is_cost=True, coeffs=np.full(8, 5.0)))
    prob.add_term(joint_pos(n_steps, 8, is_cost=False, targets="goal",
                            first_step=n_steps - 1, last_step=n_steps - 1))
    prob.add_term(collision_term(
        scene, n_steps, margin=margin, coeff=coeff, is_cost=False,
        evaluator=evaluator, fixed_steps=[0], lvs_substeps=lvs_substeps,
        max_num_cnt=max_num_cnt))
    return prob, scene


def pr2ish_table_batch(key, batch: int, n_steps: int = 30,
                       dtype=jnp.float32, hard_frac: float = 0.0):
    """Randomized goals around PR2ISH_GOAL + interpolated inits.

    Noise is small on the joints that place the forearm relative to the
    table (sampled goals stay >= 0.06 clear of every pair; verified over
    300 draws) and large on the distance-insensitive roll joints.

    ``hard_frac`` routes the FIRST ``ceil(hard_frac * batch)`` lanes to
    the detour-forcing PR2ISH_GOAL_HARD mode (wrist under the table slab)
    so the batch exercises penalty escalation / trust shrink, the
    reference-benchmark regime (its planning scene is a hard detour, not
    a warm-up — solve_benchmarks.cpp:48-61)."""
    from trajopt_tpu.models.robots import pr2ish

    scale = jnp.asarray([0.01, 0.02, 0.015, 0.03, 0.03, 0.2, 0.04, 0.3],
                        dtype)
    noise = scale * jax.random.normal(key, (batch, 8), dtype)
    goals = jnp.asarray(PR2ISH_GOAL, dtype)[None, :] + noise
    if hard_frac > 0.0:
        n_hard = int(np.ceil(hard_frac * batch))
        hard_scale = jnp.asarray([0.01, 0.02, 0.02, 0.03, 0.03, 0.1,
                                  0.04, 0.1], dtype)
        hnoise = hard_scale * jax.random.normal(
            jax.random.fold_in(key, 1), (n_hard, 8), dtype)
        base = jnp.asarray(
            PR2ISH_GOALS_BORDERLINE[
                np.arange(n_hard) % len(PR2ISH_GOALS_BORDERLINE)], dtype)
        goals = jnp.concatenate([base + hnoise, goals[n_hard:]], axis=0)
    tree = pr2ish()
    goals = jnp.clip(goals, jnp.asarray(tree.lower + 0.02, dtype),
                     jnp.asarray(tree.upper - 0.02, dtype))
    home = jnp.asarray(PR2ISH_HOME, dtype)
    inits = jax.vmap(lambda g: interpolated_init(home, g, n_steps))(goals)
    return inits, goals


def pr2ish_restart_family(goals, n_steps: int = 30, dtype=jnp.float32,
                          rows: int = 1):
    """Multi-start restart family for the pr2ish workloads: one
    alternative init per lane, routed home -> PR2ISH_GOAL -> goal.

    PR2ISH_GOAL (the easy goal mode: wrist over the table front) is
    straight-line reachable from home (256/256 headline lanes), and the
    borderline-hard goals sit high above the slab, so the second leg
    approaches them from over the table instead of sweeping the forearm
    through the table edge — the detour the residual hard-mix local
    minima need (ROADMAP "Hard-mix convergence": in-place restarts
    converge in place with the goal violation persisting).

    ``rows=2`` adds a second, qualitatively different detour routed
    through a torso-raised arm-up via (min scene clearance 0.185 vs the
    easy goal's 0.081) for lanes whose local minimum sits near the
    easy-goal route.

    Returns ``[B, rows, n_steps, 8]``; pass per-lane rows as
    ``params["restart_inits"]`` with ``SQPParams.max_restarts >= rows+1``
    — the LAST family-sized block of restarts consumes the rows, restart
    0 stays in place (solver.py multi-start restart)."""
    goals = jnp.asarray(goals, dtype)
    home = jnp.asarray(PR2ISH_HOME, dtype)
    h = n_steps // 2
    vias = [jnp.asarray(PR2ISH_GOAL, dtype),
            jnp.asarray([0.30, -0.3, -0.4, -0.5, -0.9, 0.0, -1.0, 0.0],
                        dtype)][:rows]

    def one(g):
        out = []
        for via in vias:
            a = interpolated_init(home, via, h + 1)
            b = interpolated_init(via, g, n_steps - h)
            out.append(jnp.concatenate([a, b[1:]], axis=0))
        return jnp.stack(out)

    return jax.vmap(one)(goals)


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
