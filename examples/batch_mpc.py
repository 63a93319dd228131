"""Example: batched MPC over randomized scenes.

  python examples/batch_mpc.py [batch]

Thousands of independent receding-horizon controllers, each with its own
obstacle position and (moving) goal, advance in lockstep with ONE jitted
program per step — the 'Batched MPC: randomized scenes/goals' workload of
BASELINE.json at example scale.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    import trajopt_tpu as tt
    from trajopt_tpu.models.robots import spherebot

    tree = spherebot()
    scene = tt.CollisionScene(tree)
    scene.add_link_sphere("boxbot_link", 0.25)
    scene.add_world_box("obstacle", [0.5, 0.5, 0.5],
                        center_param="obstacle_pos")

    n = 6
    prob = tt.TrajOptProblem(n_steps=n, n_dof=2, joint_lower=[-10, -10],
                             joint_upper=[10, 10], fixed_steps=[0])
    prob.add_term(tt.joint_vel(n, 2, is_cost=True))
    prob.add_term(tt.joint_pos(n, 2, is_cost=False, targets="goal",
                               first_step=n - 1, last_step=n - 1))
    prob.add_term(tt.collision_term(scene, n, margin=0.1, coeff=20.0,
                                    is_cost=False, evaluator="cast",
                                    fixed_steps=[0]))

    step = jax.jit(jax.vmap(tt.make_mpc_step(prob)))

    rng = np.random.default_rng(0)
    obstacles = jnp.asarray(np.concatenate(
        [rng.uniform(-0.5, 0.5, (batch, 2)), np.zeros((batch, 1))], axis=1),
        jnp.float32)
    goals = jnp.asarray(rng.uniform(1.5, 2.5, (batch, 2)), jnp.float32)
    trajs = jnp.tile(jnp.asarray([[-2.0, 0.0]], jnp.float32), (batch, n, 1))

    for k in range(5):
        goals_k = goals + 0.05 * k  # goals drift each control cycle
        t0 = time.time()
        trajs, res = step(trajs, {"goal": goals_k, "obstacle_pos": obstacles})
        jax.block_until_ready(trajs)
        _ = np.asarray(res.status)
        dt = time.time() - t0
        conv = int((np.asarray(res.status) == tt.SQPStatus.CONVERGED).sum())
        print(f"mpc step {k}: {conv}/{batch} converged, "
              f"{batch / dt:.1f} re-solves/s")

    # verify a sample against each problem's own scene
    ok = 0
    for b in range(min(8, batch)):
        free, _ = tt.check_trajectory(
            scene, np.asarray(trajs[b]), substeps=8,
            params={"obstacle_pos": obstacles[b], "goal": goals_k[b]})
        ok += int(free)
    print(f"verified {ok}/8 sampled trajectories collision-free")


if __name__ == "__main__":
    main()
