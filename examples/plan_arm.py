"""Example: plan a 7-DOF arm trajectory from a JSON document and plot it.

  python examples/plan_arm.py [out_dir]

Loads the bundled arm-table JSON config (the reference's JSON problem-file
workflow), solves on the available device, verifies collision clearance
with the independent dense checker, and writes joint-curve + convergence
plots.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trajopt_tpu_example"
    os.makedirs(out_dir, exist_ok=True)

    from trajopt_tpu.callbacks import CsvLogger, make_iteration_callback
    from trajopt_tpu.collision.check import check_trajectory
    from trajopt_tpu.models.benchmarks import ARM7_HOME
    from trajopt_tpu.models.robots import arm7, arm7_scene
    from trajopt_tpu.plotting import plot_iterations, plot_trajectory_joints
    from trajopt_tpu.problem.json_io import Environment, construct_problem

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "trajopt_tpu",
                            "data", "config", "arm_table.json")
    with open(cfg_path) as f:
        doc = json.load(f)

    env = Environment(tree=arm7(), scene=arm7_scene(),
                      current_state=ARM7_HOME)
    jp = construct_problem(doc, env)

    # The CSV iteration callback rides jax io_callback, which the
    # tunneled axon TPU backend does not support (host send/recv);
    # skip it there — the solve itself is unaffected.
    pv = getattr(jax.devices()[0].client, "platform_version", "")
    use_callback = "axon" not in pv
    logger = CsvLogger()
    cb = make_iteration_callback(logger) if use_callback else None
    solve = jp.prob.make_solve(jp.sqp, callback=cb)
    res = solve(jp.init_traj)
    n = jp.prob.n_steps
    traj = np.asarray(res.x).reshape(n, 7)

    from trajopt_tpu.sqp.params import SQPStatus
    print("status:", SQPStatus.NAMES[int(res.status)],
          "iterations:", int(res.n_iter),
          "qp solves:", int(res.n_qp_solves))
    ok, dmin = check_trajectory(env.scene, traj, substeps=4)
    print(f"independent collision check: free={ok} min_clearance={dmin:.4f}")

    plot_trajectory_joints(traj, os.path.join(out_dir, "trajectory.png"),
                           env.tree.active_joint_names)
    if use_callback:
        plot_iterations(logger, os.path.join(out_dir, "convergence.png"),
                        n_steps=n, n_dof=7)
        logger.write_solver_log(os.path.join(out_dir, "trajopt_solver.log"))
    print("wrote plots + logs to", out_dir)


if __name__ == "__main__":
    main()
