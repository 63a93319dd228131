"""Plot callbacks: trajectory / convergence visualization.

Analog of the reference's ``PlotCallback`` (``trajopt/src/plot_callback.cpp``)
and the trajopt_sqp callback plotters, using matplotlib on the host instead
of tesseract_visualization.  Also covers the roles of
``trajopt/scripts/plot_optimization.py`` / ``traj_compare.py``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from trajopt_tpu.callbacks import CsvLogger, IterationSnapshot


def plot_iterations(logger: CsvLogger, path: str, n_steps: int, n_dof: int):
    """Write a convergence dashboard PNG: per-iteration total cost, max
    constraint violation, trust box size, and the trajectory evolution."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = logger.rows
    if not rows:
        raise ValueError("no iterations logged")
    iters = [s.iteration for s in rows]
    costs = [float(s.cost_vals.sum()) for s in rows]
    viols = [float(s.cnt_viols.max()) if s.cnt_viols.size else 0.0 for s in rows]
    boxes = [s.box_size for s in rows]

    fig, axes = plt.subplots(2, 2, figsize=(10, 7))
    axes[0, 0].plot(iters, costs, marker="o")
    axes[0, 0].set_title("total cost")
    axes[0, 1].semilogy(iters, np.maximum(viols, 1e-12), marker="o")
    axes[0, 1].set_title("max constraint violation")
    axes[1, 0].semilogy(iters, boxes, marker="o")
    axes[1, 0].set_title("trust box size")
    traj_ax = axes[1, 1]
    for k, s in enumerate(rows):
        traj = s.x.reshape(n_steps, -1)[:, :n_dof]
        alpha = min(1.0, 0.2 + 0.8 * (k + 1) / len(rows))
        traj_ax.plot(traj[:, 0], traj[:, 1] if n_dof > 1 else traj[:, 0],
                     alpha=alpha, color="C0")
    traj_ax.set_title("trajectory evolution (dof0 vs dof1)")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def plot_trajectory_joints(traj: np.ndarray, path: str,
                           joint_names: Sequence[str] | None = None):
    """Joint-position curves over time (traj_compare.py role)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    traj = np.asarray(traj)
    fig, ax = plt.subplots(figsize=(8, 5))
    for j in range(traj.shape[1]):
        name = joint_names[j] if joint_names else f"j{j}"
        ax.plot(traj[:, j], label=name)
    ax.set_xlabel("timestep")
    ax.set_ylabel("joint position")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
