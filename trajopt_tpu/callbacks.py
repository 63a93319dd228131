"""Observability: per-iteration callbacks, merit tables, CSV iteration logs.

Re-creates the reference's observability path (SURVEY.md par. 3.5):

* ``callCallbacks()`` per SQP iteration (optimizers.cpp:119-125) -> a host
  callback (``jax.debug.callback``) invoked from inside the jitted solve
  with the iteration snapshot; :func:`make_stopping_callback` additionally
  returns an abort flag into the solve (``SQPCallback::execute -> bool``,
  false aborts with ``SQPStatus.STOPPED_BY_CALLBACK`` — types.h:224).
* The five reference SQPCallback classes (trajopt_sqp/callbacks/*) map to
  :class:`JointStatePlotter`, :class:`CollisionPlotter`,
  :class:`CartesianErrorPlotter`, :class:`ClearPlotter`,
  :class:`WaitForInput` — host-side objects usable as ``host_fn``s.
* ``BasicTrustRegionSQPResults::print()`` merit table
  (optimizers.cpp:428-531) -> :func:`format_merit_table`.
* ``WriteCallback`` CSV logs (file_write_callback.cpp; trajopt_solver.log /
  trajopt_vars.log etc., optimizers.cpp:708-718) -> :class:`CsvLogger`.
"""

from __future__ import annotations

import dataclasses
import io
from typing import Callable, Sequence

import jax
import numpy as np


@dataclasses.dataclass
class IterationSnapshot:
    """What a callback sees each SQP iteration (BasicTrustRegionSQPResults
    subset)."""

    iteration: int
    x: np.ndarray
    cost_vals: np.ndarray
    cnt_viols: np.ndarray
    merit_coeffs: np.ndarray
    box_size: float


def make_iteration_callback(host_fn: Callable[[IterationSnapshot], None]):
    """Wrap a host function into something callable from inside jit.

    Usage inside a solver loop:
        cb(iter, x, cost_vals, cnt_viols, merit_coeffs, box)
    """

    def _host(iteration, x, cost_vals, cnt_viols, merit_coeffs, box_size):
        host_fn(IterationSnapshot(
            iteration=int(iteration),
            x=np.asarray(x),
            cost_vals=np.asarray(cost_vals),
            cnt_viols=np.asarray(cnt_viols),
            merit_coeffs=np.asarray(merit_coeffs),
            box_size=float(box_size),
        ))

    def cb(iteration, x, cost_vals, cnt_viols, merit_coeffs, box_size):
        jax.debug.callback(_host, iteration, x, cost_vals, cnt_viols,
                           merit_coeffs, box_size)

    return cb


def make_stopping_callback(host_fn: Callable[[IterationSnapshot], bool]):
    """Like :func:`make_iteration_callback`, but the host function's return
    value steers the solve: returning False aborts it with
    ``SQPStatus.STOPPED_BY_CALLBACK`` (SQPCallback::execute semantics).

    Single-solve only (like the reference's interactive callbacks): the
    io_callback return path cannot live inside a vmapped while_loop (XLA:
    "unordered IO effects not supported with batched predicate").  Batched
    solves should use :func:`make_iteration_callback` (logging only) and
    bound work with max_iter."""
    import jax.numpy as jnp
    from jax.experimental import io_callback

    def _host(iteration, x, cost_vals, cnt_viols, merit_coeffs, box_size):
        cont = host_fn(IterationSnapshot(
            iteration=int(iteration),
            x=np.asarray(x),
            cost_vals=np.asarray(cost_vals),
            cnt_viols=np.asarray(cnt_viols),
            merit_coeffs=np.asarray(merit_coeffs),
            box_size=float(box_size),
        ))
        return np.asarray(not bool(cont))

    def cb(iteration, x, cost_vals, cnt_viols, merit_coeffs, box_size):
        return io_callback(
            _host, jax.ShapeDtypeStruct((), jnp.bool_), iteration, x,
            cost_vals, cnt_viols, merit_coeffs, box_size)

    return cb


class WaitForInput:
    """Block on stdin each iteration (callbacks/wait_for_input.h); entering
    ``q`` aborts the solve when wrapped in make_stopping_callback."""

    def __init__(self, prompt: str = "Hit enter to continue (q to abort)"):
        self.prompt = prompt

    def __call__(self, snap: IterationSnapshot) -> bool:
        return input(f"[iter {snap.iteration}] {self.prompt}: ").strip() != "q"


class JointStatePlotter:
    """Per-iteration joint-trajectory plot (callbacks/joint_state_plotter.h).

    Writes ``<prefix><iteration>.png``; keeps the iterate history for
    inspection/clearing."""

    def __init__(self, n_steps: int, n_dof: int, prefix: str | None = None):
        self.n_steps, self.n_dof = n_steps, n_dof
        self.prefix = prefix
        self.history: list[np.ndarray] = []

    def clear(self) -> None:
        self.history.clear()

    def __call__(self, snap: IterationSnapshot) -> bool:
        traj = snap.x.reshape(self.n_steps, -1)[:, :self.n_dof]
        self.history.append(traj)
        if self.prefix is not None:
            import matplotlib
            matplotlib.use("Agg", force=False)
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots()
            for j in range(self.n_dof):
                ax.plot(traj[:, j], label=f"j{j}")
            ax.set_xlabel("timestep")
            ax.set_ylabel("joint value")
            ax.legend(fontsize=6)
            fig.savefig(f"{self.prefix}{snap.iteration:03d}.png", dpi=60)
            plt.close(fig)
        return True


class CollisionPlotter:
    """Per-iteration contact/clearance plot (callbacks/collision_plotter.h):
    min signed distance per timestep from the scene's narrowphase."""

    def __init__(self, scene, n_steps: int, n_dof: int,
                 prefix: str | None = None):
        self.scene, self.n_steps, self.n_dof = scene, n_steps, n_dof
        self.prefix = prefix
        self.history: list[np.ndarray] = []

    def clear(self) -> None:
        self.history.clear()

    def __call__(self, snap: IterationSnapshot) -> bool:
        import jax.numpy as jnp
        traj = snap.x.reshape(self.n_steps, -1)[:, :self.n_dof]
        d = np.asarray(jax.vmap(self.scene.distances)(jnp.asarray(traj)))
        min_d = d.min(axis=1)
        self.history.append(min_d)
        if self.prefix is not None:
            import matplotlib
            matplotlib.use("Agg", force=False)
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots()
            ax.plot(min_d)
            ax.axhline(0.0, color="r", ls="--")
            ax.set_xlabel("timestep")
            ax.set_ylabel("min signed distance")
            fig.savefig(f"{self.prefix}{snap.iteration:03d}.png", dpi=60)
            plt.close(fig)
        return True


class CartesianErrorPlotter:
    """Per-iteration Cartesian error-norm trace
    (callbacks/cartesian_error_plotter.h); err_fn(x) -> error vector."""

    def __init__(self, err_fn: Callable[[np.ndarray], np.ndarray],
                 path: str | None = None):
        self.err_fn = err_fn
        self.path = path
        self.history: list[float] = []

    def clear(self) -> None:
        self.history.clear()

    def __call__(self, snap: IterationSnapshot) -> bool:
        self.history.append(float(np.linalg.norm(
            np.asarray(self.err_fn(snap.x)))))
        if self.path is not None:
            import matplotlib
            matplotlib.use("Agg", force=False)
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots()
            ax.semilogy(self.history)
            ax.set_xlabel("SQP iteration")
            ax.set_ylabel("|cartesian error|")
            fig.savefig(self.path, dpi=60)
            plt.close(fig)
        return True


class ClearPlotter:
    """Clears another plotter's accumulated state each iteration
    (callbacks/clear_plotter.h)."""

    def __init__(self, plotter):
        self.plotter = plotter

    def __call__(self, snap: IterationSnapshot) -> bool:
        self.plotter.clear()
        return True


def chain(*host_fns):
    """Compose host callbacks; the solve continues only if all agree
    (the reference iterates its callback list and ANDs the results)."""

    def run(snap: IterationSnapshot) -> bool:
        ok = True
        for f in host_fns:
            r = f(snap)
            ok = ok and (r is not False)
        return ok

    return run


def format_merit_table(cost_names: Sequence[str], cost_vals,
                       cnt_names: Sequence[str], cnt_viols,
                       merit_coeffs) -> str:
    """Render the per-iteration cost/constraint merit table
    (BasicTrustRegionSQPResults::print, optimizers.cpp:428-531)."""
    cost_vals = np.atleast_1d(np.asarray(cost_vals))
    cnt_viols = np.atleast_1d(np.asarray(cnt_viols))
    merit_coeffs = np.atleast_1d(np.asarray(merit_coeffs))
    buf = io.StringIO()
    buf.write(f"{'':>28} | {'value':>12}\n")
    buf.write("-" * 44 + "\n")
    for n, v in zip(cost_names, cost_vals):
        buf.write(f"{n[:28]:>28} | {v:12.5g}\n")
    for n, v, m in zip(cnt_names, cnt_viols, merit_coeffs):
        buf.write(f"{(n + ' (viol)')[:28]:>28} | {v:12.5g}  x{m:g}\n")
    total = float(cost_vals.sum() + (merit_coeffs * cnt_viols).sum())
    buf.write("-" * 44 + "\n")
    buf.write(f"{'merit':>28} | {total:12.5g}\n")
    return buf.getvalue()


class CsvLogger:
    """Accumulates per-iteration rows and writes CSV files analogous to
    trajopt_solver.log / trajopt_vars.log."""

    def __init__(self):
        self.rows: list[IterationSnapshot] = []

    def __call__(self, snap: IterationSnapshot) -> None:
        self.rows.append(snap)

    def write_solver_log(self, path: str) -> None:
        with open(path, "w") as f:
            f.write("iteration,total_cost,max_viol,box_size\n")
            for s in self.rows:
                max_viol = float(s.cnt_viols.max()) if s.cnt_viols.size else 0.0
                f.write(f"{s.iteration},{s.cost_vals.sum()},"
                        f"{max_viol},{s.box_size}\n")

    def write_vars_log(self, path: str) -> None:
        with open(path, "w") as f:
            for s in self.rows:
                vals = ",".join(str(v) for v in s.x.reshape(-1))
                f.write(f"{s.iteration},{vals}\n")
