"""Observability: per-iteration callbacks, merit tables, CSV iteration logs.

Re-creates the reference's observability path (SURVEY.md par. 3.5):

* ``callCallbacks()`` per SQP iteration (optimizers.cpp:119-125) -> a host
  callback (``jax.debug.callback``) invoked from inside the jitted solve
  with the iteration snapshot; callbacks returning work on the host only
  (plotting/logging), matching SQPCallback semantics minus the abort path
  (aborting from the host would require a data-dependent exit; use
  ``max_iter`` instead).
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
