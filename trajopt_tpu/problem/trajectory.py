"""Trajectory problem container: decision matrix, bounds, init trajectories.

The TPU-native counterpart of ``trajopt::TrajOptProb`` + ``ConstructProblem``
(``trajopt/src/problem_description.cpp:410-592``): the decision variable is a
flat view of an ``[n_steps, n_dof (+1 time col)]`` matrix; joint limits give
variable bounds; fixed timesteps/dofs pin entries by collapsing their bounds
to the initial value (equivalent to the reference's equality constraints at
``problem_description.cpp:485-530``, but free on TPU); init trajectories
replicate ``generateInitTraj`` (``problem_description.cpp:310-376``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.sqp.nlp import Nlp, TermSet
from trajopt_tpu.sqp.params import SQPParams
from trajopt_tpu.sqp.solver import SQPResult, make_solver


@dataclasses.dataclass
class TrajOptProblem:
    """Mutable builder; ``build()`` freezes it into an Nlp + solve fn."""

    n_steps: int
    n_dof: int
    joint_lower: np.ndarray | Sequence[float]
    joint_upper: np.ndarray | Sequence[float]
    use_time: bool = False
    dt_lower: float = 1e-3   # bounds on the 1/dt column when use_time
    dt_upper: float = 100.0
    fixed_steps: Sequence[int] = ()
    fixed_dofs: Sequence[int] = ()
    term_sets: list[TermSet] = dataclasses.field(default_factory=list)

    @property
    def n_dof_total(self) -> int:
        return self.n_dof + (1 if self.use_time else 0)

    @property
    def n(self) -> int:
        return self.n_steps * self.n_dof_total

    def add_term(self, term: TermSet) -> "TrajOptProblem":
        self.term_sets.append(term)
        return self

    def build(self) -> Nlp:
        self._validate_terms()
        return Nlp(n=self.n, term_sets=tuple(self.term_sets),
                   block=(self.n_steps, self.n_dof_total))

    def _validate_terms(self) -> None:
        """Catch shape mistakes (e.g. a term built without n_dof_total on a
        use_time problem) at construction instead of deep inside jit."""
        import jax

        x0 = jnp.zeros(self.n)
        for t in self.term_sets:
            try:
                shape = jax.eval_shape(lambda v: t.fn(v, {}), x0).shape
            except KeyError:
                continue  # params-dependent term; can't probe without params
            except Exception as e:
                raise ValueError(
                    f"term {t.name!r} failed to evaluate on a "
                    f"[{self.n_steps} x {self.n_dof_total}] trajectory "
                    f"(was it built with n_dof_total={self.n_dof_total}?)"
                ) from e
            n_rows = int(np.prod(shape)) if shape else 1
            if n_rows != t.n_rows:
                raise ValueError(
                    f"term {t.name!r} declares {t.n_rows} rows but "
                    f"produces {n_rows}")

    def bounds(self, init_traj: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Variable bounds [n]: joint limits intersected with fixed pins.

        Joint-limit bounds per problem_description.cpp:553-592; fixed
        timesteps/dofs pinned to the initial trajectory values.
        """
        lo = jnp.asarray(self.joint_lower, jnp.result_type(init_traj))
        hi = jnp.asarray(self.joint_upper, jnp.result_type(init_traj))
        lb = jnp.tile(lo, (self.n_steps, 1))
        ub = jnp.tile(hi, (self.n_steps, 1))
        if self.use_time:
            dtype = lb.dtype
            lb = jnp.concatenate(
                [lb, jnp.full((self.n_steps, 1), self.dt_lower, dtype)], axis=1)
            ub = jnp.concatenate(
                [ub, jnp.full((self.n_steps, 1), self.dt_upper, dtype)], axis=1)
        x0 = init_traj.reshape(self.n_steps, self.n_dof_total)
        for t in self.fixed_steps:
            lb = lb.at[t, : self.n_dof].set(x0[t, : self.n_dof])
            ub = ub.at[t, : self.n_dof].set(x0[t, : self.n_dof])
        for j in self.fixed_dofs:
            lb = lb.at[:, j].set(x0[:, j])
            ub = ub.at[:, j].set(x0[:, j])
        return lb.reshape(-1), ub.reshape(-1)

    def make_solve(self, sqp: SQPParams = SQPParams(), callback=None,
                   structured: bool = False):
        """Returns solve(init_traj, params) -> SQPResult (jit/vmap friendly).

        ``structured=True`` uses the banded ADMM (step-local constraint
        windows instead of dense A streaming) — requires banded_jac on all
        constraint/penalty-cost sets."""
        nlp = self.build()
        solver = make_solver(nlp, sqp=sqp, callback=callback,
                             structured=structured)

        def solve(init_traj: jax.Array, params: Any = None) -> SQPResult:
            x0 = jnp.asarray(init_traj).reshape(-1)
            lb, ub = self.bounds(x0)
            return solver(x0, lb, ub, params or {})

        return solve


def stationary_init(current: jax.Array, n_steps: int, dt: float | None = None):
    """InitInfo::STATIONARY: replicate the current state (pd.cpp:332-336)."""
    traj = jnp.tile(jnp.asarray(current)[None, :], (n_steps, 1))
    return _append_dt(traj, dt)


def interpolated_init(start: jax.Array, end: jax.Array, n_steps: int,
                      dt: float | None = None):
    """InitInfo::JOINT_INTERPOLATED: linspace start->end (pd.cpp:344-353)."""
    start = jnp.asarray(start)
    end = jnp.asarray(end)
    w = jnp.linspace(0.0, 1.0, n_steps, dtype=start.dtype)[:, None]
    traj = start[None, :] * (1.0 - w) + end[None, :] * w
    return _append_dt(traj, dt)


def given_init(traj: jax.Array, dt: float | None = None):
    """InitInfo::GIVEN_TRAJ (pd.cpp:355-370)."""
    return _append_dt(jnp.asarray(traj), dt)


def _append_dt(traj: jax.Array, dt: float | None):
    if dt is None:
        return traj
    col = jnp.full((traj.shape[0], 1), 1.0 / dt, traj.dtype)
    return jnp.concatenate([traj, col], axis=1)
