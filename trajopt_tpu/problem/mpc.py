"""Receding-horizon (MPC) re-solve on top of the batched solver.

The reference exposes online re-planning hooks (``stepSQPSolver`` "for
online planning", trust_region_sqp_solver.h:57) and warm starts via
GIVEN_TRAJ; this module packages that pattern TPU-natively: a jittable
``mpc_step`` that advances the horizon (shift + duplicate last), pins the
new start state, and re-solves warm-started — vmappable over thousands of
scenes/goals (the 'Batched MPC' BASELINE.json config).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from trajopt_tpu.problem.trajectory import TrajOptProblem
from trajopt_tpu.sqp.params import SQPParams
from trajopt_tpu.sqp.solver import SQPResult


class MpcState(NamedTuple):
    traj: jax.Array      # [n_steps, n_dof_total] current plan
    last: SQPResult | None


def make_mpc_step(prob: TrajOptProblem, sqp: SQPParams = SQPParams(),
                  structured: bool = False):
    """Returns ``step(traj, params) -> (new_traj, SQPResult)``.

    The previous plan is shifted one step (the executed step drops off,
    the last state duplicates) and used as the warm start; fixed_steps
    should include 0 so the new start state is pinned.  ``structured``
    routes the QP through the block-banded ADMM path (4x the dense cast
    throughput, see ROADMAP round-4 measurements).
    """
    solve = prob.make_solve(sqp, structured=structured)
    n_steps = prob.n_steps

    def step(traj: jax.Array, params: Any):
        traj = traj.reshape(n_steps, -1)
        shifted = jnp.concatenate([traj[1:], traj[-1:]], axis=0)
        res = solve(shifted, params)
        return res.x.reshape(n_steps, -1), res

    return step
