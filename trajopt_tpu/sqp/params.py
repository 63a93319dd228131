"""SQP parameters and status codes.

Field names, defaults, and semantics mirror
``sco::BasicTrustRegionSQPParameters``
(``trajopt_sco/include/trajopt_sco/optimizers.hpp:92-135``) and
``trajopt_sqp::SQPParameters`` (``trajopt_optimizers/trajopt_sqp/include/
trajopt_sqp/types.h:99-141``) so converged/parity semantics match the
reference.  All parameters are static under jit (uniform across a batch).

Deviation from the reference: no wall-clock ``max_time`` (data-dependent
host time checks don't exist inside jit); bound the work with ``max_iter``
and ``max_merit_coeff_increases`` instead.
"""

from __future__ import annotations

import dataclasses

from trajopt_tpu.qp.admm import ADMMConfig


class SQPStatus:
    """Integer status codes, matching sco::OptStatus (optimizers.hpp:25-33)."""

    RUNNING = 0
    CONVERGED = 1
    SCO_ITERATION_LIMIT = 2
    PENALTY_ITERATION_LIMIT = 3
    FAILED = 4
    # Callback asked to abort (kStoppedByCallback, trajopt_sqp/types.h:224)
    STOPPED_BY_CALLBACK = 5
    # Wall-clock limit hit (OPT_TIME_LIMIT; host-driven solvers only —
    # data-dependent time checks don't exist inside jit)
    TIME_LIMIT = 6

    NAMES = {
        0: "RUNNING",
        1: "CONVERGED",
        2: "SCO_ITERATION_LIMIT",
        3: "PENALTY_ITERATION_LIMIT",
        4: "FAILED",
        5: "STOPPED_BY_CALLBACK",
        6: "TIME_LIMIT",
    }


@dataclasses.dataclass(frozen=True)
class SQPParams:
    improve_ratio_threshold: float = 0.25
    min_trust_box_size: float = 1e-4
    min_approx_improve: float = 1e-4
    min_approx_improve_frac: float = -float("inf")
    max_iter: int = 50
    trust_shrink_ratio: float = 0.1
    trust_expand_ratio: float = 1.5
    cnt_tolerance: float = 1e-4
    max_merit_coeff_increases: int = 5
    max_qp_solver_failures: int = 3
    merit_coeff_increase_ratio: float = 10.0
    initial_merit_error_coeff: float = 10.0
    inflate_constraints_individually: bool = True
    initial_trust_box_size: float = 1e-1
    # Max trust-region-loop iterations per convexification.  The reference's
    # inner while runs until accept or box < min; with shrink=0.1 from the
    # largest sensible box that is bounded, so a static cap is safe.
    max_trust_iter: int = 12
    # On penalty escalation, reset the trust box to initial_trust_box_size
    # instead of the reference's fmax(box, min/shrink*1.5)
    # (optimizers.cpp:967).  A collapsed box at escalation time otherwise
    # limits the very next round to ~1.5e-3-size steps, so a lane that
    # needs a detour re-converges in place and burns its merit increases
    # without moving (round-5 hard-mix fix; measured on the borderline
    # cluster).
    box_reset_to_initial: bool = False
    # Second-chance restarts (extension; the reference has none): when the
    # penalty loop exhausts max_merit_coeff_increases with violated
    # constraints, restart the penalty schedule from the CURRENT iterate —
    # merit_increases=0, box=initial_trust_box_size, coeffs=
    # restart_merit_coeff — up to max_restarts times before declaring
    # PENALTY_ITERATION_LIMIT.  The escalated iterate is usually near-
    # feasible; a fresh schedule from it converges where continuing to
    # escalate (f32 coeff overflow) cannot.
    #
    # Multi-start variant: when params["restart_inits"] carries R
    # alternative trajectories ([R, n] after reshape), the LAST R
    # restarts re-seed x from those rows (fresh duals + exact evals)
    # instead of restarting in place — the escape hatch for init-family
    # local minima that in-place restarts re-converge into (solver.py;
    # tests/test_robustness.py multistart tests).
    max_restarts: int = 0
    restart_merit_coeff: float = 100.0
    # Rescale the carried ADMM duals of SATURATED penalty rows (|y| ~ c)
    # when the merit coefficients change (escalation x10 / restart): at
    # an L1 optimum the dual of a still-violated row equals its weight c,
    # so scaling y by the coefficient ratio seeds the next round's QP at
    # the right dual magnitude.  Off by default: the load-bearing fix for
    # escalated-penalty dual starvation is ADMMConfig.rho_dual_scale
    # (without which duals never saturate and this gate never fires), and
    # with it the rescale is a marginal warm-start tweak that costs ~2
    # extra QP solves on some small problems.
    rescale_duals_on_escalation: bool = False
    # Wall-clock budget in seconds (BasicTrustRegionSQPParameters::max_time).
    # Enforced per SQP iteration by the host-driven reference solver
    # (sqp/reference_solver.py -> TIME_LIMIT); the jit solver cannot check
    # host time inside the compiled loop — bound its work with max_iter /
    # max_merit_coeff_increases instead.
    max_time: float = float("inf")
    qp: ADMMConfig = ADMMConfig(eps_abs=1e-8, eps_rel=1e-8, max_iter=1500)
    # QP algorithm class: "admm" (first-order prox splitting, the TPU
    # throughput path) or "ipm" (second-order Mehrotra predictor-corrector,
    # qp/ipm.py — the high-accuracy / cross-validation path, the role the
    # reference's BPMPD/Gurobi interior-point backends play next to OSQP,
    # solver_interface.cpp:255-292).  Dense path only; static under jit.
    qp_algorithm: str = "admm"
