"""Damped-least-squares inverse kinematics (jittable).

Fills the role of the external IK solvers tesseract provides to the
reference's InverseKinematicsConstraint
(``trajopt_ifopt/src/constraints/inverse_kinematics_constraint.cpp``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from trajopt_tpu.kinematics.chain import KinematicTree
from trajopt_tpu.kinematics.transforms import transform_error


def solve_ik(tree: KinematicTree, link: str, R_target, p_target,
             q_seed, *, damping: float = 1e-2, iters: int = 50,
             pos_only: bool = False):
    """Iterative DLS IK: returns (q, err_norm).  Static iteration count for
    jit friendliness; clamps to joint limits each step."""
    link_id = tree.link_id(link)
    R_t = jnp.asarray(R_target)
    p_t = jnp.asarray(p_target)
    lower = jnp.asarray(tree.lower, jnp.result_type(q_seed))
    upper = jnp.asarray(tree.upper, jnp.result_type(q_seed))

    def err(q):
        R, p = tree.fk(q)
        e = transform_error(R_t, p_t, R[link_id], p[link_id])
        return e[:3] if pos_only else e

    def step(q, _):
        e = err(q)
        J = jax.jacrev(err)(q)
        H = J.T @ J + damping * jnp.eye(q.shape[0], dtype=q.dtype)
        dq = jnp.linalg.solve(H, -(J.T @ e))
        q = jnp.clip(q + dq, lower, upper)
        return q, None

    q, _ = jax.lax.scan(step, jnp.asarray(q_seed), None, length=iters)
    return q, jnp.linalg.norm(err(q))
