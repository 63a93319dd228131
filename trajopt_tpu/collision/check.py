"""Independent trajectory collision checker for test verification.

Mirrors the role of ``checkTrajectory`` + contact managers in the
reference's end-to-end tests (``trajopt/test/cast_cost_unit.cpp:84-118``):
after optimizing, verify the result with a *dense* interpolated sweep that
is independent of the evaluator used during optimization.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from trajopt_tpu.collision.world import CollisionScene


def check_trajectory(scene: CollisionScene, traj: np.ndarray,
                     margin: float = 0.0, substeps: int = 20, params=None):
    """Returns (ok, min_distance): ok iff every densely-interpolated state
    keeps all pair distances above `margin`."""
    traj = np.asarray(traj)
    qs = []
    for t in range(traj.shape[0] - 1):
        for f in np.linspace(0.0, 1.0, substeps, endpoint=False):
            qs.append(traj[t] + f * (traj[t + 1] - traj[t]))
    qs.append(traj[-1])
    dmin = np.inf
    for q in qs:
        d = np.asarray(scene.distances(jnp.asarray(q), params))
        dmin = min(dmin, float(d.min()))
    return dmin > margin, dmin
