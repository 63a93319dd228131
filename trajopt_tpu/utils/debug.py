"""Postmortem dump of failed solves — the /tmp/fail.lp analog.

The reference writes the convex model of a failed QP to /tmp/fail.lp for
offline inspection (optimizers.cpp:821).  Here a solve is a jitted batched
program, so the dump runs AFTER the solve: given the returned SQPResult,
re-convexify at each failed lane's final iterate and write the full QP
data (P, q, A, l, u, c rows + iterate + statuses) as an .npz that any
QP solver can replay.
"""

from __future__ import annotations

import numpy as np

from trajopt_tpu.sqp import nlp as nlp_mod
from trajopt_tpu.sqp.params import SQPStatus


def dump_failed_qps(nlp, result, params, path: str,
                    statuses=(SQPStatus.FAILED,)) -> int:
    """Write one npz with the convexified QP at every failed lane.

    ``result`` is an SQPResult (batched or single); ``params`` the matching
    params pytree.  Returns the number of lanes dumped (0 writes nothing).
    Usage::

        res = solve_batch(inits, goals)
        n_bad = dump_failed_qps(prob.build(), res, {"goal": goals},
                                "/tmp/trajopt_fail.npz")

    Per-lane slicing HEURISTIC (mirrors jax.vmap's default in_axes=0): any
    params leaf whose LEADING dimension equals the lane count is treated as
    batched and indexed per lane; everything else is passed through whole.
    A lane-invariant leaf whose first dimension coincidentally equals the
    batch size will be mis-sliced — pre-slice such params yourself and pass
    the single-lane pytree with an unbatched result instead.
    """
    import jax
    import jax.numpy as jnp

    status = np.atleast_1d(np.asarray(result.status))
    xs = np.atleast_2d(np.asarray(result.x))
    bad = np.isin(status, np.asarray([int(s) for s in statuses]))
    idx = np.nonzero(bad)[0]
    if idx.size == 0:
        return 0

    def lane_params(i):
        return jax.tree_util.tree_map(
            lambda a: a[i] if np.ndim(a) >= 1 and np.shape(a)[0] == status.size
            else a, params)

    blobs = {}
    n = nlp.n
    for i in idx:
        p_i = lane_params(int(i))
        x_i = jnp.asarray(xs[i])
        jac_cache = nlp_mod.linear_jacobians(nlp, n, p_i, x_i.dtype)
        m = nlp_mod.convexify(nlp, x_i, p_i, jac_cache)
        for field in ("P", "q", "c0", "A_cost", "b_cost", "w_cost",
                      "A_cnt", "b_cnt", "l_cnt", "u_cnt"):
            blobs[f"lane{i}_{field}"] = np.asarray(getattr(m, field))
        blobs[f"lane{i}_x"] = xs[i]
        blobs[f"lane{i}_status"] = status[i]
        blobs[f"lane{i}_merit_coeffs"] = np.asarray(
            np.atleast_2d(np.asarray(result.merit_coeffs))[i])
    blobs["failed_lanes"] = idx
    np.savez_compressed(path, **blobs)
    return int(idx.size)
