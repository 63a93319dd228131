"""Multi-chip scaling: shard batched solves over a device mesh.

The reference's parallelism is OpenMP term-parallelism inside one solve
(``optimizers.cpp:261-339``); the TPU-native equivalent (SURVEY.md par. 2.8)
is *data parallelism over independent problems*: the batch dimension of a
vmapped solver is sharded over a ``jax.sharding.Mesh`` and XLA inserts no
communication for the solves themselves — collectives only aggregate
metrics (psum of converged counts), which rides ICI.

Works identically on a real pod slice and on the virtual
``xla_force_host_platform_device_count`` CPU mesh used in tests.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from trajopt_tpu.problem.trajectory import TrajOptProblem
from trajopt_tpu.sqp.params import SQPParams, SQPStatus


def data_parallel_mesh(devices=None, axis: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_sharded_batch_solver(prob: TrajOptProblem, mesh: Mesh,
                              sqp: SQPParams = SQPParams(), axis: str = "dp",
                              structured: bool = True):
    """Returns solve(inits [B,T,D], params pytree batched on axis 0) ->
    SQPResult sharded over the mesh.  B must divide by the mesh size."""
    solve = prob.make_solve(sqp, structured=structured)
    vsolve = jax.vmap(lambda init, params: solve(init, params))
    shard = NamedSharding(mesh, P(axis))

    def put(tree):
        return jax.tree.map(lambda a: jax.device_put(a, shard), tree)

    jitted = jax.jit(vsolve, out_shardings=shard)

    def sharded_solve(inits, params: Any):
        return jitted(put(inits), put(params))

    return sharded_solve


def summarize(result) -> dict:
    """Host-side metrics: converged fraction, iteration stats (the
    per-problem analog of OptResults counters, optimizers.hpp:40-59)."""
    status = np.asarray(result.status)
    return {
        "n": int(status.size),
        "converged": int((status == SQPStatus.CONVERGED).sum()),
        "converged_frac": float((status == SQPStatus.CONVERGED).mean()),
        "mean_iter": float(np.asarray(result.n_iter).mean()),
        "mean_qp_solves": float(np.asarray(result.n_qp_solves).mean()),
        "max_cnt_viol": float(np.asarray(result.cnt_viols).max(initial=0.0)),
    }
