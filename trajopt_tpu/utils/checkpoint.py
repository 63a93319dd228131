"""Checkpoint / resume for solver results and warm starts.

The reference has no checkpointing (SURVEY.md par. 5); its closest analogs
are GIVEN_TRAJ warm starts and QP warm starts.  Because our solver state
and results are pytrees, checkpointing is npz serialization + a GIVEN_TRAJ
restart — batched MPC runs resume mid-stream.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from trajopt_tpu.sqp.solver import SQPResult


def save_result(path: str, result: SQPResult, extra: dict | None = None):
    data = {f"result__{k}": np.asarray(v)
            for k, v in result._asdict().items()}
    for k, v in (extra or {}).items():
        data[f"extra__{k}"] = np.asarray(v)
    np.savez_compressed(path, **data)


def load_result(path: str) -> tuple[SQPResult, dict]:
    z = np.load(path)
    fields = {k.split("__", 1)[1]: z[k] for k in z.files
              if k.startswith("result__")}
    extra = {k.split("__", 1)[1]: z[k] for k in z.files
             if k.startswith("extra__")}
    return SQPResult(**{f: fields[f] for f in SQPResult._fields}), extra


def save_trajectories(path: str, trajs, params: Any = None):
    data = {"trajs": np.asarray(trajs)}
    if params is not None:
        for k, v in params.items():
            data[f"param__{k}"] = np.asarray(v)
    np.savez_compressed(path, **data)


def load_trajectories(path: str):
    z = np.load(path)
    params = {k.split("__", 1)[1]: z[k] for k in z.files
              if k.startswith("param__")}
    return z["trajs"], params
