"""Profiling hooks: JAX profiler traces + solve-counter reporting.

The reference's tracing story is the per-iteration merit table + CSV logs
+ Google Benchmark (SURVEY.md par. 5); the TPU-native addition is the XLA
profiler, wrapped here so `with trace("/tmp/tb"): solve(...)` produces a
TensorBoard-loadable device trace.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def solve_counters(result) -> dict:
    """The OptResults counters (n_func_evals, n_qp_solves,
    optimizers.hpp:47) aggregated over a batch."""
    return {
        "n_func_evals": int(np.asarray(result.n_func_evals).sum()),
        "n_qp_solves": int(np.asarray(result.n_qp_solves).sum()),
        "mean_sqp_iter": float(np.asarray(result.n_iter).mean()),
    }


class Timer:
    """Wall-clock scope timer that forces device completion (the clock
    utility of trajopt_common, TPU-aware)."""

    def __init__(self):
        self.elapsed = None
        self._result = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def observe(self, pytree):
        self._result = pytree
        return pytree

    def __exit__(self, *exc):
        if self._result is not None:
            jax.block_until_ready(self._result)
            leaves = jax.tree_util.tree_leaves(self._result)
            if leaves:
                np.asarray(leaves[0])
        self.elapsed = time.perf_counter() - self._t0
        return False


def machine_cache_dir(name: str) -> str:
    """A per-CPU-model persistent-compilation-cache path.

    XLA:CPU AOT executables embed host CPU features; loading one compiled
    on a different machine model SIGSEGVs (observed on the heterogeneous
    CI fleet).  Keying the cache dir by a fingerprint of the CPU flags
    makes stale entries unreachable instead of fatal.
    """
    import hashlib
    import tempfile

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    import platform

    fp = hashlib.sha1(
        (platform.machine() + flags).encode()).hexdigest()[:12]
    # Include the UID: a world-shared tempdir path keyed only by CPU flags
    # could be owned by another user on shared CI hosts, making cache
    # writes fail or entries unreadable.
    try:
        uid = os.getuid()
    except AttributeError:  # non-POSIX
        uid = 0
    return f"{tempfile.gettempdir()}/{name}_u{uid}_{fp}"
