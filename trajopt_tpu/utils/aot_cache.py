"""AOT export cache: skip re-TRACING of the big solver programs.

The cast flagship's cold start is trace (~28-49 s: the Python/JAX staging
of the nested-while SQP program) + XLA compile (~75 s at the remote
service).  The persistent compilation cache (jax_compilation_cache_dir)
already removes the XLA part on a warm machine; this module removes the
trace part by serializing the traced program (StableHLO via
``jax.export``) to disk, keyed by a content hash of the package source +
config + input shapes.  A fresh process then does: deserialize (<1 s) +
compile-cache load (~19 s) instead of 28-49 s of tracing — the
"cold means deserialize" design the round-4 review asked for
(reference analog: online replanning via stepSQPSolver,
trust_region_sqp_solver.h:57, needs fast cold starts).

Artifacts are invalidated automatically when any ``trajopt_tpu`` source
file, the key string (solver params), the jax version, or the input
shapes change.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Callable

import jax


def _source_hash() -> str:
    """Content hash of every .py file in the trajopt_tpu package (stale
    artifacts must never survive a code change)."""
    import trajopt_tpu

    root = os.path.dirname(os.path.abspath(trajopt_tpu.__file__))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                p = os.path.join(dirpath, fn)
                h.update(p.encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    return h.hexdigest()[:16]


def _abstract(args):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jax.numpy.shape(a),
                                       jax.numpy.asarray(a).dtype), args)


_NAMEDTUPLES_REGISTERED = False


def _register_namedtuples():
    """Register the solver's namedtuple result types for pytree
    serialization (required by jax.export)."""
    global _NAMEDTUPLES_REGISTERED
    if _NAMEDTUPLES_REGISTERED:
        return
    from jax import export as jexport

    from trajopt_tpu.qp.admm import ADMMResult
    from trajopt_tpu.sqp.solver import SQPResult

    for t in (SQPResult, ADMMResult):
        try:
            jexport.register_namedtuple_serialization(
                t, serialized_name=f"trajopt_tpu.{t.__name__}")
        except ValueError:
            pass  # already registered
    _NAMEDTUPLES_REGISTERED = True


def cached_export(fn: Callable, example_args: tuple, key: str,
                  cache_dir: str | None = None, verbose: bool = False):
    """Return a callable equivalent to ``jax.jit(fn)`` specialized to
    ``example_args``'s shapes, loading the traced program from disk when
    a fresh artifact exists (else tracing + exporting one).

    The returned callable still goes through XLA compilation on first
    call (served by the persistent compilation cache when warm)."""
    from jax import export as jexport

    _register_namedtuples()
    if cache_dir is None:
        from trajopt_tpu.utils.profiling import machine_cache_dir

        cache_dir = machine_cache_dir("aot_cache")
    os.makedirs(cache_dir, exist_ok=True)
    shapes = str(jax.tree.map(lambda a: (jax.numpy.shape(a),
                                         str(jax.numpy.asarray(a).dtype)),
                              example_args))
    plat = jax.devices()[0].platform
    ident = hashlib.sha256(
        "|".join([key, shapes, jax.__version__, plat,
                  _source_hash()]).encode()).hexdigest()[:24]
    path = os.path.join(cache_dir, f"{ident}.stablehlo")

    if os.path.exists(path):
        with open(path, "rb") as f:
            exp = jexport.deserialize(bytearray(f.read()))
        if verbose:
            import sys

            print(f"# aot_cache: loaded {path}", file=sys.stderr)
        return jax.jit(exp.call)

    exp = jexport.export(jax.jit(fn))(*_abstract(example_args))
    data = exp.serialize()
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    if verbose:
        import sys

        print(f"# aot_cache: exported {path} ({len(data) >> 20} MiB)",
              file=sys.stderr)
    return jax.jit(exp.call)
