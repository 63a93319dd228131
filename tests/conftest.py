"""Test harness config: run on a virtual 8-device CPU mesh with f64 enabled.

The container's sitecustomize registers the axon TPU backend before user
code runs and pins JAX_PLATFORMS=axon, so env vars alone don't switch the
platform; `jax.config.update('jax_platforms', 'cpu')` does.  Multi-chip
sharding is validated on `xla_force_host_platform_device_count=8` CPU
devices (no multi-chip TPU hardware in CI); the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

# Raise the stack soft-limit BEFORE jax spawns its compile thread pool:
# XLA:CPU's LLVM ISel recurses deeply on the largest solver programs
# (PR2-fixture cast convexify) and overflows the default 8 MB thread
# stacks — observed as "LLVM compilation error: Cannot allocate memory"
# bursts followed by SIGSEGV inside backend_compile_and_load.  Thread
# stacks inherit the soft limit at creation time.
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        resource.setrlimit(resource.RLIMIT_STACK,
                           (_want if _hard == resource.RLIM_INFINITY
                            else min(_want, _hard), _hard))
except Exception:
    pass

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # Cap XLA:CPU codegen at AVX512: parts of the heterogeneous CI fleet
    # lack the AMX feature set this jaxlib was built against (cpu_aot_loader
    # prints feature-mismatch warnings and runs SIGILL/SIGSEGV — observed
    # crashing the suite mid-run in round 1).
    flags = (flags + " --xla_cpu_max_isa=AVX512").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NO persistent compilation cache on CPU: XLA:CPU AOT executable
# serialization itself SIGSEGVs on parts of the heterogeneous CI fleet
# (jaxlib built for different host CPU features — crashes observed in
# both cache reads of stale entries AND cache writes, round 1).  The
# TPU bench keeps its cache (bench.py): TPU executables are compiled
# by the remote axon service and are host-independent.
# Opt back in explicitly with JAX_CACHE_DIR when the host is trusted.
if os.environ.get("JAX_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
