"""Test harness config: run on a virtual 8-device CPU mesh with f64 enabled.

The container's sitecustomize registers the axon TPU backend before user
code runs and pins JAX_PLATFORMS=axon, so env vars alone don't switch the
platform; `jax.config.update('jax_platforms', 'cpu')` does.  Multi-chip
sharding is validated on `xla_force_host_platform_device_count=8` CPU
devices (no multi-chip TPU hardware in CI); the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the e2e solver tests are compile-dominated;
# repeat runs reuse executables.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
