"""Test configuration: run everything on a virtual 8-device CPU platform so
single-chip kernels and multi-chip sharding are both testable without TPUs.

The environment's sitecustomize registers the TPU backend and forces
JAX_PLATFORMS, so the env var alone is not enough — we must override the
platform through jax.config after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: CPU executables serialize, so repeated graphs
# (across tests AND across the CLI-subprocess tests) compile once. Keyed by
# host CPU features — stale caches from another machine type risk SIGILL.
from ogc_tpu.utils.platform import cpu_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
