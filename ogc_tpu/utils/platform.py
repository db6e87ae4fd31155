"""Platform selection helper.

The runtime environment's sitecustomize registers the TPU backend and pins
JAX_PLATFORMS, so scripts honor an OGC_PLATFORM env var (e.g. "cpu") applied
through jax.config — used by CI/tests to run the CLIs off-TPU."""

import os


def apply_platform_env() -> None:
    plat = os.environ.get("OGC_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
        if plat == "cpu":
            # CPU executables serialize: share compiles across processes
            # (e.g. the CLI test subprocesses).
            jax.config.update("jax_compilation_cache_dir", "/tmp/ogc_jax_cache")
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5
            )
