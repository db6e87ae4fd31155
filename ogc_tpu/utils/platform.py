"""Platform selection helper.

The runtime environment's sitecustomize registers the TPU backend and pins
JAX_PLATFORMS, so scripts honor an OGC_PLATFORM env var (e.g. "cpu") applied
through jax.config — used by CI/tests to run the CLIs off-TPU."""

import hashlib
import os


def cpu_cache_dir() -> str:
    """Persistent-compile-cache dir keyed by the host's CPU feature set.

    CPU executables are AOT-compiled for the build host's machine features;
    reusing them on a host with different features makes the loader warn
    about (and risk) SIGILL. Key the cache by a hash of /proc/cpuinfo flags
    so each machine type gets its own cache."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(
                (ln for ln in f if ln.startswith("flags")), ""
            )
    except OSError:
        flags = ""
    tag = hashlib.sha1(flags.encode()).hexdigest()[:8]
    return f"/tmp/ogc_jax_cache_{tag}"


def apply_platform_env() -> None:
    plat = os.environ.get("OGC_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
        if plat == "cpu":
            # CPU executables serialize: share compiles across processes
            # (e.g. the CLI test subprocesses).
            jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5
            )
    elif any(
        t in os.environ.get("JAX_PLATFORMS", "") for t in ("tpu", "axon")
    ):
        # TPU path (sitecustomize pins JAX_PLATFORMS=axon): persist
        # compiles across CLI invocations — fresh compiles through the
        # remote compile helper are the dominant cost of every on-chip run
        # (~20-40 min smokes), and bench.py already shares this cache.
        # Gated on the env pin, NOT jax.default_backend(): querying the
        # backend here would initialize it (hangs CLI startup when the
        # relay is down), and an unset JAX_PLATFORMS means a plain CPU
        # host, where this unkeyed cache dir would risk the cross-machine
        # SIGILL documented on cpu_cache_dir.
        import jax

        try:
            jax.config.update(
                "jax_compilation_cache_dir", "/root/.jax_cache"
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5
            )
        except Exception:
            pass  # older jax without the persistent-cache config
