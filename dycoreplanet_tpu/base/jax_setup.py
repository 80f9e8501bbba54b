"""Process-level JAX configuration.

Persistent XLA compilation caching: on the tunneled TPU platform a cold
executable costs minutes of server-side warmup per process; with the
on-disk cache the second process deserializes in seconds. Called by the
CLI, bench.py, and the driver entry points (no-op if already enabled).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "dycoreplanet_tpu", "xla")


def enable_compilation_cache(path: str | None = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent)."""
    import jax

    cache_dir = (path or os.environ.get("DYCOREPLANET_XLA_CACHE")
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or _DEFAULT_DIR)
    # key by backend: entries AOT-compiled for one platform (or another
    # host's CPU feature set, via the tunnel) must not be deserialized
    # on a different one. For the plain CPU backend skip caching
    # entirely: local compiles are fast, and tunnel-written CPU AOT
    # entries carry the remote host's ISA features (SIGILL hazard).
    try:
        backend = jax.default_backend()
    except RuntimeError:
        backend = "unknown"
    if backend == "cpu":
        return ""
    cache_dir = os.path.join(cache_dir, backend)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every executable: on high-latency platforms even small
    # programs cost seconds to materialize
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return cache_dir
