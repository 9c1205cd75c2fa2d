"""Persistent XLA compilation cache.

Compiles are expensive in this environment (single host CPU; TPU compiles go
through a remote-compile tunnel), so every entry point opts into JAX's
persistent cache keyed under ~/.cache/uavdet_jax (override with
UAVDET_JAX_CACHE).
"""

import os

import jax

_enabled = False


def enable_compilation_cache():
    """Also honors UAVDET_PLATFORM (e.g. 'cpu') — the environment here
    force-injects JAX_PLATFORMS=axon, so a plain env override is not
    reliable; this config update (pre-backend-init) is."""
    global _enabled
    if _enabled:
        return
    plat = os.environ.get("UAVDET_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    path = os.environ.get(
        "UAVDET_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "uavdet_jax"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _enabled = True
    except Exception:
        pass
