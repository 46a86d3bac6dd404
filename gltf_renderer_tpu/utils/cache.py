"""Persistent XLA compilation cache.

Remote TPU compiles through the tunnel cost 10-300 s per big graph (the r1
bench spent 96-474 s in setup); the persistent cache cuts repeat runs to
sub-second loads and works through the axon backend (measured 4.9 s -> 0.7 s
across processes). Called from every entry point (CLI, bench, driver entry,
tools) before the first jit.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/gltf_renderer_tpu/xla")
_enabled = False


def enable_compilation_cache(path: str = "") -> None:
    """Idempotently enable the on-disk compilation cache."""
    global _enabled
    if _enabled:
        return
    import jax

    cache_dir = path or os.environ.get("GLTF_TPU_COMPILE_CACHE", _DEFAULT_DIR)
    if cache_dir.lower() in ("0", "off", "none"):
        return
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
