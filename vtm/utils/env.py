"""Process/JAX environment setup (reference analog: slowfast/utils/env.py).

Every driver calls :func:`setup_environment` first. The big win on this
stack is the persistent compilation cache: remote TPU compiles cost
~40s per distinct layer shape, and a ToMe model has a different token
count at every layer."""

from __future__ import annotations

import os

_DONE = False


def setup_environment(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "VTM_COMPILATION_CACHE", os.path.expanduser("~/.cache/jax_comp_cache")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs — run uncached
    _DONE = True
