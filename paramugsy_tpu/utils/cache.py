"""Persistent XLA compilation cache.

Compiles of the big seeding graphs cost minutes on the TPU toolchain;
the persistent cache makes every shape a one-time cost per machine.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "PARAMUGSY_JAX_CACHE", os.path.expanduser("~/.cache/paramugsy_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
