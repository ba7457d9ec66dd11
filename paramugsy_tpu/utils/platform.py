"""Backend selection with graceful fallback.

The single TPU chip admits one client process at a time; when another
process holds it (or no accelerator exists), fall back to CPU instead of
crashing.  Must be called before any JAX computation dispatches.
"""
from __future__ import annotations

import sys


def ensure_backend(verbose: bool = True) -> str:
    import jax

    try:
        jax.devices()
        return jax.default_backend()
    except RuntimeError as e:
        if verbose:
            print(
                f"accelerator unavailable ({e}); falling back to CPU",
                file=sys.stderr,
            )
        jax.config.update("jax_platforms", "cpu")
        jax.devices()
        return "cpu"
