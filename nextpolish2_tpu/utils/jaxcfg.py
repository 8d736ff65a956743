"""JAX runtime configuration helpers."""

from __future__ import annotations

import os

_CONFIGURED = False


def configure_jax(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (compiles here cost 60s+ on the
    tunneled TPU; pay once per shape, ever)."""
    global _CONFIGURED
    if _CONFIGURED:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "NP2_JAX_CACHE", os.path.expanduser("~/.cache/nextpolish2_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _CONFIGURED = True


def bucket(n: int, step: int) -> int:
    """Round n up to a multiple of step (shape bucketing to cache compiles)."""
    return ((n + step - 1) // step) * step


def bucket_pow2(n: int, floor: int = 1024) -> int:
    """Round n up to the next power of two, at least floor."""
    v = floor
    while v < n:
        v *= 2
    return v
