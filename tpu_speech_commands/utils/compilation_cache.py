"""Persistent XLA compilation cache.

First compiles through the TPU tunnel cost minutes; enabling JAX's
persistent compilation cache makes every subsequent process start warm.
Called by the CLIs (train/eval/listen/bench) — not at library import, so
embedding applications keep control.
"""
from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    # Honor JAX_PLATFORMS here too: the axon TPU plugin ignores the env
    # var, so CLIs invoked with JAX_PLATFORMS=cpu (tests, CPU-only boxes)
    # must apply it via the config knob before first device use.
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        try:
            jax.config.update("jax_platforms", platforms)
        except Exception:
            pass  # backend already initialised; leave it be

    cache_dir = cache_dir or os.environ.get(
        "TSC_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tsc_jax_cache"),
    )
    if cache_dir.lower() in ("0", "off", "none"):
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a hard dependency
