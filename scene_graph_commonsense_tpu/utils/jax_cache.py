"""Persistent XLA compilation cache for CLI/tool entry points.

First compile of the 1024-squared DETR programs takes minutes; every CLI
tool (main.py, bench.py, tools/*) used to pay it on every invocation.
`enable_compile_cache()` points JAX at a persistent on-disk cache so only
the first run compiles.  The test suite has its own cache dir
(tests/conftest.py); this one is for the real entry points.

Respects an explicit JAX_COMPILATION_CACHE_DIR / jax_compilation_cache_dir
if the user already set one.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    """Idempotent; returns the cache dir in effect."""
    import jax

    current = jax.config.jax_compilation_cache_dir \
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if current:
        return current
    if path is None:
        path = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "sgc_tpu_jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return path
