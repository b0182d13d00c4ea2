"""Persistent XLA compilation cache for production entry points.

A cold progressive run pays dozens of jit compiles (≈25 s of a 40 s scene
bootstrap is compilation; through a remote-compile tunnel it can be
minutes).  The test suite already amortizes via
``JAX_COMPILATION_CACHE_DIR`` (tests/conftest.py); this helper gives the
CLI/tools the same behavior by default while respecting an explicit env
override.  Second runs of the same configuration then start in seconds.
"""

from __future__ import annotations

import os


def enable_persistent_compilation_cache(path: str | None = None) -> str:
    """Point jax at a persistent on-disk compilation cache.

    Priority: explicit ``path`` arg > ``JAX_COMPILATION_CACHE_DIR`` env >
    ``~/.cache/text2nerf_tpu/jax``.  Safe to call before or after jax
    import; returns the chosen path."""
    import jax

    path = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/text2nerf_tpu/jax")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took meaningful time to compile
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
