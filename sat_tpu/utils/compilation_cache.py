"""Persistent XLA compilation cache.

First TPU compiles through the tunneled backend cost 10-40s; enabling JAX's
persistent cache makes every CLI invocation after the first reuse compiled
executables from disk. Called by train.py / bench.py / caption CLIs; safe
to call multiple times and on CPU.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SAT_COMPILATION_CACHE", os.path.expanduser("~/.cache/sat_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # never let caching break a run
        print(f"compilation cache disabled: {e}")
