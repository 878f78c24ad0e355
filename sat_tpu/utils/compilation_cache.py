"""Persistent XLA compilation cache.

First TPU compiles through the tunneled backend cost 10-40s; enabling JAX's
persistent cache makes every CLI invocation after the first reuse compiled
executables from disk. Called by train.py / bench.py / caption CLIs; safe
to call multiple times and on CPU.
"""

from __future__ import annotations

import os


def _host_fingerprint() -> str:
    """CPU-feature + jax-version hash. XLA:CPU persists AOT executables
    specialized to the compiling machine's ISA features; loading them on a
    different host machine type warns 'could lead to execution errors such
    as SIGILL' (observed live when this pod migrated hosts). Partitioning
    the cache per fingerprint makes stale cross-host artifacts unreachable."""
    import hashlib

    import jax

    txt = jax.__version__
    try:
        import platform
        txt += platform.machine()
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    txt += line
                    break
    except OSError:
        pass
    return hashlib.sha256(txt.encode()).hexdigest()[:12]


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax

    base = cache_dir or os.environ.get(
        "SAT_COMPILATION_CACHE", os.path.expanduser("~/.cache/sat_tpu_xla"))
    try:
        cache_dir = os.path.join(base, _host_fingerprint())
    except Exception:
        cache_dir = base
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # never let caching break a run
        print(f"compilation cache disabled: {e}")
