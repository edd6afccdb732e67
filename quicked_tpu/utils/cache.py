"""Persistent XLA compilation cache helper.

The kernels are scan-heavy; cold compiles are tens of seconds. Callers
on the production path (CLI, bench) enable a persistent cache so
repeated shapes hit disk instead of recompiling.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "QUICKED_TPU_CACHE",
        os.path.expanduser("~/.cache/quicked_tpu_jax"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
