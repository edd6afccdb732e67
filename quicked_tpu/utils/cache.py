"""Persistent XLA compilation cache helper.

The kernels are scan-heavy; cold compiles are tens of seconds. Callers
on the production path (CLI, bench) enable a persistent cache so
repeated shapes hit disk instead of recompiling.

The cache directory is scoped by a machine fingerprint (ISA flags +
arch): CPU AOT cache entries embed machine features, and a cache
populated on one machine class sprays `cpu_aot_loader` feature-mismatch
errors over every run on another (the repo directory outlives any one
host). Each machine class gets its own subdirectory instead.
"""

from __future__ import annotations

import hashlib
import os
import platform


def machine_tag() -> str:
    """Short fingerprint of this machine class (arch + CPU flags)."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line.strip()
                    break
    except OSError:
        pass
    key = f"{platform.machine()}|{feats}"
    return hashlib.sha1(key.encode()).hexdigest()[:10]


def enable_compile_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "QUICKED_TPU_CACHE",
        os.path.expanduser("~/.cache/quicked_tpu_jax"))
    cache_dir = os.path.join(cache_dir, machine_tag())
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
