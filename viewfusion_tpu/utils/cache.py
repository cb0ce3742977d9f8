"""Persistent XLA compilation cache.

The flagship UNet train step takes minutes to compile on TPU; caching
compiled executables on disk makes every subsequent process start in
seconds.  (No reference equivalent — torch eager has no compile step.)
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(path: str = "~/.cache/viewfusion_tpu/xla") -> None:
    import jax

    cache_dir = os.path.expanduser(path)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except AttributeError:  # older jax without these flags
        pass
