"""Persistent XLA compilation cache.

Big-shape programs (print-grade tiles) take minutes to compile on TPU;
the on-disk cache makes every process after the first start instantly.
Replaces nothing in the reference (remote engines had no compile step) —
this is TPU-operational infrastructure.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/srs_tpu/xla_cache")
_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    path = path or os.environ.get("SRS_XLA_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:
        pass
