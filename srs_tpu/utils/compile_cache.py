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
        # Threshold 0.05 s (was 1.0): catches the handful of mid-size CPU
        # test programs on top of the big TPU ones. Note the CPU suite's
        # wall-time floor is NOT cacheable either way — it is thousands of
        # ~50 ms *eager-op* compiles at distinct shapes (measured: one
        # 4-level pyramid chain = ~80 eager ops, 4.1 s first call, 0.01 s
        # warm in-process), each individually below any useful disk-cache
        # payoff.
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ.get("SRS_XLA_CACHE_MIN_SECS", "0.05")),
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:
        pass
