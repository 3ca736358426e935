"""Phase interleaving without transposes.

``jnp.stack(phases, axis+1).reshape(...)`` — the natural way to interleave
polyphase outputs (bicubic upsampling, pyrUp, pixel shuffle) — lowers on
TPU to a transpose whose minor dimensions are tiny (the phase count and the
channel count). The (8, 128) tile layout pads such temps 10-40x, which at
print-grade image sizes turns a 450 MB interleave into a 19 GB allocation.

``lax.pad`` with *interior* padding is the native XLA dilation op: each
phase is zero-stuffed directly into its strided positions and the phases
are summed — no transpose, no layout change, fuses with the producer.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["interleave_axis"]


def interleave_axis(parts: Sequence[jax.Array], axis: int, out_n: int | None = None) -> jax.Array:
    """Interleave equal-shaped arrays along ``axis``:
    ``out[..., s*i + p, ...] = parts[p][..., i, ...]``.

    ``out_n`` optionally truncates the result along ``axis``.
    """
    s = len(parts)
    if s == 1:
        x = parts[0]
        return x if out_n is None else _trim(x, axis, out_n)
    n = parts[0].shape[axis]
    full = s * n
    acc = None
    zero = jnp.zeros((), parts[0].dtype)
    for p, part in enumerate(parts):
        cfg = [(0, 0, 0)] * part.ndim
        # lo = p, interior = s-1, hi fills the remainder so total = s*n
        lo = p
        hi = full - (n + (n - 1) * (s - 1)) - lo
        cfg[axis] = (lo, hi, s - 1)
        stuffed = jax.lax.pad(part, zero, cfg)
        acc = stuffed if acc is None else acc + stuffed
    return acc if out_n is None else _trim(acc, axis, out_n)


def _trim(x: jax.Array, axis: int, out_n: int) -> jax.Array:
    if x.shape[axis] == out_n:
        return x
    starts = [0] * x.ndim
    limits = list(x.shape)
    limits[axis] = out_n
    return jax.lax.slice(x, starts, limits)
