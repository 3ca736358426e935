"""Phase interleaving along interior axes.

Interleaving polyphase outputs (bicubic upsampling, pyrUp) is a layout
minefield on TPU. Measured on v5e:

- ``jnp.stack(phases, axis+1).reshape(...)`` with ``axis`` an interior
  (non-minor) dimension: sub-millisecond at 100 MP scale — the stacked
  axis merges with its neighbor without touching the (8, 128)-tiled minor
  dims, and XLA fuses it.
- ``lax.pad`` with interior padding: compiles, but *executes* at
  ~30 MB/s on the lane (W) axis — and a bare W-axis interior pad does not
  even compile at print-grade sizes (compile-helper OOM).
- einops-style rearranges whose intermediates put the phase/channel
  counts in the minor dims: padded 10-80x, multi-GB temps.

So: stack+reshape, with the requirement that ``axis`` is not one of the
last two dimensions' minor positions in practice (our callers interleave
H or W of (..., H, W, C) arrays — the stacked axis always merges upward).
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
    stacked = jnp.stack(parts, axis=axis + 1)
    shape = list(parts[0].shape)
    shape[axis] = shape[axis] * s
    x = stacked.reshape(shape)
    return x if out_n is None else _trim(x, axis, out_n)


def _trim(x: jax.Array, axis: int, out_n: int) -> jax.Array:
    if x.shape[axis] == out_n:
        return x
    starts = [0] * x.ndim
    limits = list(x.shape)
    limits[axis] = out_n
    return jax.lax.slice(x, starts, limits)
