"""Tile extraction / merge as XLA array programs.

TPU-native replacement for the reference's per-tile numpy slicing and
python-loop weighted merge (reference: tiling_module.py:671-784
`split_image` tile extraction; :1074-1135 `merge_tiles`). Tiles live as one
HBM-resident batch ``[N, block, block, C]``; extraction is a vmapped
`dynamic_slice` over (possibly traced) positions and the merge is a
`lax.scan` of dynamic-slice-accumulate steps over a float32 canvas with
weight-sum normalization — identical math to the reference's
``accumulate(tile*w) / accumulate(w)`` but with static shapes throughout.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tiling.geometry import TileLayout

__all__ = [
    "pad_image",
    "unpad_image",
    "extract_tiles",
    "merge_tiles",
]

_PAD_MODES = {
    # reference PaddingMode (tiling_module.py:40, 543-568):
    # mirror = BORDER_REFLECT_101 = jnp 'reflect' (edge not repeated)
    "mirror": "reflect",
    "reflect": "symmetric",  # BORDER_REFLECT (edge repeated)
    "replicate": "edge",
    "constant": "constant",
}


def pad_image(
    image: jax.Array,
    layout: TileLayout,
    mode: str = "mirror",
    constant_value: float = 0.0,
) -> jax.Array:
    """Pad (H, W, C) image to the layout's full grid extent."""
    ph = layout.padded_h - layout.image_h
    pw = layout.padded_w - layout.image_w
    if ph == 0 and pw == 0:
        return image
    jmode = _PAD_MODES[mode]
    kwargs = {"constant_values": constant_value} if jmode == "constant" else {}
    return jnp.pad(image, ((0, ph), (0, pw), (0, 0)), mode=jmode, **kwargs)


def unpad_image(canvas: jax.Array, layout: TileLayout) -> jax.Array:
    """Crop a padded-extent canvas back to the true image size."""
    return canvas[: layout.image_h, : layout.image_w]


@partial(jax.jit, static_argnames=("block",))
def _extract(padded: jax.Array, positions: jax.Array, block: int) -> jax.Array:
    c = padded.shape[-1]

    def one(pos):
        return jax.lax.dynamic_slice(padded, (pos[0], pos[1], 0), (block, block, c))

    return jax.vmap(one)(positions)


def extract_tiles(
    padded: jax.Array, layout: TileLayout, positions: jax.Array | None = None
) -> jax.Array:
    """Extract the full-block tile batch [N, block, block, C].

    ``positions`` defaults to the layout grid but may be a traced array
    (content-aware layouts move tile origins at runtime).
    """
    if positions is None:
        positions = jnp.asarray(layout.positions)
    return _extract(padded, positions, layout.block)


@partial(jax.jit, static_argnames=("padded_h", "padded_w", "eps", "premultiplied"))
def _merge(
    tiles: jax.Array,
    weights: jax.Array,
    positions: jax.Array,
    padded_h: int,
    padded_w: int,
    eps: float = 1e-8,
    premultiplied: bool = False,
) -> jax.Array:
    n, b, _, c = tiles.shape
    canvas = jnp.zeros((padded_h, padded_w, c), jnp.float32)
    wsum = jnp.zeros((padded_h, padded_w, 1), jnp.float32)

    def step(carry, inp):
        canvas, wsum = carry
        tile, w, pos = inp
        w3 = w[..., None]
        contrib = tile.astype(jnp.float32) if premultiplied else tile.astype(jnp.float32) * w3
        patch = jax.lax.dynamic_slice(canvas, (pos[0], pos[1], 0), (b, b, c))
        canvas = jax.lax.dynamic_update_slice(
            canvas, patch + contrib, (pos[0], pos[1], 0)
        )
        wpatch = jax.lax.dynamic_slice(wsum, (pos[0], pos[1], 0), (b, b, 1))
        wsum = jax.lax.dynamic_update_slice(wsum, wpatch + w3, (pos[0], pos[1], 0))
        return (canvas, wsum), None

    (canvas, wsum), _ = jax.lax.scan(step, (canvas, wsum), (tiles, weights, positions))
    return canvas / jnp.maximum(wsum, eps)


def merge_tiles(
    tiles: jax.Array,
    weights: jax.Array | np.ndarray,
    layout: TileLayout,
    positions: jax.Array | None = None,
    premultiplied: bool = False,
) -> jax.Array:
    """Weighted-accumulate merge into a normalized float32 canvas.

    Math parity with reference tiling_module.py:1074-1135 (`merge_tiles`):
    ``sum(tile*w) / max(sum(w), eps)`` over the padded canvas. With
    ``premultiplied=True`` the tiles are assumed already weighted (the
    Laplacian-fusion path, where weighting happens per pyramid level) and
    only the denominator uses ``weights``. Call :func:`unpad_image`
    afterwards to crop to the true image.
    """
    if positions is None:
        positions = jnp.asarray(layout.positions)
    weights = jnp.asarray(weights)
    return _merge(
        tiles, weights, positions, layout.padded_h, layout.padded_w,
        premultiplied=premultiplied,
    )
