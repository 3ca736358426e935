"""Color-consistency correction kernels.

Parity ports of the reference's color correction suite (reference:
blending_module.py:969-1146): 256-bin histogram CDF matching, mean-std
matching, and the box-filter guided filter (He et al. 2013). The histogram
LUT is built with the same argmin-over-CDF rule as the reference; the
histogram itself is a one-hot scatter-add (static 256 bins, TPU-friendly).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .filters import box_blur

__all__ = ["histogram_matching", "mean_std_matching", "guided_filter", "color_correction"]


def _cdf256(channel: jax.Array) -> jax.Array:
    """Normalized-to-255 CDF of a [0,255] float channel, 256 bins."""
    idx = jnp.clip(channel.astype(jnp.int32), 0, 255).reshape(-1)
    hist = jnp.zeros((256,), jnp.float32).at[idx].add(1.0)
    cdf = jnp.cumsum(hist)
    return cdf / cdf[-1] * 255.0


@jax.jit
def histogram_matching(source: jax.Array, reference: jax.Array) -> jax.Array:
    """Per-channel histogram matching (reference: blending:1019-1066).

    LUT[i] = argmin_j |ref_cdf[j] - src_cdf[i]|, applied to the
    uint8-quantized source. Returns float32 in [0, 255].
    """
    src = source.astype(jnp.float32)
    ref = reference.astype(jnp.float32)

    def one_channel(s, r):
        scdf = _cdf256(s)
        rcdf = _cdf256(r)
        lut = jnp.argmin(jnp.abs(rcdf[None, :] - scdf[:, None]), axis=1).astype(jnp.float32)
        return lut[jnp.clip(s.astype(jnp.int32), 0, 255)]

    if src.ndim == 2:
        return one_channel(src, ref)
    chans = [one_channel(src[..., c], ref[..., c]) for c in range(src.shape[-1])]
    return jnp.stack(chans, axis=-1)


@jax.jit
def mean_std_matching(source: jax.Array, reference: jax.Array) -> jax.Array:
    """(src - mu_s) * sigma_r / (sigma_s + 1e-6) + mu_r per channel
    (reference: blending:1068-1090)."""
    src = source.astype(jnp.float32)
    ref = reference.astype(jnp.float32)
    axes = tuple(range(src.ndim - 1)) if src.ndim == 3 else tuple(range(src.ndim))
    sm = jnp.mean(src, axis=axes)
    ss = jnp.std(src, axis=axes)
    rm = jnp.mean(ref, axis=axes)
    rs = jnp.std(ref, axis=axes)
    return (src - sm) * (rs / (ss + 1e-6)) + rm


@partial(jax.jit, static_argnames=("radius",))
def guided_filter(
    guide: jax.Array, src: jax.Array, radius: int = 8, eps: float = 0.01
) -> jax.Array:
    """Box-filter guided filter (reference: blending:1108-1146): the
    cv2.blur chain as cumulative box blurs on (H, W[, C]) arrays."""
    g = guide.astype(jnp.float32)
    s = src.astype(jnp.float32)
    if g.ndim == 3:
        gm = jnp.moveaxis(g, -1, 0)
        sm = jnp.moveaxis(s, -1, 0)
    else:
        gm, sm = g[None], s[None]
    blur = lambda a: box_blur(a, radius)
    mean_g = blur(gm)
    mean_s = blur(sm)
    cov = blur(gm * sm) - mean_g * mean_s
    var = blur(gm * gm) - mean_g * mean_g
    a = cov / (var + eps)
    b = mean_s - a * mean_g
    out = blur(a) * gm + blur(b)
    return jnp.moveaxis(out, 0, -1) if g.ndim == 3 else out[0]


def color_correction(
    image: jax.Array,
    reference_tile: jax.Array,
    method: str = "histogram",
    local_filter: bool = True,
) -> jax.Array:
    """Full correction pipeline (reference: blending:969-1017): match to
    the reference tile, optionally guided-filter against the original,
    clip to [0, 255]."""
    img = jnp.asarray(image, jnp.float32)
    if method == "none":
        return img
    if method == "histogram":
        corrected = histogram_matching(img, reference_tile)
    elif method == "mean_std":
        corrected = mean_std_matching(img, reference_tile)
    else:
        corrected = img
    if local_filter:
        corrected = guided_filter(corrected, img, radius=8, eps=0.01)
    return jnp.clip(corrected, 0.0, 255.0)
