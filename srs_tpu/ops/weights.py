"""Blend-weight map construction.

Parity ports of the reference's two weight systems:
- distance-to-edge weight maps with linear/cosine/sigmoid profiles
  (reference: blending_module.py:508-561 `_create_distance_weight_map`),
- per-tile overlap-band linear feather ramps
  (reference: tiling_module.py:1137-1175 `_create_blend_weight`).

Weights are static per (layout, config) so they are computed in numpy once
and become jit-time constants; the per-tile stack is shaped so a single
broadcasted multiply fuses into the blend kernels.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..tiling.geometry import TileLayout

__all__ = [
    "distance_weight_map",
    "overlap_ramp_weight",
    "layout_weights",
    "layout_weight_profiles",
    "profile_pyramid",
]


def distance_weight_map(
    height: int,
    width: int,
    weight_type: str = "cosine",
    feather_width: Optional[int] = None,
) -> np.ndarray:
    """(H, W) float32 weight rising from edges to center.

    Exact parity with reference blending_module.py:508-561:
    dist-to-nearest-edge / feather (default min(h,w)//8) clipped to [0,1],
    then linear / cosine 0.5*(1-cos(pi x)) / sigmoid 1/(1+e^{-10(x-.5)}).
    """
    if feather_width is None:
        feather_width = min(height, width) // 8
    feather_width = max(1, feather_width)
    y = np.arange(height, dtype=np.float32).reshape(-1, 1)
    x = np.arange(width, dtype=np.float32).reshape(1, -1)
    dist = np.minimum(
        np.minimum(y, height - 1 - y), np.minimum(x, width - 1 - x)
    )
    t = np.clip(dist / feather_width, 0.0, 1.0)
    if weight_type == "linear":
        w = t
    elif weight_type == "cosine":
        w = 0.5 * (1.0 - np.cos(np.pi * t))
    elif weight_type == "sigmoid":
        w = 1.0 / (1.0 + np.exp(-10.0 * (t - 0.5)))
    else:
        raise ValueError(f"unknown weight_type {weight_type!r}")
    return w.astype(np.float32)


def overlap_ramp_weight(
    height: int,
    width: int,
    overlap_top: int,
    overlap_bottom: int,
    overlap_left: int,
    overlap_right: int,
) -> np.ndarray:
    """(H, W) float32 linear feather ramps over the overlap bands.

    Parity with reference tiling_module.py:1137-1175: ones, multiplied by
    linspace(0,1) ramps over each nonzero overlap band.
    """
    w = np.ones((height, width), dtype=np.float32)
    if overlap_top > 0:
        w[:overlap_top, :] *= np.linspace(0, 1, overlap_top, dtype=np.float32)[:, None]
    if overlap_bottom > 0:
        w[-overlap_bottom:, :] *= np.linspace(1, 0, overlap_bottom, dtype=np.float32)[:, None]
    if overlap_left > 0:
        w[:, :overlap_left] *= np.linspace(0, 1, overlap_left, dtype=np.float32)[None, :]
    if overlap_right > 0:
        w[:, -overlap_right:] *= np.linspace(1, 0, overlap_right, dtype=np.float32)[None, :]
    return w


def layout_weights(
    layout: TileLayout,
    kind: str = "ramp",
    weight_type: str = "cosine",
    feather_width: Optional[int] = None,
) -> np.ndarray:
    """(N, block, block) float32 per-tile weight stack for a layout.

    ``kind='ramp'`` uses the overlap-band linear ramps (tiling-module
    semantics, exact partition-of-unity inside the valid canvas);
    ``kind='distance'`` uses the distance-to-edge map (blending-module
    semantics, requires weight-sum normalization at merge).
    """
    n, b = layout.num_tiles, layout.block
    out = np.empty((n, b, b), dtype=np.float32)
    if kind == "distance":
        # Feather only on sides that actually overlap a neighbor; outer
        # canvas borders keep full weight (otherwise every contributor is
        # zero there and normalization degenerates — the "weight-sum
        # normalization at shard boundaries" crux from SURVEY §6).
        fw = feather_width if feather_width is not None else max(1, b // 8)
        y = np.arange(b, dtype=np.float32)[:, None]
        x = np.arange(b, dtype=np.float32)[None, :]
        inf = np.float32(1e9)
        cache: dict = {}
        for t in range(n):
            key = tuple(bool(v) for v in layout.overlaps[t])
            if key not in cache:
                top, bottom, left, right = key
                dist = np.minimum(
                    np.minimum(y if top else inf, (b - 1 - y) if bottom else inf),
                    np.minimum(x if left else inf, (b - 1 - x) if right else inf),
                )
                tt = np.clip(dist / fw, 0.0, 1.0)
                if weight_type == "linear":
                    wmap = tt
                elif weight_type == "cosine":
                    wmap = 0.5 * (1.0 - np.cos(np.pi * tt))
                elif weight_type == "sigmoid":
                    wmap = 1.0 / (1.0 + np.exp(-10.0 * (tt - 0.5)))
                else:
                    raise ValueError(f"unknown weight_type {weight_type!r}")
                cache[key] = np.broadcast_to(wmap, (b, b)).astype(np.float32)
            out[t] = cache[key]
        return out
    if kind != "ramp":
        raise ValueError(f"unknown weight kind {kind!r}")
    # Ramp weights depend only on the 4-tuple of overlaps; cache per pattern.
    cache: dict = {}
    for t in range(n):
        key = tuple(int(v) for v in layout.overlaps[t])
        if key not in cache:
            cache[key] = overlap_ramp_weight(b, b, *key)
        out[t] = cache[key]
    return out


def _ramp_profile(n: int, lo_overlap: int, hi_overlap: int) -> np.ndarray:
    """1-D linear feather profile over a block edge pair."""
    w = np.ones(n, dtype=np.float32)
    if lo_overlap > 0:
        w[:lo_overlap] *= np.linspace(0, 1, lo_overlap, dtype=np.float32)
    if hi_overlap > 0:
        w[-hi_overlap:] *= np.linspace(1, 0, hi_overlap, dtype=np.float32)
    return w


def layout_weight_profiles(layout: TileLayout) -> tuple:
    """Separable form of the ramp weights: (wy [N, block], wx [N, block])
    float32 with ``weight[t] == outer(wy[t], wx[t])`` exactly.

    Separability matters on TPU: per-level weight *pyramids* of an outer
    product are outer products of 1-D pyramids (the binomial kernel is
    separable), so the blend can synthesize per-level weight maps on
    device from kilobyte-sized vectors instead of holding gigabyte dense
    pyramids in HBM.
    """
    n, b = layout.num_tiles, layout.block
    wy = np.empty((n, b), np.float32)
    wx = np.empty((n, b), np.float32)
    cache: dict = {}
    for t in range(n):
        top, bottom, left, right = (int(v) for v in layout.overlaps[t])
        ky = (top, bottom)
        kx = (left, right)
        if ky not in cache:
            cache[ky] = _ramp_profile(b, *ky)
        if kx not in cache:
            cache[kx] = _ramp_profile(b, *kx)
        wy[t] = cache[ky]
        wx[t] = cache[kx]
    return wy, wx


def _pyr_down_1d(v: np.ndarray) -> np.ndarray:
    """cv2-parity 1-D pyrDown (5-tap binomial, REFLECT_101, even phase)
    applied along the last axis of [N, L]."""
    from ..ops.pallas.pyramid_pallas import decimation_matrix

    d = decimation_matrix(v.shape[-1])
    return (v @ d.T).astype(np.float32)


def profile_pyramid(profiles: np.ndarray, levels: int) -> list:
    """[P0..P_{L-1}] 1-D Gaussian pyramid of [N, L] profiles (host-side,
    numpy; exact match of the device pyr_down on the outer product)."""
    out = [np.asarray(profiles, np.float32)]
    for _ in range(levels - 1):
        if out[-1].shape[-1] < 2 or (out[-1].shape[-1] + 1) // 2 < 2:
            break
        out.append(_pyr_down_1d(out[-1]))
    return out
