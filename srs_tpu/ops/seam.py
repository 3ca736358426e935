"""Seam detection and repair.

TPU-native rebuild of the reference's seam QA loop (reference:
blending_module.py:59-93 `Seam`, :765-853 `detect_seams`, :905-966 seam
merging, :1148-1240 `repair_seams` / `_find_best_matching_tile`).

The reference slides a 16x16 window at stride 8 in Python and computes a
global-stats SSIM per window; here the whole window grid is one
`lax.reduce_window` pass (5 box-sum maps -> SSIM formula), per tile,
vectorized over the tile batch. Seam *list* extraction (data-dependent
count) happens on host from the returned score map, preserving the
reference's merge-adjacent semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tiling.geometry import TileLayout
from .colorspace import rgb_to_gray
from .filters import gaussian_blur
from .blend import seamless_clone

__all__ = ["Seam", "windowed_ssim_map", "detect_seams", "repair_seams"]

_C1 = (0.01 * 255.0) ** 2
_C2 = (0.03 * 255.0) ** 2


@dataclass
class Seam:
    """Detected seam region (reference: blending_module.py:59-93)."""

    x: int
    y: int
    width: int
    height: int
    ssim_score: float

    @property
    def severity(self) -> str:
        if self.ssim_score < 0.85:
            return "high"
        if self.ssim_score < 0.92:
            return "medium"
        return "low"

    @property
    def repair_method(self) -> str:
        return {
            "high": "poisson_refinement",
            "medium": "increase_blend_width",
            "low": "none",
        }[self.severity]


def _box_sums(x: jax.Array, win: int, stride: int) -> jax.Array:
    """Sum over win x win windows at the given stride (VALID)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, win, win), (1, stride, stride), "VALID"
    )


@partial(jax.jit, static_argnames=("win", "stride"))
def windowed_ssim_map(
    result_tiles: jax.Array,
    source_tiles: jax.Array,
    win: int = 16,
    stride: int = 8,
) -> jax.Array:
    """Per-window global-stats SSIM between [N,B,B,C] batches.

    Returns [N, Wy, Wx] of SSIM scores — the reference's per-window
    `_compute_ssim` (blending:855-903: global statistics over the window)
    evaluated over the full stride-8 grid in one reduce_window pass.
    """
    x = rgb_to_gray(result_tiles.astype(jnp.float32))
    y = rgb_to_gray(source_tiles.astype(jnp.float32))
    n = float(win * win)
    sx = _box_sums(x, win, stride) / n
    sy = _box_sums(y, win, stride) / n
    sxx = _box_sums(x * x, win, stride) / n
    syy = _box_sums(y * y, win, stride) / n
    sxy = _box_sums(x * y, win, stride) / n
    vx = sxx - sx * sx
    vy = syy - sy * sy
    cov = sxy - sx * sy
    return ((2 * sx * sy + _C1) * (2 * cov + _C2)) / (
        (sx * sx + sy * sy + _C1) * (vx + vy + _C2)
    )


def _merge_adjacent(seams: List[Seam], distance_threshold: int) -> List[Seam]:
    """Greedy group-walk merge, parity with reference blending:905-966."""
    if not seams:
        return []
    seams_sorted = sorted(seams, key=lambda s: (s.y, s.x))
    merged: List[Seam] = []
    group = [seams_sorted[0]]
    for s in seams_sorted[1:]:
        last = group[-1]
        if np.hypot(s.x - last.x, s.y - last.y) < distance_threshold:
            group.append(s)
        else:
            merged.append(_merge_group(group))
            group = [s]
    merged.append(_merge_group(group))
    return merged


def _merge_group(group: List[Seam]) -> Seam:
    if len(group) == 1:
        return group[0]
    x0 = min(s.x for s in group)
    y0 = min(s.y for s in group)
    x1 = max(s.x + s.width for s in group)
    y1 = max(s.y + s.height for s in group)
    return Seam(x0, y0, x1 - x0, y1 - y0, float(np.mean([s.ssim_score for s in group])))


def detect_seams(
    result_tiles: jax.Array,
    source_tiles: jax.Array,
    layout: TileLayout,
    window_size: int = 16,
    stride: int = 8,
    threshold: float = 0.95,
) -> List[Seam]:
    """Detect low-SSIM windows between the fused result (re-extracted as
    tiles) and the source tiles; global coordinates, merged within
    ``window_size`` px (reference: blending:765-853)."""
    smap = np.asarray(windowed_ssim_map(result_tiles, source_tiles, window_size, stride))
    seams: List[Seam] = []
    for t, (ty, tx) in enumerate(np.asarray(layout.positions)):
        ys, xs = np.nonzero(smap[t] < threshold)
        for wy, wx in zip(ys, xs):
            seams.append(
                Seam(
                    x=int(tx + wx * stride),
                    y=int(ty + wy * stride),
                    width=window_size,
                    height=window_size,
                    ssim_score=float(smap[t, wy, wx]),
                )
            )
    return _merge_adjacent(seams, distance_threshold=window_size)


@partial(jax.jit, static_argnames=("patch",))
def _blur_patch(canvas: jax.Array, y: jax.Array, x: jax.Array, patch: int) -> jax.Array:
    p = jax.lax.dynamic_slice(canvas, (y, x, 0), (patch, patch, canvas.shape[-1]))
    # cv2.GaussianBlur(15,15) sigma=0 -> auto sigma 2.6 (reference:
    # blending:1196-1203 medium-severity repair).
    moved = jnp.moveaxis(p, -1, 0)
    blurred = jnp.moveaxis(gaussian_blur(moved, 15, 0.3 * ((15 - 1) * 0.5 - 1) + 0.8), 0, -1)
    return jax.lax.dynamic_update_slice(canvas, blurred, (y, x, 0))


@partial(jax.jit, static_argnames=("patch",))
def _poisson_patch(
    canvas: jax.Array, src_tile_patch: jax.Array, y: jax.Array, x: jax.Array, patch: int
) -> jax.Array:
    dst = jax.lax.dynamic_slice(canvas, (y, x, 0), (patch, patch, canvas.shape[-1]))
    mask = jnp.ones((patch, patch), jnp.float32)
    # Keep a 2px Dirichlet rim so the patch blends into the canvas.
    mask = mask.at[:2, :].set(0).at[-2:, :].set(0).at[:, :2].set(0).at[:, -2:].set(0)
    fixed = seamless_clone(dst, src_tile_patch, mask, mode="mixed", iters=200)
    return jax.lax.dynamic_update_slice(canvas, fixed, (y, x, 0))


def repair_seams(
    canvas: jax.Array,
    seams: Sequence[Seam],
    source_tiles: Optional[jax.Array] = None,
    layout: Optional[TileLayout] = None,
    patch: int = 64,
) -> jax.Array:
    """Repair seams on the fused canvas (reference: blending:1148-1240).

    medium severity -> Gaussian smoothing of a fixed ``patch`` window
    centered on the seam; high severity -> Poisson (mixed-gradient) patch
    from the best-matching source tile. Fixed patch size keeps shapes
    static (one compile per patch size, any number of seams).
    """
    h, w = int(canvas.shape[0]), int(canvas.shape[1])
    canvas = jnp.asarray(canvas, jnp.float32)
    for s in seams:
        if s.severity == "low":
            continue
        cy = min(max(0, s.y + s.height // 2 - patch // 2), h - patch)
        cx = min(max(0, s.x + s.width // 2 - patch // 2), w - patch)
        if s.severity == "medium" or source_tiles is None or layout is None:
            canvas = _blur_patch(canvas, jnp.int32(cy), jnp.int32(cx), patch)
        else:
            t = _best_tile_for(s, layout)
            ty, tx = int(layout.positions[t][0]), int(layout.positions[t][1])
            py = min(max(0, cy - ty), layout.block - patch)
            px = min(max(0, cx - tx), layout.block - patch)
            src_patch = jax.lax.dynamic_slice(
                source_tiles[t].astype(jnp.float32),
                (py, px, 0),
                (patch, patch, canvas.shape[-1]),
            )
            canvas = _poisson_patch(canvas, src_patch, jnp.int32(cy), jnp.int32(cx), patch)
    return canvas


def _best_tile_for(seam: Seam, layout: TileLayout) -> int:
    """Tile whose center is nearest the seam center (the reference picks
    the best-SSIM overlapping tile, blending:1218-1240; center distance is
    the deterministic equivalent for full-block layouts)."""
    cy = seam.y + seam.height / 2
    cx = seam.x + seam.width / 2
    pos = np.asarray(layout.positions, np.float64)
    centers = pos + layout.block / 2
    return int(np.argmin((centers[:, 0] - cy) ** 2 + (centers[:, 1] - cx) ** 2))
