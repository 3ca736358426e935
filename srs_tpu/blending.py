"""BlendingModule — public tile-fusion surface.

API-parity port of the reference's `BlendingModule` (reference:
blending_module.py:139-1660): same method names and enums (`FusionMethod`,
`PoissonMode`, `WeightType`, `TileInfo`, `OverlapRegion`,
`laplacian_fusion`, `poisson_fusion`, `weighted_average_fusion`,
`multi_band_fusion`, `feather_blend`, `gradient_domain_fusion`,
`detect_seams`, `repair_seams`, `color_correction`, `create_tile_grid`,
`compute_blend_quality`, `visualize_seams`) over the batched XLA kernels in
:mod:`srs_tpu.ops`.

The reference's `ParallelBlender` (ThreadPoolExecutor, blending:1665-1705)
and `CUDABlending` (cv2.cuda wrappers, :1710-1758) have no equivalents
here by design: the tile batch is a single device-resident array program,
so host threads and per-op device round-trips disappear (SURVEY §2 #7).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import BlendingConfig
from .ops import blend as B
from .ops import color as C
from .ops import seam as S
from .ops import weights as W
from .ops.filters import sobel
from .ops.pyramid import (
    build_gaussian_pyramid,
    build_laplacian_pyramid,
    collapse_laplacian_pyramid,
)
from .ops.seam import Seam, detect_seams as _detect_seams_tiles, repair_seams as _repair
from .ops.tiles import extract_tiles, unpad_image
from .qa.metrics import ssim_global
from .tiling.geometry import TileLayout, compute_layout


class FusionMethod(Enum):
    LAPLACIAN = "laplacian"
    POISSON = "poisson"
    WEIGHTED_AVERAGE = "weighted_average"
    FEATHER = "feather"
    GRADIENT_DOMAIN = "gradient_domain"
    MULTI_BAND = "multi_band"


class PoissonMode(Enum):
    NORMAL = "normal"
    MIXED = "mixed"
    MONOCHROME = "monochrome"


class WeightType(Enum):
    LINEAR = "linear"
    COSINE = "cosine"
    SIGMOID = "sigmoid"


@dataclass
class TileInfo:
    """(image, x, y, row, col) — parity with blending_module.py:96-113."""

    image: np.ndarray
    x: int
    y: int
    row: int
    col: int


@dataclass
class OverlapRegion:
    """Parity with blending_module.py:115-137."""

    tile1_idx: int
    tile2_idx: int
    x1_start: int
    y1_start: int
    x2_start: int
    y2_start: int
    width: int
    height: int
    direction: str


def _layout_from_tiles(tiles: Sequence[TileInfo]) -> Tuple[TileLayout, jnp.ndarray]:
    """Infer a TileLayout + batch array from a uniform TileInfo grid."""
    block = tiles[0].image.shape[0]
    assert all(t.image.shape[:2] == (block, block) for t in tiles), (
        "TPU blend path requires uniform square tiles; use TilingModule for "
        "automatic full-block layouts"
    )
    nx = max(t.col for t in tiles) + 1
    ny = max(t.row for t in tiles) + 1
    xs = sorted({t.x for t in tiles})
    step = xs[1] - xs[0] if len(xs) > 1 else block
    overlap = block - step
    img_w = (nx - 1) * step + block
    img_h = (ny - 1) * step + block
    layout = compute_layout(img_w, img_h, block, max(overlap, 0) / block if block else 0.0)
    order = sorted(range(len(tiles)), key=lambda i: (tiles[i].row, tiles[i].col))
    batch = jnp.stack([jnp.asarray(tiles[i].image, jnp.float32) for i in order])
    positions = jnp.asarray(
        np.array([[tiles[i].y, tiles[i].x] for i in order], np.int32)
    )
    return layout, batch, positions


class BlendingModule:
    """Multi-algorithm tile fusion, seam QA/repair, color correction."""

    def __init__(
        self,
        config: Optional[BlendingConfig] = None,
        num_levels: int = 6,
        ssim_threshold: float = 0.95,
    ):
        self.config = config or BlendingConfig()
        self.num_levels = num_levels if num_levels != 6 else self.config.pyramid_levels
        self.ssim_threshold = (
            ssim_threshold if ssim_threshold != 0.95 else self.config.seam_threshold
        )

    # -- pyramids (reference: blending:217-363) ---------------------------
    def build_gaussian_pyramid(self, image, levels: Optional[int] = None):
        return build_gaussian_pyramid(jnp.asarray(image, jnp.float32), levels or self.num_levels)

    def build_laplacian_pyramid(self, image, levels: Optional[int] = None):
        return build_laplacian_pyramid(jnp.asarray(image, jnp.float32), levels or self.num_levels)

    def collapse_laplacian_pyramid(self, pyramid):
        return collapse_laplacian_pyramid(pyramid)

    # -- internal: normalize inputs ---------------------------------------
    def _prep(self, tiles, weight_type: WeightType, weight_kind: str = "distance"):
        if isinstance(tiles[0], TileInfo):
            layout, batch, positions = _layout_from_tiles(tiles)
        else:
            n = len(tiles)
            grid = int(np.ceil(np.sqrt(n)))
            infos = [
                TileInfo(np.asarray(t), (i % grid) * tiles[0].shape[1], (i // grid) * tiles[0].shape[0], i // grid, i % grid)
                for i, t in enumerate(tiles)
            ]
            layout, batch, positions = _layout_from_tiles(infos)
        wt = weight_type.value if isinstance(weight_type, WeightType) else weight_type
        weights = W.layout_weights(layout, kind=weight_kind, weight_type=wt)
        return layout, batch, positions, weights

    # -- fusion methods ----------------------------------------------------
    def laplacian_fusion(
        self,
        tiles: Sequence[Union[np.ndarray, TileInfo]],
        overlap_map: Optional[List[OverlapRegion]] = None,
        output_shape: Optional[Tuple[int, int]] = None,
        weight_type: WeightType = WeightType.COSINE,
    ) -> np.ndarray:
        """Burt-Adelson fusion (reference: blending:369-506). Returns a
        float32 [0,255] canvas cropped to ``output_shape`` if given."""
        layout, batch, positions, weights = self._prep(tiles, weight_type)
        canvas = B.laplacian_fusion_tiles(
            batch, weights, layout, levels=self.num_levels, positions=positions
        )
        return self._crop(canvas, output_shape, layout)

    def multi_band_fusion(self, tiles, output_shape=None) -> np.ndarray:
        """= laplacian fusion with sigmoid weights (reference: blending:1245-1270)."""
        return self.laplacian_fusion(tiles, None, output_shape, WeightType.SIGMOID)

    def weighted_average_fusion(
        self, tiles, output_shape=None, weight_type: WeightType = WeightType.LINEAR
    ) -> np.ndarray:
        """(reference: blending:661-760)."""
        layout, batch, positions, weights = self._prep(tiles, weight_type)
        canvas = B.weighted_fusion_tiles(
            batch, weights, layout, positions=positions, clip_range=(0, 255)
        )
        return self._crop(canvas, output_shape, layout)

    def feather_blend(self, tiles, output_shape=None) -> np.ndarray:
        """Distance-transform feathering with cosine profile (reference:
        blending:1272-1375; for rectangular tiles the L2 distance transform
        equals the distance-to-edge map)."""
        return self.weighted_average_fusion(tiles, output_shape, WeightType.COSINE)

    def gradient_domain_fusion(self, tiles, output_shape=None) -> np.ndarray:
        """Gradient-domain fusion with an exact spectral Poisson solve
        (upgrades reference blending:1377-1487's cumsum integration)."""
        layout, batch, positions, weights = self._prep(tiles, WeightType.COSINE)
        canvas = B.gradient_domain_fusion_tiles(batch, weights, layout, positions=positions)
        return self._crop(canvas, output_shape, layout)

    def poisson_fusion(
        self,
        base: np.ndarray,
        overlay: np.ndarray,
        mask: np.ndarray,
        mode: PoissonMode = PoissonMode.NORMAL,
        solver: str = "multigrid",
    ) -> np.ndarray:
        """Seamless clone of ``overlay`` into ``base`` under ``mask``
        (reference: blending:563-625 wrapping cv2.seamlessClone).
        ``solver='multigrid'`` (default) converges at print scale;
        ``'jacobi'`` is the cheap small-patch relaxation."""
        m = mode.value if isinstance(mode, PoissonMode) else mode
        fn = B.seamless_clone_multigrid if solver == "multigrid" else B.seamless_clone
        out = fn(
            jnp.asarray(base, jnp.float32), jnp.asarray(overlay, jnp.float32),
            jnp.asarray(mask, jnp.float32), mode=m,
        )
        return np.clip(np.asarray(out), 0, 255)

    @staticmethod
    def _crop(canvas, output_shape, layout) -> np.ndarray:
        out = np.asarray(canvas)
        if output_shape is not None:
            out = out[: output_shape[0], : output_shape[1]]
        else:
            out = out[: layout.image_h, : layout.image_w]
        return out

    # -- seams -------------------------------------------------------------
    def detect_seams(
        self,
        result: np.ndarray,
        tiles: Sequence[Union[np.ndarray, TileInfo]],
        window_size: int = 16,
        stride: int = 8,
    ) -> List[Seam]:
        """(reference: blending:765-853)."""
        layout, batch, positions, _ = self._prep(tiles, WeightType.COSINE)
        ph = max(int(result.shape[0]), layout.padded_h)
        pw = max(int(result.shape[1]), layout.padded_w)
        canvas = np.zeros((layout.padded_h, layout.padded_w, batch.shape[-1]), np.float32)
        canvas[: result.shape[0], : result.shape[1]] = np.asarray(result, np.float32)[
            : layout.padded_h, : layout.padded_w
        ]
        result_tiles = extract_tiles(jnp.asarray(canvas), layout, positions)
        return _detect_seams_tiles(
            result_tiles, batch, layout, window_size, stride, self.ssim_threshold
        )

    def repair_seams(
        self,
        result: np.ndarray,
        seams: Sequence[Seam],
        tiles: Optional[Sequence[Union[np.ndarray, TileInfo]]] = None,
    ) -> np.ndarray:
        """(reference: blending:1148-1216)."""
        src_tiles = layout = None
        if tiles is not None:
            layout, src_tiles, _, _ = self._prep(tiles, WeightType.COSINE)
        out = _repair(jnp.asarray(result, jnp.float32), seams, src_tiles, layout)
        return np.clip(np.asarray(out), 0, 255)

    # -- color -------------------------------------------------------------
    def color_correction(
        self,
        image: np.ndarray,
        reference_tile: np.ndarray,
        method: str = "histogram",
        local_filter: bool = True,
    ) -> np.ndarray:
        """(reference: blending:969-1017). Returns float32 [0,255]."""
        return np.asarray(
            C.color_correction(
                jnp.asarray(image, jnp.float32),
                jnp.asarray(reference_tile, jnp.float32),
                method,
                local_filter,
            )
        )

    def visualize_seams(
        self,
        image: np.ndarray,
        seams: Sequence[Seam],
        thickness: int = 2,
    ) -> np.ndarray:
        """Severity-colored seam rectangles (reference: blending:1611-1660);
        host-side numpy drawing (not a device op)."""
        out = np.array(image, copy=True)
        colors = {"high": (255, 0, 0), "medium": (255, 255, 0), "low": (0, 255, 0)}
        for s in seams:
            c = colors[s.severity]
            y0, y1 = max(0, s.y), min(out.shape[0], s.y + s.height)
            x0, x1 = max(0, s.x), min(out.shape[1], s.x + s.width)
            t = thickness
            out[y0 : y0 + t, x0:x1] = c
            out[max(0, y1 - t) : y1, x0:x1] = c
            out[y0:y1, x0 : x0 + t] = c
            out[y0:y1, max(0, x1 - t) : x1] = c
        return out


def create_tile_grid(
    images: List[np.ndarray], grid_shape: Tuple[int, int], overlap: int = 100
) -> Tuple[List[TileInfo], List[OverlapRegion]]:
    """Build TileInfo grid + pairwise overlap regions (reference:
    blending:1492-1560)."""
    rows, cols = grid_shape
    tile_h, tile_w = images[0].shape[:2]
    infos = [
        TileInfo(img, (i % cols) * (tile_w - overlap), (i // cols) * (tile_h - overlap),
                 i // cols, i % cols)
        for i, img in enumerate(images)
    ]
    regions: List[OverlapRegion] = []
    for i, t1 in enumerate(infos):
        for j in range(i + 1, len(infos)):
            t2 = infos[j]
            if abs(t1.row - t2.row) + abs(t1.col - t2.col) != 1:
                continue
            x_min = max(t1.x, t2.x)
            y_min = max(t1.y, t2.y)
            x_max = min(t1.x + t1.image.shape[1], t2.x + t2.image.shape[1])
            y_max = min(t1.y + t1.image.shape[0], t2.y + t2.image.shape[0])
            if x_max > x_min and y_max > y_min:
                regions.append(
                    OverlapRegion(
                        i, j, x_min - t1.x, y_min - t1.y, x_min - t2.x, y_min - t2.y,
                        x_max - x_min, y_max - y_min,
                        "horizontal" if t1.row == t2.row else "vertical",
                    )
                )
    return infos, regions


def compute_blend_quality(
    result: np.ndarray,
    tiles: Sequence[np.ndarray],
    positions: Sequence[Tuple[int, int]],
) -> Dict[str, float]:
    """mean/min/std per-tile global SSIM + gradient stats (reference:
    blending:1563-1608)."""
    scores = []
    res = jnp.asarray(result, jnp.float32)
    for tile, (y, x) in zip(tiles, positions):
        h, w = tile.shape[:2]
        roi = res[y : y + h, x : x + w]
        t = jnp.asarray(tile, jnp.float32)[: roi.shape[0], : roi.shape[1]]
        scores.append(float(ssim_global(roi, t)))
    gray = res if res.ndim == 2 else jnp.moveaxis(res, -1, 0)
    gx, gy = sobel(gray)
    mag = jnp.sqrt(gx * gx + gy * gy)
    return {
        "mean_ssim": float(np.mean(scores)),
        "min_ssim": float(np.min(scores)),
        "std_ssim": float(np.std(scores)),
        "mean_gradient": float(jnp.mean(mag)),
        "gradient_discontinuity": float(jnp.std(mag)),
    }
