"""TilingModule — public tile decomposition surface.

API-parity port of the reference's `TilingModule` (reference:
tiling_module.py:428-1222): `split_image`, metadata-rich `Tile` objects
(block_id UUID, global coordinates, 4-side overlaps, neighbor graph,
image hash, complexity score, ROI flags), streaming tile loads, the
L1/L2 cache, checkpoint/resume keyed by image md5, and `merge_tiles` — on
top of the static-geometry + XLA extraction kernels.

The TPU-native fast path is :meth:`split_to_batch` (layout + one
device-resident [N, B, B, C] array, no per-tile Python objects); the
`Tile`-object API exists for reference parity and host-side workflows.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time
import uuid
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Dict, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..config import TilingConfig
from ..ops.tiles import extract_tiles, merge_tiles as _merge_tiles_op, pad_image, unpad_image
from ..ops.weights import layout_weights
from .cache import TileStore
from .content import ContentAnalyzer
from .geometry import TileLayout, compute_layout

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None


class PaddingMode(Enum):
    """(reference: tiling_module.py:40-46; mirror = BORDER_REFLECT_101)."""

    MIRROR = "mirror"
    REPLICATE = "replicate"
    REFLECT = "reflect"
    CONSTANT = "constant"


class TileStatus(Enum):
    """(reference: tiling_module.py:48-55)."""

    PENDING = "pending"
    PROCESSING = "processing"
    COMPLETED = "completed"
    FAILED = "failed"
    CACHED = "cached"


class CacheLevel(Enum):
    """(reference: tiling_module.py:57-61)."""

    L1_MEMORY = "l1_memory"
    L2_DISK = "l2_disk"
    L3_CLOUD = "l3_cloud"


@dataclass
class TileMetadata:
    """(reference: tiling_module.py:64-125)."""

    block_id: str
    tile_index: int
    row: int
    col: int
    global_x: int
    global_y: int
    input_w: int
    input_h: int
    output_w: int
    output_h: int
    overlap_top: int
    overlap_bottom: int
    overlap_left: int
    overlap_right: int
    image_hash: str = ""
    neighbor_ids: List[int] = field(default_factory=list)
    complexity_score: float = 0.0
    roi_flags: Dict[str, Any] = field(default_factory=dict)
    status: TileStatus = TileStatus.PENDING

    def to_dict(self) -> Dict[str, Any]:
        d = dict(self.__dict__)
        d["status"] = self.status.value
        return d

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TileMetadata":
        d = dict(d)
        d["status"] = TileStatus(d.get("status", "pending"))
        return cls(**d)


@dataclass
class Tile:
    """(reference: tiling_module.py:128-171)."""

    data: np.ndarray
    metadata: TileMetadata

    def get_effective_region(self) -> np.ndarray:
        """Tile content minus overlap bands (reference: tiling:160-170)."""
        m = self.metadata
        h, w = self.data.shape[:2]
        return self.data[
            m.overlap_top : h - m.overlap_bottom if m.overlap_bottom else h,
            m.overlap_left : w - m.overlap_right if m.overlap_right else w,
        ]


class TilingModule:
    """Overlap-grid tile decomposition with caching and checkpoint/resume."""

    def __init__(
        self,
        block_size: int = 2048,
        overlap_ratio: float = 0.2,
        padding_mode: Union[PaddingMode, str] = PaddingMode.MIRROR,
        output_scale: int = 2,
        content_aware: bool = False,
        cache_dir: Optional[str] = None,
        l1_cache_size: int = 50,
        config: Optional[TilingConfig] = None,
        step_multiple: int = 32,
    ):
        cfg = config or TilingConfig()
        self.config = cfg
        self.block_size = block_size if block_size != 2048 else cfg.block_size
        self.overlap_ratio = overlap_ratio if overlap_ratio != 0.2 else cfg.overlap_ratio
        self.padding_mode = (
            padding_mode if isinstance(padding_mode, PaddingMode) else PaddingMode(padding_mode)
        )
        self.output_scale = output_scale
        self.content_aware = content_aware
        self.step_multiple = step_multiple
        self.store = TileStore(cache_dir or cfg.cache_dir, l1_cache_size or cfg.l1_cache_size)
        self.analyzer = ContentAnalyzer() if content_aware else None
        self._registry: Dict[str, Tile] = {}
        self._registry_lock = threading.Lock()
        self.processing_state: Dict[str, Dict[str, Any]] = {}
        self._layouts: Dict[str, TileLayout] = {}

    # -- hashing (reference: tiling:506-520) -------------------------------
    @staticmethod
    def compute_image_hash(source: Union[str, np.ndarray]) -> str:
        if isinstance(source, str):
            h = hashlib.md5()
            with open(source, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            return h.hexdigest()
        return hashlib.md5(np.ascontiguousarray(source).tobytes()).hexdigest()

    @staticmethod
    def _load_image(source: Union[str, np.ndarray]) -> np.ndarray:
        import jax

        if isinstance(source, jax.Array):
            # Already device-resident (the pipeline uploads once and
            # reuses it for tiling and QA) — no host round-trip.
            return source.astype(jnp.float32)
        if isinstance(source, np.ndarray):
            return source.astype(np.float32)
        if Image is None:
            raise RuntimeError("PIL unavailable for file loading")
        with Image.open(source) as im:
            return np.asarray(im.convert("RGB"), np.float32)

    # -- TPU-native fast path ---------------------------------------------
    def split_to_batch(
        self, image: Union[str, np.ndarray]
    ) -> Tuple[TileLayout, jnp.ndarray]:
        """(layout, [N, B, B, C] device batch) — the jit-input form."""
        arr = self._load_image(image)
        h, w = arr.shape[:2]
        layout = compute_layout(
            w, h, self.block_size, self.overlap_ratio, step_multiple=self.step_multiple
        )
        padded = pad_image(
            jnp.asarray(arr), layout, self.padding_mode.value, self.config.constant_value
        )
        return layout, extract_tiles(padded, layout)

    # -- reference-parity Tile API ----------------------------------------
    def split_image(self, source: Union[str, np.ndarray]) -> List[Tile]:
        """Full split with metadata (reference: tiling:671-784)."""
        arr = self._load_image(source)
        image_hash = self.compute_image_hash(source)
        layout, batch = self.split_to_batch(arr)
        self._layouts[image_hash] = layout
        tiles_np = np.asarray(batch)

        zone = None
        if self.analyzer is not None:
            zone = self.analyzer.create_forbidden_zone_map(arr)

        tiles: List[Tile] = []
        for t in range(layout.num_tiles):
            y, x = (int(v) for v in layout.positions[t])
            top, bottom, left, right = (int(v) for v in layout.overlaps[t])
            meta = TileMetadata(
                block_id=str(uuid.uuid4()),
                tile_index=t,
                row=t // layout.nx,
                col=t % layout.nx,
                global_x=x,
                global_y=y,
                input_w=layout.block,
                input_h=layout.block,
                output_w=layout.block * self.output_scale,
                output_h=layout.block * self.output_scale,
                overlap_top=top,
                overlap_bottom=bottom,
                overlap_left=left,
                overlap_right=right,
                image_hash=image_hash,
                neighbor_ids=[int(n) for n in layout.neighbors[t]],
            )
            data = tiles_np[t]
            meta.complexity_score = float(
                (0.299 * data[..., 0] + 0.587 * data[..., 1] + 0.114 * data[..., 2]).std()
            )
            if zone is not None:
                ys, xs = min(y, arr.shape[0] - 1), min(x, arr.shape[1] - 1)
                region = zone[ys : y + layout.block, xs : x + layout.block]
                meta.roi_flags["forbidden_ratio"] = float(region.mean()) if region.size else 0.0
            tile = Tile(data=data, metadata=meta)
            tiles.append(tile)
            with self._registry_lock:
                self._registry[meta.block_id] = tile

        self.processing_state[image_hash] = {
            "timestamp": time.time(),
            "num_tiles": layout.num_tiles,
            "block_size": layout.block,
            "overlap": layout.overlap,
            "image_w": layout.image_w,
            "image_h": layout.image_h,
            "tiles": {tl.metadata.block_id: tl.metadata.status.value for tl in tiles},
        }
        return tiles

    def get_tile(self, block_id: str) -> Optional[Tile]:
        with self._registry_lock:
            return self._registry.get(block_id)

    def load_tile_streaming(
        self, image_path: str, tile_index: int
    ) -> np.ndarray:
        """Lazy single-tile load via PIL crop (reference: tiling:854-897) —
        avoids decoding the full image for one tile."""
        if Image is None:
            raise RuntimeError("PIL unavailable")
        with Image.open(image_path) as im:
            w, h = im.size
            layout = compute_layout(
                w, h, self.block_size, self.overlap_ratio, step_multiple=self.step_multiple
            )
            y, x = (int(v) for v in layout.positions[tile_index])
            crop = im.convert("RGB").crop(
                (x, y, min(x + layout.block, w), min(y + layout.block, h))
            )
            data = np.asarray(crop, np.float32)
        # pad to full block (mirror) if the crop hit the image edge
        ph = layout.block - data.shape[0]
        pw = layout.block - data.shape[1]
        if ph or pw:
            data = np.pad(data, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        return data

    # -- cache (reference: tiling:899-996) ---------------------------------
    def save_tile_cache(self, tile: Tile) -> None:
        self.store.put(tile.metadata.image_hash, tile.metadata.block_id, tile.data)
        tile.metadata.status = TileStatus.CACHED

    def load_tile_cache(self, image_hash: str, block_id: str) -> Optional[np.ndarray]:
        return self.store.get(image_hash, block_id)

    def get_cache_stats(self) -> Dict[str, Any]:
        """(reference: tiling:1195-1217)."""
        return self.store.stats()

    # -- checkpoint / resume (reference: tiling:998-1072) ------------------
    def _checkpoint_path(self, image_hash: str) -> str:
        return os.path.join(self.store.cache_dir, image_hash, "checkpoint.json")

    def save_checkpoint(self, image_hash: str) -> str:
        state = self.processing_state.get(image_hash)
        if state is None:
            raise KeyError(f"no processing state for {image_hash}")
        with self._registry_lock:
            metas = [
                t.metadata.to_dict()
                for t in self._registry.values()
                if t.metadata.image_hash == image_hash
            ]
        path = self._checkpoint_path(image_hash)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"state": state, "tiles": metas}, f)
        os.replace(tmp, path)
        return path

    def restore_from_cache(self, image_hash: str) -> Optional[List[Tile]]:
        """Rebuild Tile objects from checkpoint + L2 store into THIS
        instance (the reference tests restoring into a fresh module,
        tiling:1306-1313). Returns None when no checkpoint exists."""
        path = self._checkpoint_path(image_hash)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            payload = json.load(f)
        self.processing_state[image_hash] = payload["state"]
        tiles: List[Tile] = []
        for md in payload["tiles"]:
            meta = TileMetadata.from_dict(md)
            data = self.store.get(image_hash, meta.block_id)
            if data is None:
                meta.status = TileStatus.PENDING
                data = np.zeros((meta.input_h, meta.input_w, 3), np.float32)
            tile = Tile(data=data, metadata=meta)
            tiles.append(tile)
            with self._registry_lock:
                self._registry[meta.block_id] = tile
        tiles.sort(key=lambda t: t.metadata.tile_index)
        return tiles

    # -- merge (reference: tiling:1074-1175) -------------------------------
    def merge_tiles(
        self,
        tiles: List[Tile],
        output_size: Optional[Tuple[int, int]] = None,
        scale: Optional[int] = None,
    ) -> np.ndarray:
        """Feathered weighted merge of (possibly upscaled) tiles."""
        if not tiles:
            raise ValueError("no tiles to merge")
        tiles = sorted(tiles, key=lambda t: t.metadata.tile_index)
        image_hash = tiles[0].metadata.image_hash
        layout = self._layouts.get(image_hash)
        s = scale or (tiles[0].data.shape[0] // tiles[0].metadata.input_w) or 1
        if layout is None:
            # reconstruct from metadata
            m0 = tiles[0].metadata
            nx = max(t.metadata.col for t in tiles) + 1
            ny = max(t.metadata.row for t in tiles) + 1
            step = m0.input_w - (m0.overlap_right or 0)
            w = (nx - 1) * step + m0.input_w
            h = (ny - 1) * step + m0.input_h
            layout = compute_layout(w, h, m0.input_w, (m0.overlap_right or 0) / m0.input_w)
        out_layout = layout.scaled(s)
        batch = jnp.stack([jnp.asarray(t.data, jnp.float32) for t in tiles])
        weights = layout_weights(out_layout, kind="ramp")
        canvas = _merge_tiles_op(batch, weights, out_layout)
        out = np.asarray(unpad_image(canvas, out_layout))
        if output_size is not None:
            out = out[: output_size[0], : output_size[1]]
        return out
