"""Content-aware tiling analysis.

Port of the reference's `ContentAnalyzer` (reference:
tiling_module.py:174-370): builds a "forbidden zone" map so tile seams
avoid faces / text / salient regions, plus local-entropy and per-tile
complexity statistics.

TPU split: the *dense* analyses — spectral-residual saliency (FFT
log-magnitude minus box-filtered log-magnitude, reference :239-289) and
local entropy (:291-321) — are jnp kernels; the *sparse detectors* (Haar
face cascade :197-212, MSER text boxes :214-237) stay host-side cv2 calls
(gated — they are pre-pass layout hints, not compute-path work; SURVEY §2
#3 marks them optional host-side pre-pass).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.colorspace import rgb_to_gray
from ..ops.filters import box_blur, gaussian_blur

try:
    import cv2  # host-side detectors only

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

__all__ = ["ContentAnalyzer"]


@jax.jit
def _spectral_residual_saliency(gray: jax.Array) -> jax.Array:
    """Spectral-residual saliency (Hou & Zhang 2007), parity with the
    reference fallback (tiling_module.py:260-288): log-magnitude spectrum
    minus its 3x3 box average, rebuilt through the inverse FFT, squared,
    Gaussian-blurred, normalized to [0, 1]."""
    g = gray.astype(jnp.float32)
    spec = jnp.fft.fft2(g)
    mag = jnp.abs(spec)
    phase = jnp.angle(spec)
    log_mag = jnp.log(mag + 1e-8)
    residual = log_mag - box_blur(log_mag, 3)
    rebuilt = jnp.fft.ifft2(jnp.exp(residual + 1j * phase))
    sal = jnp.abs(rebuilt) ** 2
    sal = gaussian_blur(sal, 11, 2.5)
    lo, hi = jnp.min(sal), jnp.max(sal)
    return (sal - lo) / jnp.maximum(hi - lo, 1e-8)


@partial(jax.jit, static_argnames=("window",))
def _local_entropy(gray: jax.Array, window: int = 64) -> jax.Array:
    """Local histogram entropy over ``window`` boxes (reference:
    tiling_module.py:291-321), computed as a soft 16-bin histogram via
    one-hot binning + box sums — O(bins * HW) VPU work, no data-dependent
    loops."""
    g = jnp.clip(gray.astype(jnp.float32), 0.0, 255.0)
    bins = 16
    idx = jnp.clip((g / 256.0 * bins).astype(jnp.int32), 0, bins - 1)
    onehot = jax.nn.one_hot(idx, bins, dtype=jnp.float32)  # (H, W, bins)
    counts = box_blur(jnp.moveaxis(onehot, -1, 0), window)  # (bins, H, W), mean
    p = counts / jnp.maximum(jnp.sum(counts, axis=0, keepdims=True), 1e-8)
    ent = -jnp.sum(p * jnp.log2(jnp.maximum(p, 1e-10)), axis=0)
    return ent / np.log2(bins)  # normalize to [0, 1]


class ContentAnalyzer:
    """Forbidden-zone construction for seam-aware tile layouts."""

    def __init__(
        self,
        face_margin_ratio: float = 0.2,
        saliency_threshold: float = 0.7,
        entropy_window: int = 64,
    ):
        # thresholds parity: face margin 20% (tiling:349-356), saliency 0.7
        # (tiling:365-368).
        self.face_margin_ratio = face_margin_ratio
        self.saliency_threshold = saliency_threshold
        self.entropy_window = entropy_window
        self._face_cascade = None
        if _HAS_CV2:
            try:
                path = cv2.data.haarcascades + "haarcascade_frontalface_default.xml"
                cascade = cv2.CascadeClassifier(path)
                if not cascade.empty():
                    self._face_cascade = cascade
            except Exception:
                self._face_cascade = None

    # -- host-side detectors ----------------------------------------------
    def detect_faces(self, image: np.ndarray) -> List[Tuple[int, int, int, int]]:
        """Haar frontal-face boxes (x, y, w, h) (reference: tiling:197-212).
        Empty when cv2/cascade data is unavailable."""
        if self._face_cascade is None:
            return []
        gray = cv2.cvtColor(np.asarray(image, np.uint8), cv2.COLOR_RGB2GRAY)
        faces = self._face_cascade.detectMultiScale(gray, 1.1, 4)
        return [tuple(int(v) for v in f) for f in faces]

    def detect_text_regions(self, image: np.ndarray) -> List[Tuple[int, int, int, int]]:
        """MSER-based text-ish boxes (reference: tiling:214-237): MSER
        regions filtered by aspect/size."""
        if not _HAS_CV2:
            return []
        gray = cv2.cvtColor(np.asarray(image, np.uint8), cv2.COLOR_RGB2GRAY)
        mser = cv2.MSER.create() if hasattr(cv2.MSER, "create") else cv2.MSER_create()
        regions, _ = mser.detectRegions(gray)
        boxes = []
        for r in regions:
            x, y, w, h = cv2.boundingRect(r)
            if w < 8 or h < 8 or w > gray.shape[1] // 2:
                continue
            aspect = w / max(h, 1)
            if 0.1 < aspect < 15:
                boxes.append((int(x), int(y), int(w), int(h)))
        return boxes

    # -- device kernels ----------------------------------------------------
    def compute_saliency_map(self, image: np.ndarray) -> np.ndarray:
        gray = rgb_to_gray(jnp.asarray(np.asarray(image, np.float32)))
        return np.asarray(_spectral_residual_saliency(gray))

    def compute_local_entropy(self, image: np.ndarray) -> np.ndarray:
        gray = rgb_to_gray(jnp.asarray(np.asarray(image, np.float32)))
        return np.asarray(_local_entropy(gray, self.entropy_window))

    # -- forbidden zones ---------------------------------------------------
    def create_forbidden_zone_map(self, image: np.ndarray) -> np.ndarray:
        """Boolean (H, W) map of regions seams should avoid (reference:
        tiling:323-370): face boxes expanded by 20% margin, text boxes,
        saliency > 0.7."""
        img = np.asarray(image)
        h, w = img.shape[:2]
        zone = np.zeros((h, w), dtype=bool)
        for (x, y, bw, bh) in self.detect_faces(img):
            mx = int(bw * self.face_margin_ratio)
            my = int(bh * self.face_margin_ratio)
            zone[max(0, y - my) : min(h, y + bh + my), max(0, x - mx) : min(w, x + bw + mx)] = True
        for (x, y, bw, bh) in self.detect_text_regions(img):
            zone[y : y + bh, x : x + bw] = True
        sal = self.compute_saliency_map(img)
        zone |= sal > self.saliency_threshold
        return zone

    @staticmethod
    def tile_complexity(tile: np.ndarray) -> float:
        """Grayscale std (reference: tiling:746-749)."""
        gray = np.asarray(rgb_to_gray(jnp.asarray(np.asarray(tile, np.float32))))
        return float(gray.std())

    @staticmethod
    def forbidden_ratio(zone: np.ndarray, x: int, y: int, w: int, h: int) -> float:
        """Fraction of a tile covered by forbidden zones (reference:
        tiling:751-757)."""
        region = zone[y : y + h, x : x + w]
        return float(region.mean()) if region.size else 0.0
