"""Commercial-advertising quality metrics as jnp kernels.

Parity ports of the reference's commercial assessment (reference:
quality_assessment_module.py:814-1193): detail fidelity (FFT high-frequency
ratio, texture local variance, face skin-ratio naturalness), color accuracy
(Lab variance, brand-color delta-E, skin-tone distance to Lab(70,15,20)),
and visual comfort (Canny-density oversharpen, 8x8 blockiness, high-pass
noise, 4x4 brightness uniformity).

ROI cropping is host-side (data-dependent bboxes); each kernel takes a full
image or a pre-cropped ROI array.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.colorspace import rgb_to_gray, rgb_to_lab, rgb_to_ycrcb
from ..ops.filters import box_blur, canny_edges, gaussian_blur
from .noref import contrast, sharpness

__all__ = [
    "hf_ratio",
    "texture_score",
    "face_naturalness",
    "color_variance",
    "delta_e",
    "skin_tone_naturalness",
    "oversharpen_score",
    "artifact_score",
    "noise_level",
    "brightness_uniformity",
    "evaluate_commercial_arrays",
]


def _gray(image: jax.Array) -> jax.Array:
    if image.ndim >= 3 and image.shape[-1] == 3:
        return rgb_to_gray(image)
    if image.ndim >= 3 and image.shape[-1] == 1:
        return image[..., 0]
    return image


@jax.jit
def hf_ratio(image: jax.Array) -> jax.Array:
    """High-frequency energy ratio outside radius min(h,w)//4 of the
    centered magnitude spectrum (reference: qa:891-918)."""
    g = _gray(image).astype(jnp.float32)
    h, w = g.shape[-2], g.shape[-1]
    mag = jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(g)))
    cy, cx = h // 2, w // 2
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    dist = jnp.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    mask = (dist > min(h, w) // 4).astype(jnp.float32)
    return jnp.sum(mag * mask) / (jnp.sum(mag) + 1e-10)


@jax.jit
def texture_score(image: jax.Array) -> jax.Array:
    """Mean 5x5 local variance (reference: qa:920-934)."""
    g = _gray(image).astype(jnp.float32)
    return jnp.mean(box_blur(g * g, 5) - box_blur(g, 5) ** 2)


@jax.jit
def face_naturalness(image: jax.Array) -> jax.Array:
    """YCrCb skin-ratio naturalness: 100 - |skin_ratio - 0.3|*100
    (reference: qa:936-953)."""
    ycrcb = rgb_to_ycrcb(image.astype(jnp.float32))
    cr, cb = ycrcb[..., 1], ycrcb[..., 2]
    skin = (cr >= 133) & (cr <= 173) & (cb >= 77) & (cb <= 127)
    ratio = jnp.mean(skin.astype(jnp.float32))
    return jnp.clip(100.0 - jnp.abs(ratio - 0.3) * 100.0, 0.0, 100.0)


@jax.jit
def color_variance(image: jax.Array) -> jax.Array:
    """Variance of Lab L channel (reference: qa:986-999)."""
    lab = rgb_to_lab(image.astype(jnp.float32))
    return jnp.var(lab[..., 0])


@jax.jit
def delta_e(image: jax.Array, reference_rgb: jax.Array) -> jax.Array:
    """Euclidean distance in cv2 8-bit Lab between the image's mean color
    and a reference color (reference: qa:1001-1036)."""
    mean_rgb = jnp.mean(image.astype(jnp.float32), axis=tuple(range(image.ndim - 1)))
    lab1 = rgb_to_lab(mean_rgb)
    lab2 = rgb_to_lab(reference_rgb.astype(jnp.float32))
    return jnp.sqrt(jnp.sum((lab1 - lab2) ** 2))


@jax.jit
def skin_tone_naturalness(image: jax.Array) -> jax.Array:
    """100 - distance(mean Lab, ideal skin Lab(70,15,20)) — the reference
    compares against cv2 8-bit-packed channel means (qa:1049-1074)."""
    lab = rgb_to_lab(image.astype(jnp.float32))
    lm = jnp.mean(lab[..., 0])
    am = jnp.mean(lab[..., 1])
    bm = jnp.mean(lab[..., 2])
    # Reference compares the *packed* means to (70, 15, 20) directly.
    dist = jnp.sqrt((lm - 70.0) ** 2 + (am - 15.0) ** 2 + (bm - 20.0) ** 2)
    return jnp.maximum(0.0, 100.0 - dist)


@jax.jit
def oversharpen_score(image: jax.Array) -> jax.Array:
    """100 - canny_edge_density*500, floored at 0 (reference: qa:1094-1108)."""
    g = _gray(image).astype(jnp.float32)
    edges = canny_edges(g, 50.0, 150.0)
    density = jnp.mean(edges)
    return jnp.maximum(0.0, 100.0 - density * 500.0)


@jax.jit
def artifact_score(image: jax.Array) -> jax.Array:
    """Blockiness: variance of per-8x8-block variances, mapped to
    100 - v/100 floored at 0 (reference: qa:1110-1134; same block walk:
    starts 0,8,... strictly below dim-8)."""
    g = _gray(image).astype(jnp.float32)
    h, w = g.shape[-2], g.shape[-1]
    bh = max(1, (h - 8 + 7) // 8)  # count of starts in range(0, h-8, 8)
    bw = max(1, (w - 8 + 7) // 8)
    g = g[..., : bh * 8, : bw * 8]
    blocks = g.reshape(*g.shape[:-2], bh, 8, bw, 8)
    bvar = jnp.var(blocks, axis=(-3, -1))
    vov = jnp.var(bvar)
    return jnp.maximum(0.0, 100.0 - vov / 100.0)


@jax.jit
def noise_level(image: jax.Array) -> jax.Array:
    """Std of (gray - GaussianBlur(3,3)) high-pass (reference: qa:1136-1148).

    cv2.GaussianBlur ksize=3 sigma=0 uses sigma = 0.8 (cv2's auto rule).
    """
    g = _gray(image).astype(jnp.float32)
    return jnp.std(g - gaussian_blur(g, 3, 0.0))


@jax.jit
def brightness_uniformity(image: jax.Array) -> jax.Array:
    """100 - std of 4x4 region means, floored at 0 (reference: qa:1150-1171)."""
    g = _gray(image).astype(jnp.float32)
    h, w = g.shape[-2], g.shape[-1]
    rh, rw = h // 4, w // 4
    g = g[..., : rh * 4, : rw * 4]
    means = g.reshape(*g.shape[:-2], 4, rh, 4, rw).mean(axis=(-3, -1))
    return jnp.maximum(0.0, 100.0 - jnp.std(means))


def evaluate_commercial_arrays(
    image: jax.Array,
    roi_regions: Optional[List[Dict[str, Any]]] = None,
) -> Dict[str, jax.Array]:
    """Full commercial evaluation (reference: qa:814-852 orchestration,
    :1173-1193 score). ROI slicing happens here on the host (bboxes are
    data-dependent); all math on device."""
    metrics: Dict[str, jax.Array] = {}
    h, w = int(image.shape[-3]), int(image.shape[-2])

    metrics["global_sharpness"] = sharpness(image)
    metrics["high_frequency_ratio"] = hf_ratio(image)

    def _roi_crop(bbox: Sequence[int]) -> Optional[jax.Array]:
        x, y, rw, rh = bbox
        x, y = max(0, int(x)), max(0, int(y))
        rw, rh = min(int(rw), w - x), min(int(rh), h - y)
        if rw <= 0 or rh <= 0:
            return None
        return image[..., y : y + rh, x : x + rw, :]

    if roi_regions:
        for i, roi in enumerate(roi_regions):
            roi_type = roi.get("type", f"roi_{i}")
            crop = _roi_crop(roi.get("bbox", [0, 0, w, h]))
            if crop is None:
                continue
            if roi_type == "text":
                metrics[f"text_sharpness_{i}"] = sharpness(crop)
                metrics[f"text_contrast_{i}"] = contrast(crop)
            elif roi_type == "product":
                metrics[f"product_texture_{i}"] = texture_score(crop)
            elif roi_type == "face":
                metrics[f"face_naturalness_{i}"] = face_naturalness(crop)
                metrics[f"skin_tone_naturalness_{i}"] = skin_tone_naturalness(crop)
            if roi_type == "brand" and roi.get("reference_color") is not None:
                metrics[f"brand_color_delta_e_{i}"] = delta_e(
                    crop, jnp.asarray(np.array(roi["reference_color"], np.float32))
                )

    metrics["color_variance"] = color_variance(image)
    metrics["oversharpen_score"] = oversharpen_score(image)
    metrics["artifact_score"] = artifact_score(image)
    metrics["noise_level"] = noise_level(image)
    metrics["brightness_uniformity"] = brightness_uniformity(image)

    # Commercial score (reference: qa:1173-1193).
    scores = [
        jnp.minimum(100.0, metrics["global_sharpness"] / 10.0),
        jnp.minimum(100.0, metrics["high_frequency_ratio"] * 500.0),
        metrics["oversharpen_score"],
        metrics["artifact_score"],
    ]
    metrics["commercial_score"] = jnp.mean(jnp.stack(scores))
    return metrics
