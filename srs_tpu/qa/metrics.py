"""Full-reference quality metrics as jnp kernels.

TPU-native port of the reference's full-reference path (reference:
quality_assessment_module.py:277-609): PSNR, windowed SSIM (skimage-style
gaussian weights sigma=1.5), the cv2.GaussianBlur-based simple-SSIM
fallback, the blending module's global-stats SSIM (compat mode for seam
detection, blending_module.py:855-903), true multi-scale MS-SSIM (an
upgrade the reference labels "ms_ssim" but computes single-scale), and the
multiscale downsample comparison (quality_assessment_module.py:518-555).

All kernels operate in the [0, 255] float domain (the reference preprocesses
to uint8) and reduce with plain jnp sums so they can run under shard_map
with psum reductions.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.colorspace import rgb_to_gray
from ..ops.filters import gaussian_blur
from ..ops.resize import resize_bicubic

__all__ = [
    "psnr",
    "ssim",
    "ssim_simple",
    "ssim_global",
    "ms_ssim",
    "downsample_comparison",
]

_C1 = (0.01 * 255.0) ** 2
_C2 = (0.03 * 255.0) ** 2


def _to_gray(x: jax.Array) -> jax.Array:
    if x.ndim >= 3 and x.shape[-1] == 3:
        return rgb_to_gray(x)
    if x.ndim >= 3 and x.shape[-1] == 1:
        return x[..., 0]
    return x


@jax.jit
def psnr(img1: jax.Array, img2: jax.Array, data_range: float = 255.0) -> jax.Array:
    """10*log10(range^2 / MSE); inf-safe (clamped to 100 dB at mse->0).

    Parity with reference quality_assessment_module.py:277-320.
    """
    mse = jnp.mean((img1.astype(jnp.float32) - img2.astype(jnp.float32)) ** 2)
    val = 10.0 * jnp.log10((data_range**2) / jnp.maximum(mse, 1e-10))
    return jnp.minimum(val, 100.0)


def _ssim_stats(x: jax.Array, y: jax.Array, blur) -> Tuple[jax.Array, ...]:
    mu1, mu2 = blur(x), blur(y)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(x * x) - mu1_sq
    s2 = blur(y * y) - mu2_sq
    s12 = blur(x * y) - mu12
    return mu1_sq, mu2_sq, mu12, s1, s2, s12


def _ssim_map(x, y, blur, c1=_C1, c2=_C2):
    mu1_sq, mu2_sq, mu12, s1, s2, s12 = _ssim_stats(x, y, blur)
    return ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))


@partial(jax.jit, static_argnames=("win", "crop"))
def ssim(
    img1: jax.Array,
    img2: jax.Array,
    sigma: float = 1.5,
    win: int = 11,
    crop: bool = True,
) -> jax.Array:
    """Gaussian-windowed SSIM on grayscale, skimage ``gaussian_weights=True,
    sigma=1.5, use_sample_covariance=False`` semantics: 11x11 window
    (truncate 3.5), border crop of win//2 (parity with the reference's
    primary SSIM path, quality_assessment_module.py:322-389)."""
    x = _to_gray(img1).astype(jnp.float32)
    y = _to_gray(img2).astype(jnp.float32)
    blur = lambda a: gaussian_blur(a, win, sigma)
    m = _ssim_map(x, y, blur)
    if crop:
        r = win // 2
        m = m[..., r:-r, r:-r]
    return jnp.mean(m)


@jax.jit
def ssim_simple(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """The reference's fallback SSIM: cv2.GaussianBlur(11,11,1.5) local
    stats, full-map mean, no border crop
    (quality_assessment_module.py:391-417)."""
    x = _to_gray(img1).astype(jnp.float32)
    y = _to_gray(img2).astype(jnp.float32)
    blur = lambda a: gaussian_blur(a, 11, 1.5)
    return jnp.mean(_ssim_map(x, y, blur))


@jax.jit
def ssim_global(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Global-statistics SSIM (single window over the whole patch), parity
    with the blending module's `_compute_ssim`
    (blending_module.py:855-903) used for seam detection."""
    x = _to_gray(img1).astype(jnp.float32)
    y = _to_gray(img2).astype(jnp.float32)
    mu1, mu2 = jnp.mean(x), jnp.mean(y)
    v1, v2 = jnp.var(x), jnp.var(y)
    cov = jnp.mean((x - mu1) * (y - mu2))
    return ((2 * mu1 * mu2 + _C1) * (2 * cov + _C2)) / (
        (mu1**2 + mu2**2 + _C1) * (v1 + v2 + _C2)
    )


# Wang et al. MS-SSIM weights (5 scales).
_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@partial(jax.jit, static_argnames=("levels",))
def ms_ssim(img1: jax.Array, img2: jax.Array, levels: int = 5) -> jax.Array:
    """True multi-scale SSIM (Wang et al. 2003), 2x dyadic downsampling by
    mean pooling. The reference labels a single-scale gaussian SSIM as
    "ms_ssim"; this is the faithful metric, exposed separately while
    :class:`~srs_tpu.qa.module.QualityAssessmentModule` keeps report
    parity."""
    x = _to_gray(img1).astype(jnp.float32)
    y = _to_gray(img2).astype(jnp.float32)
    weights = _MSSSIM_WEIGHTS[:levels]
    blur = lambda a: gaussian_blur(a, 11, 1.5)
    vals = []
    for lv in range(levels):
        mu1_sq, mu2_sq, mu12, s1, s2, s12 = _ssim_stats(x, y, blur)
        cs = jnp.mean((2 * s12 + _C2) / (s1 + s2 + _C2))
        if lv == levels - 1:
            ssim_l = jnp.mean(
                ((2 * mu12 + _C1) * (2 * s12 + _C2))
                / ((mu1_sq + mu2_sq + _C1) * (s1 + s2 + _C2))
            )
            vals.append(jnp.maximum(ssim_l, 0.0))
        else:
            vals.append(jnp.maximum(cs, 0.0))
            h, w = x.shape[-2] // 2 * 2, x.shape[-1] // 2 * 2
            x = x[..., :h, :w].reshape(*x.shape[:-2], h // 2, 2, w // 2, 2).mean((-3, -1))
            y = y[..., :h, :w].reshape(*y.shape[:-2], h // 2, 2, w // 2, 2).mean((-3, -1))
    out = jnp.asarray(1.0)
    for v, wgt in zip(vals, weights):
        out = out * v**wgt
    return out


def downsample_comparison(
    original: jax.Array,
    upscaled: jax.Array,
    scale_factors: Sequence[float] = (0.1, 0.2, 0.4),
    scale_names: Dict[float, str] | None = None,
) -> Dict[str, jax.Array]:
    """Multiscale downsample comparison (reference:
    quality_assessment_module.py:518-555): bicubic-downsample both images to
    each scale of the *respective* source size, crop to common size, and
    score PSNR + single-scale SSIM."""
    if scale_names is None:
        scale_names = {0.1: "structure_color", 0.2: "mid_frequency", 0.4: "high_frequency"}
    oh, ow = original.shape[-3], original.shape[-2]
    uh, uw = upscaled.shape[-3], upscaled.shape[-2]
    out: Dict[str, jax.Array] = {}
    for s in scale_factors:
        name = scale_names.get(s, f"scale_{s}")
        d_hr = resize_bicubic(original, int(oh * s), int(ow * s))
        d_sr = resize_bicubic(upscaled, int(uh * s), int(uw * s))
        mh = min(d_hr.shape[-3], d_sr.shape[-3])
        mw = min(d_hr.shape[-2], d_sr.shape[-2])
        d_hr, d_sr = d_hr[..., :mh, :mw, :], d_sr[..., :mh, :mw, :]
        out[f"psnr_{name}"] = psnr(d_hr, d_sr)
        out[f"ssim_{name}"] = ssim(d_hr, d_sr)
    return out
