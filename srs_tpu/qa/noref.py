"""No-reference quality metrics as jnp kernels.

Parity ports of the reference's built-in NIQE/BRISQUE fallbacks and
statistics (reference: quality_assessment_module.py:611-812): MSCN
coefficients via 7x7 Gaussian (sigma = 7/6) local stats, Sobel gradient
stats, Laplacian-variance sharpness, std contrast, Lab colorfulness.

The reference prefers pyiqa's pretrained NIQE/BRISQUE when installed and
falls back to these closed-form scores; this framework ships the
closed-form scores as the primary implementation (no pretrained NR models
on device) with identical formulas and clipping.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.colorspace import rgb_to_gray, rgb_to_lab
from ..ops.filters import gaussian_blur, laplacian, sobel

__all__ = [
    "mscn",
    "niqe",
    "brisque",
    "sharpness",
    "contrast",
    "colorfulness",
    "no_reference_metrics",
]


def _gray(image: jax.Array) -> jax.Array:
    if image.ndim >= 3 and image.shape[-1] in (1, 3):
        return rgb_to_gray(image) if image.shape[-1] == 3 else image[..., 0]
    return image


@jax.jit
def mscn(gray: jax.Array) -> jax.Array:
    """Mean-subtracted contrast-normalized coefficients, 7x7 Gaussian
    sigma=7/6, +1 stabilizer (reference: qa:637-650)."""
    g = gray.astype(jnp.float32)
    mu = gaussian_blur(g, 7, 7.0 / 6.0)
    sigma_sq = gaussian_blur(g * g, 7, 7.0 / 6.0) - mu * mu
    sigma = jnp.sqrt(jnp.maximum(sigma_sq, 0.0))
    return (g - mu) / (sigma + 1.0)


@jax.jit
def niqe(image: jax.Array) -> jax.Array:
    """Simplified NIQE (reference: qa:637-659): std+|mean| of MSCN mapped
    to [1, 15] via *2+3."""
    m = mscn(_gray(image))
    val = jnp.std(m) + jnp.abs(jnp.mean(m))
    return jnp.clip(val * 2.0 + 3.0, 1.0, 15.0)


@jax.jit
def brisque(image: jax.Array) -> jax.Array:
    """Simplified BRISQUE (reference: qa:687-719): mean of [MSCN mean, std,
    abs-mean, gradient-magnitude mean, std] * 10 + 20, clipped [0, 100]."""
    g = _gray(image).astype(jnp.float32)
    m = mscn(g)
    gx, gy = sobel(g)
    mag = jnp.sqrt(gx * gx + gy * gy)
    feats = jnp.stack(
        [jnp.mean(m), jnp.std(m), jnp.mean(jnp.abs(m)), jnp.mean(mag), jnp.std(mag)]
    )
    return jnp.clip(jnp.mean(feats) * 10.0 + 20.0, 0.0, 100.0)


@jax.jit
def sharpness(image: jax.Array) -> jax.Array:
    """Laplacian variance (reference: qa:773-784)."""
    return jnp.var(laplacian(_gray(image).astype(jnp.float32)))


@jax.jit
def contrast(image: jax.Array) -> jax.Array:
    """Grayscale std (reference: qa:786-796)."""
    return jnp.std(_gray(image).astype(jnp.float32))


@jax.jit
def colorfulness(image: jax.Array) -> jax.Array:
    """sqrt(std_a^2 + std_b^2) in Lab (reference: qa:798-812)."""
    lab = rgb_to_lab(image.astype(jnp.float32))
    return jnp.sqrt(jnp.var(lab[..., 1]) + jnp.var(lab[..., 2]))


def no_reference_metrics(image: jax.Array) -> Dict[str, jax.Array]:
    """All no-reference scalars in one pass (reference: qa:721-749)."""
    return {
        "niqe": niqe(image),
        "brisque": brisque(image),
        "sharpness": sharpness(image),
        "contrast": contrast(image),
        "colorfulness": colorfulness(image),
    }
