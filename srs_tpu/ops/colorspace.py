"""Color space conversions matching OpenCV's 8-bit conventions.

The reference converts via cv2.cvtColor throughout QA and blending
(RGB2GRAY / RGB2LAB / RGB2YCrCb, e.g. quality_assessment_module.py:798-812,
936-953, 1001-1074). Inputs here are float arrays in the [0, 255] domain
(the reference preprocesses everything to uint8); outputs match cv2's
8-bit-scaled channels (Lab: L*255/100, a/b + 128; YCrCb offset 128).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rgb_to_gray", "rgb_to_lab", "rgb_to_ycrcb"]


def rgb_to_gray(rgb: jax.Array) -> jax.Array:
    """cv2 RGB2GRAY: 0.299 R + 0.587 G + 0.114 B, on (..., 3) -> (...)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def _f_lab(t: jax.Array) -> jax.Array:
    d = 6.0 / 29.0
    return jnp.where(t > d**3, jnp.cbrt(t), t / (3 * d * d) + 4.0 / 29.0)


def rgb_to_lab(rgb: jax.Array) -> jax.Array:
    """cv2 RGB2LAB 8-bit convention on (..., 3) in [0,255].

    sRGB (D65, linearized) -> XYZ -> CIELAB, then L scaled by 255/100 and
    a/b offset by +128 (cv2's 8-bit packing).
    """
    x = rgb / 255.0
    lin = jnp.where(x > 0.04045, ((x + 0.055) / 1.055) ** 2.4, x / 12.92)
    r, g, b = lin[..., 0], lin[..., 1], lin[..., 2]
    X = 0.412453 * r + 0.357580 * g + 0.180423 * b
    Y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    Z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    # D65 white point
    fx = _f_lab(X / 0.950456)
    fy = _f_lab(Y)
    fz = _f_lab(Z / 1.088754)
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    bb = 200.0 * (fy - fz)
    return jnp.stack([L * (255.0 / 100.0), a + 128.0, bb + 128.0], axis=-1)


def rgb_to_ycrcb(rgb: jax.Array) -> jax.Array:
    """cv2 RGB2YCrCb 8-bit convention on (..., 3) in [0,255]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cr = (r - y) * 0.713 + 128.0
    cb = (b - y) * 0.564 + 128.0
    return jnp.stack([y, cr, cb], axis=-1)
