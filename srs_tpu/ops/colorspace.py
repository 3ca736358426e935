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


# -- ICC-style working-space conversion (host-side export path) -------------
# The reference's result page offers sRGB/AdobeRGB/ProPhoto export selectors
# that do nothing (reference: pages/result_page.py:115-178 mock export);
# these are the real conversions for the export re-encode. numpy on host:
# exports run on already-fetched bytes, not on device.

import numpy as np  # noqa: E402

_SRGB_TO_XYZ = np.array(
    [[0.4124564, 0.3575761, 0.1804375],
     [0.2126729, 0.7151522, 0.0721750],
     [0.0193339, 0.1191920, 0.9503041]], np.float64)
_XYZ_TO_ADOBE = np.array(
    [[2.0413690, -0.5649464, -0.3446944],
     [-0.9692660, 1.8760108, 0.0415560],
     [0.0134474, -0.1183897, 1.0154096]], np.float64)
_BRADFORD_D65_TO_D50 = np.array(
    [[1.0478112, 0.0228866, -0.0501270],
     [0.0295424, 0.9904844, -0.0170491],
     [-0.0092345, 0.0150436, 0.7521316]], np.float64)
_XYZ50_TO_PROPHOTO = np.array(
    [[1.3459433, -0.2556075, -0.0511118],
     [-0.5445989, 1.5081673, 0.0205351],
     [0.0000000, 0.0000000, 1.2118128]], np.float64)


def _srgb_decode(c: np.ndarray) -> np.ndarray:
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def convert_profile(rgb: np.ndarray, target: str) -> np.ndarray:
    """sRGB [0,255] float -> AdobeRGB / ProPhoto [0,255] float.

    Relative colorimetric: linearize sRGB, matrix to XYZ (D65), adapt to
    the target white point where needed (Bradford), matrix to the target
    primaries, apply the target encoding gamma (AdobeRGB 563/256,
    ProPhoto 1.8)."""
    if target in ("sRGB", "srgb", None, ""):
        return rgb
    lin = _srgb_decode(np.clip(np.asarray(rgb, np.float64) / 255.0, 0.0, 1.0))
    xyz = lin @ _SRGB_TO_XYZ.T
    if target.lower() in ("adobergb", "adobe", "adobe_rgb"):
        out = np.clip(xyz @ _XYZ_TO_ADOBE.T, 0.0, 1.0) ** (256.0 / 563.0)
    elif target.lower() in ("prophoto", "prophotorgb", "prophoto_rgb"):
        xyz50 = xyz @ _BRADFORD_D65_TO_D50.T
        out = np.clip(xyz50 @ _XYZ50_TO_PROPHOTO.T, 0.0, 1.0) ** (1.0 / 1.8)
    else:
        raise ValueError(f"unknown color space {target!r}")
    return (out * 255.0).astype(np.float32)


__all__.append("convert_profile")
