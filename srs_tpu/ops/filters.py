"""Separable filter primitives with OpenCV-parity numerics.

Building blocks for the QA metrics and seam/color ops (reference uses
cv2.GaussianBlur / cv2.blur / cv2.Sobel / cv2.Laplacian / cv2.Canny all
over quality_assessment_module.py and blending_module.py). All are
shifted-slice separable convolutions over REFLECT_101 borders — VPU-bound,
fully fusable, static shapes.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gaussian_kernel1d",
    "gaussian_blur",
    "box_blur",
    "sobel",
    "laplacian",
    "canny_edges",
    "sep_filter",
]


@lru_cache(maxsize=32)
def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel parity for sigma > 0."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8  # cv2's default rule
    i = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(i * i) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _conv_axis(x: jax.Array, taps: np.ndarray, axis: int) -> jax.Array:
    """1-D convolution along ``axis`` with REFLECT_101 padding."""
    r = len(taps) // 2
    pads = [(0, 0)] * x.ndim
    pads[axis] = (r, r)
    xp = jnp.pad(x, pads, mode="reflect")
    n = x.shape[axis]
    acc = None
    for k, t in enumerate(taps):
        starts = [0] * x.ndim
        limits = list(xp.shape)
        starts[axis] = k
        limits[axis] = k + n
        s = jax.lax.slice(xp, starts, limits)
        term = s * np.float32(t)
        acc = term if acc is None else acc + term
    return acc


def sep_filter(x: jax.Array, taps_y: np.ndarray, taps_x: np.ndarray) -> jax.Array:
    """Separable 2-D filter over the last two (H, W) axes of (..., H, W)."""
    ah, aw = x.ndim - 2, x.ndim - 1
    return _conv_axis(_conv_axis(x, taps_y, ah), taps_x, aw)


def gaussian_blur(x: jax.Array, ksize: int, sigma: float) -> jax.Array:
    """cv2.GaussianBlur parity on (..., H, W) with BORDER_REFLECT_101."""
    k = gaussian_kernel1d(ksize, sigma)
    return sep_filter(x, k, k)


def box_blur(x: jax.Array, ksize: int) -> jax.Array:
    """cv2.blur parity (normalized box, REFLECT_101) on (..., H, W)."""
    k = np.full(ksize, 1.0 / ksize, np.float32)
    return sep_filter(x, k, k)


def sobel(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """cv2.Sobel ksize=3 parity: (gx, gy) on (..., H, W)."""
    d = np.array([-1.0, 0.0, 1.0], np.float32)
    s = np.array([1.0, 2.0, 1.0], np.float32)
    ah, aw = x.ndim - 2, x.ndim - 1
    gx = _conv_axis(_conv_axis(x, s, ah), d, aw)
    gy = _conv_axis(_conv_axis(x, d, ah), s, aw)
    return gx, gy


def laplacian(x: jax.Array) -> jax.Array:
    """cv2.Laplacian ksize=1 parity: 4-neighbor kernel [[0,1,0],[1,-4,1],[0,1,0]]."""
    ah, aw = x.ndim - 2, x.ndim - 1
    k = np.array([1.0, -2.0, 1.0], np.float32)
    return _conv_axis(x, k, ah) + _conv_axis(x, k, aw)


def canny_edges(
    x: jax.Array,
    low: float = 50.0,
    high: float = 150.0,
    hysteresis_iters: int = 8,
) -> jax.Array:
    """Approximate cv2.Canny on (..., H, W) in [0, 255].

    Sobel gradients -> L1 magnitude (cv2 default) -> 4-direction non-max
    suppression -> double threshold -> fixed-iteration hysteresis by
    max-pool propagation from strong to weak edges. Not bit-identical to
    cv2's queue-based hysteresis but converges to it for
    ``hysteresis_iters`` large enough; edge *density* (what the reference
    consumes at quality_assessment_module.py:1094-1108) matches closely.
    Returns a {0,1} float mask.
    """
    gx, gy = sobel(x)
    mag = jnp.abs(gx) + jnp.abs(gy)

    # Quantize direction into 4 bins (0, 45, 90, 135 degrees).
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    tan22 = 0.4142135623730951
    tan67 = 2.414213562373095
    horiz = ay <= ax * tan22
    vert = ay >= ax * tan67
    diag = (~horiz) & (~vert)
    same_sign = (gx * gy) >= 0

    def shift(a, dy, dx):
        return jnp.roll(jnp.roll(a, dy, axis=-2), dx, axis=-1)

    # Neighbors along the gradient direction.
    n1 = jnp.where(
        horiz, shift(mag, 0, 1),
        jnp.where(
            vert, shift(mag, 1, 0),
            jnp.where(same_sign, shift(mag, 1, 1), shift(mag, 1, -1)),
        ),
    )
    n2 = jnp.where(
        horiz, shift(mag, 0, -1),
        jnp.where(
            vert, shift(mag, -1, 0),
            jnp.where(same_sign, shift(mag, -1, -1), shift(mag, -1, 1)),
        ),
    )
    del diag
    is_max = (mag >= n1) & (mag >= n2)
    strong = is_max & (mag > high)
    weak = is_max & (mag > low)

    def dilate(m):
        out = m
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    out = jnp.maximum(out, shift(m, dy, dx))
        return out

    edges = strong.astype(jnp.float32)
    weak_f = weak.astype(jnp.float32)

    def body(_, e):
        return jnp.minimum(dilate(e), weak_f)

    edges = jax.lax.fori_loop(0, hysteresis_iters, body, edges)
    return jnp.maximum(edges, strong.astype(jnp.float32))
