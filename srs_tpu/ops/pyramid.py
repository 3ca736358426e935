"""Gaussian / Laplacian pyramid kernels with OpenCV bit-parity semantics.

TPU-native replacement for the reference's cv2.pyrDown/pyrUp pyramid builders
(reference: blending_module.py:217-269 `build_gaussian_pyramid`, :271-318
`build_laplacian_pyramid`, :320-363 `collapse_laplacian_pyramid`).

Numerics match OpenCV exactly:
- 5-tap binomial kernel g = [1, 4, 6, 4, 1] / 16, separable;
- BORDER_REFLECT_101 (edge pixel not repeated) at all borders;
- pyrDown output size = ceil(n / 2), samples at even phase;
- pyrUp is the polyphase form of zero-stuff + conv with 4*k:
  even output = (src[i-1] + 6 src[i] + src[i+1]) / 8,
  odd  output = (src[i] + src[i+1]) / 2,
  with an explicit ``dst_size`` for odd-sized levels (cv2's dstsize arg).

Implemented as strided-slice shifted adds rather than `lax.conv` — these ops
are HBM-bandwidth-bound, and the 5-tap weighted sum fuses into a single VPU
pass under XLA without conv layout overhead. Works on (..., H, W, C) arrays;
all shapes static.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "pyr_down",
    "pyr_up",
    "build_gaussian_pyramid",
    "build_laplacian_pyramid",
    "collapse_laplacian_pyramid",
    "set_pallas_pyrdown",
]

# Route pyrDown/pyrUp through the Pallas MXU matmul kernels
# (ops/pallas/pyramid_pallas.py) when it fits VMEM. Off by default: the
# measured real-chip numbers (BENCH_LOCAL.md) show the XLA shifted-add
# path is already HBM-bandwidth-bound and the kernel only engages for
# <=~768 px planes (coarse pyramid levels), where both are sub-ms.
_PALLAS_PYRDOWN = os.environ.get("SRS_PALLAS_PYRDOWN", "0") == "1"


def set_pallas_pyrdown(enabled: bool) -> None:
    """Toggle the Pallas pyramid kernels (TPU only; no-op elsewhere)."""
    global _PALLAS_PYRDOWN
    _PALLAS_PYRDOWN = bool(enabled)


def _pallas_active() -> bool:
    return _PALLAS_PYRDOWN and jax.default_backend() == "tpu"

# Binomial taps as exact float32 fractions of 1/16.
_G = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _axis_hw(x: jax.Array) -> Tuple[int, int]:
    return x.ndim - 3, x.ndim - 2


def _reflect_pad(x: jax.Array, axis: int, lo: int, hi: int) -> jax.Array:
    pads = [(0, 0)] * x.ndim
    pads[axis] = (lo, hi)
    return jnp.pad(x, pads, mode="reflect")  # REFLECT_101 semantics


def _slice_axis(x: jax.Array, axis: int, start: int, limit: int, stride: int = 1):
    starts = [0] * x.ndim
    limits = list(x.shape)
    strides = [1] * x.ndim
    starts[axis], limits[axis], strides[axis] = start, limit, stride
    return jax.lax.slice(x, starts, limits, strides)


def _down_axis(x: jax.Array, axis: int) -> jax.Array:
    """Blur + even-phase decimate along one axis: out n' = ceil(n/2)."""
    n = x.shape[axis]
    m = (n + 1) // 2
    xp = _reflect_pad(x, axis, 2, 2)
    acc = None
    for k, g in enumerate(_G):
        s = _slice_axis(xp, axis, k, k + 2 * (m - 1) + 1, 2)
        acc = s * g if acc is None else acc + s * g
    return acc


def _up_axis(x: jax.Array, axis: int, out_n: int) -> jax.Array:
    """Polyphase 2x upsample along one axis to ``out_n`` samples.

    Border parity with cv2.pyrUp, which reflects the *zero-stuffed* signal:
    the left edge behaves as source REFLECT_101 (src[-1] = src[1]) while the
    right edge — whose reflection axis lands on an interleaved zero —
    behaves as source edge-replicate (src[n] = src[n-1]).
    """
    n = x.shape[axis]
    xp = _reflect_pad(x, axis, 1, 0)  # src[-1] = src[1]
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, 1)
    xp = jnp.pad(xp, pads, mode="edge")  # src[n] = src[n-1]
    left = _slice_axis(xp, axis, 0, n)       # src[i-1]
    mid = _slice_axis(xp, axis, 1, n + 1)    # src[i]
    right = _slice_axis(xp, axis, 2, n + 2)  # src[i+1]
    even = (left + 6.0 * mid + right) * 0.125
    odd = (mid + right) * 0.5
    if not (2 * n - 2 <= out_n <= 2 * n):
        raise ValueError(f"pyr_up dst size {out_n} incompatible with src {n}")
    from .interleave import interleave_axis

    return interleave_axis([even, odd], axis, out_n)


def _pyr_down_xla(x: jax.Array) -> jax.Array:
    """XLA shifted-add pyrDown (the default production path)."""
    ah, aw = _axis_hw(x)
    return _down_axis(_down_axis(x, ah), aw)


def pyr_down(x: jax.Array) -> jax.Array:
    """OpenCV-parity pyrDown on (..., H, W, C): blur + 2x decimate."""
    if _pallas_active():
        from .pallas.pyramid_pallas import pyr_down_fused

        return pyr_down_fused(x)
    return _pyr_down_xla(x)


def _pyr_up_xla(x: jax.Array, dst_hw: Tuple[int, int] | None = None) -> jax.Array:
    """XLA interleave+blur pyrUp (the default production path)."""
    ah, aw = _axis_hw(x)
    h, w = x.shape[ah], x.shape[aw]
    th, tw = dst_hw if dst_hw is not None else (2 * h, 2 * w)
    return _up_axis(_up_axis(x, ah, th), aw, tw)


def pyr_up(x: jax.Array, dst_hw: Tuple[int, int] | None = None) -> jax.Array:
    """OpenCV-parity pyrUp on (..., H, W, C) to ``dst_hw`` (default 2x)."""
    if _pallas_active() and x.ndim >= 3:
        from .pallas.pyramid_pallas import pyr_up_fused

        return pyr_up_fused(x, dst_hw)
    return _pyr_up_xla(x, dst_hw)


def build_gaussian_pyramid(x: jax.Array, levels: int) -> List[jax.Array]:
    """[G0..G_{L-1}], stopping early when a level drops below 2 px
    (parity with reference blending_module.py:250)."""
    pyr = [x]
    for _ in range(levels - 1):
        h, w = pyr[-1].shape[-3], pyr[-1].shape[-2]
        if min(h, w) < 2 or min((h + 1) // 2, (w + 1) // 2) < 2:
            break
        pyr.append(pyr_down(pyr[-1]))
    return pyr

def build_laplacian_pyramid(x: jax.Array, levels: int) -> List[jax.Array]:
    """[L0..L_{n-2}, G_{n-1}] with L_i = G_i - pyrUp(G_{i+1}, size(G_i))
    (parity with reference blending_module.py:271-318)."""
    gauss = build_gaussian_pyramid(x, levels)
    lap = []
    for i in range(len(gauss) - 1):
        hi, wi = gauss[i].shape[-3], gauss[i].shape[-2]
        lap.append(gauss[i] - pyr_up(gauss[i + 1], (hi, wi)))
    lap.append(gauss[-1])
    return lap


def collapse_laplacian_pyramid(lap: Sequence[jax.Array]) -> jax.Array:
    """Reconstruct: G_i = L_i + pyrUp(G_{i+1}) from coarsest to finest
    (parity with reference blending_module.py:320-363)."""
    x = lap[-1]
    for i in range(len(lap) - 2, -1, -1):
        hi, wi = lap[i].shape[-3], lap[i].shape[-2]
        x = lap[i] + pyr_up(x, (hi, wi))
    return x
