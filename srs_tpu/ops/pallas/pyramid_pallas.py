"""Pallas TPU kernels for the pyramid hot path.

The XLA path (srs_tpu.ops.pyramid) lowers pyrDown to two shifted-add
passes (H then V) with an HBM-resident intermediate. This kernel computes
the whole pyrDown as two MXU matmuls per plane:

    out = D_v @ X @ D_w^T

where D_v [H/2, H] and D_w [W/2, W] are banded decimation matrices that
fold the 5-tap binomial blur, the stride-2 sampling AND the REFLECT_101
border handling into constant operands (built once per shape in numpy).
One read of X, one write of the 4x-smaller output, all arithmetic on the
systolic array — the VPU formulation needs strided slices that Mosaic
cannot lower, and the MXU has idle capacity in this bandwidth-bound stage
anyway. Numerics match cv2 (same tap order along each band; interleaved
zeros contribute exactly 0).

Operates on [B, H, W] planes (channels folded into B by the wrapper) so
the lane dimension is W.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pyr_down_pallas",
    "pyr_down_fused",
    "decimation_matrix",
    "pyr_up_pallas",
    "pyr_up_fused",
    "interpolation_matrix",
]

_G = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _reflect101(j: int, n: int) -> int:
    if n == 1:
        return 0
    period = 2 * (n - 1)
    j = abs(j) % period
    return period - j if j >= n else j


@lru_cache(maxsize=32)
def decimation_matrix(n: int) -> np.ndarray:
    """[ceil(n/2), n] matrix: 5-tap blur + even-phase decimate + REFLECT_101."""
    m = (n + 1) // 2
    d = np.zeros((m, n), np.float32)
    for i in range(m):
        for k, g in enumerate(_G):
            j = _reflect101(2 * i + k - 2, n)
            d[i, j] += np.float32(g)
    return d


def _pyr_down_kernel(in_ref, dv_ref, dw_ref, out_ref):
    x = in_ref[0]  # [H, W]
    tmp = jnp.dot(dv_ref[:], x, preferred_element_type=jnp.float32)  # [m_h, W]
    out_ref[0] = jnp.dot(tmp, dw_ref[:].T, preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("interpret",))
def pyr_down_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Fused pyrDown on [B, H, W] float32 planes (cv2 parity)."""
    b, h, w = x.shape
    m_h, m_w = (h + 1) // 2, (w + 1) // 2
    dv = jnp.asarray(decimation_matrix(h))
    dw = jnp.asarray(decimation_matrix(w))
    return pl.pallas_call(
        _pyr_down_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m_h, m_w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m_h, m_w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (m_h * h * w + m_h * w * m_w),
            bytes_accessed=b * (h * w + m_h * m_w) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.astype(jnp.float32), dv, dw)


@lru_cache(maxsize=32)
def interpolation_matrix(m: int, n: int) -> np.ndarray:
    """[n, m] pyrUp matrix for one axis: zero-interleave x into a length-n
    grid (z[2j] = x[j]), blur with the doubled 5-tap binomial, REFLECT_101
    over the interleaved grid — cv2 pyrUp semantics incl. odd n."""
    u = np.zeros((n, m), np.float32)
    for i in range(n):
        for k, g in enumerate(_G):
            # reflect over the FULL zero-stuffed length 2m (cv2 truncates
            # to n afterwards — the right border does not move for odd n)
            j = _reflect101(i + k - 2, 2 * m)
            if j % 2 == 0 and j // 2 < m:
                u[i, j // 2] += np.float32(2.0 * g)
    return u


def _pyr_up_kernel(in_ref, uv_ref, uw_ref, out_ref):
    x = in_ref[0]  # [m_h, m_w]
    tmp = jnp.dot(uv_ref[:], x, preferred_element_type=jnp.float32)  # [n_h, m_w]
    out_ref[0] = jnp.dot(tmp, uw_ref[:].T, preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("n_h", "n_w", "interpret"))
def pyr_up_pallas(x: jax.Array, n_h: int, n_w: int, interpret: bool = False) -> jax.Array:
    """Fused pyrUp on [B, m_h, m_w] float32 planes to [B, n_h, n_w]
    (cv2 parity incl. odd destination sizes)."""
    b, m_h, m_w = x.shape
    uv = jnp.asarray(interpolation_matrix(m_h, n_h))
    uw = jnp.asarray(interpolation_matrix(m_w, n_w))
    return pl.pallas_call(
        _pyr_up_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, m_h, m_w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_h, m_h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_w, m_w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_h, n_w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_h, n_w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (n_h * m_h * m_w + n_h * m_w * n_w),
            bytes_accessed=b * (m_h * m_w + n_h * n_w) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.astype(jnp.float32), uv, uw)


def pyr_up_fused(
    x: jax.Array, dst_hw=None, interpret: bool = False
) -> jax.Array:
    """pyrUp on (..., H, W, C) to ``dst_hw`` (default 2x), channels folded
    into the grid. Falls back to the XLA path when the plane + matrices
    exceed a safe VMEM budget."""
    from ..pyramid import _pyr_up_xla

    *lead, m_h, m_w, c = x.shape
    n_h, n_w = dst_hw if dst_hw is not None else (2 * m_h, 2 * m_w)
    # double-buffered in/out blocks + resident matrices + matmul temp
    vmem_bytes = (
        2 * (m_h * m_w + n_h * n_w) + n_h * m_h + n_w * m_w + n_h * m_w
    ) * 4
    if vmem_bytes > 13 * 1024 * 1024 or min(m_h, m_w) < 8:
        return _pyr_up_xla(x, (n_h, n_w))
    planes = jnp.moveaxis(x, -1, 0).reshape(-1, m_h, m_w).astype(jnp.float32)
    out = pyr_up_pallas(planes, n_h, n_w, interpret=interpret)
    out = out.reshape(c, *lead, n_h, n_w)
    return jnp.moveaxis(out, 0, -1)


def pyr_down_fused(x: jax.Array, interpret: bool = False) -> jax.Array:
    """pyrDown on (..., H, W, C): channels folded into the grid so the
    kernel's lane dimension is W. Falls back to the XLA path when the
    plane + decimation matrices exceed a safe VMEM budget."""
    from ..pyramid import _pyr_down_xla

    *lead, h, w, c = x.shape
    m_h_, m_w_ = (h + 1) // 2, (w + 1) // 2
    # double-buffered in/out blocks + resident matrices + matmul temp
    vmem_bytes = (2 * (h * w + m_h_ * m_w_) + m_h_ * h + m_w_ * w + m_h_ * w) * 4
    if vmem_bytes > 13 * 1024 * 1024 or min(h, w) < 8:
        return _pyr_down_xla(x)
    planes = jnp.moveaxis(x, -1, 0).reshape(-1, h, w).astype(jnp.float32)
    out = pyr_down_pallas(planes, interpret=interpret)
    m_h, m_w = (h + 1) // 2, (w + 1) // 2
    out = out.reshape(c, *lead, m_h, m_w)
    return jnp.moveaxis(out, 0, -1)
