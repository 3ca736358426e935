"""Bicubic resize as XLA array programs, cv2.resize(INTER_CUBIC) parity.

The reference leans on cv2.resize bicubic in two places: per-tile upsampling
fallbacks and the QA multiscale downsample comparison (reference:
quality_assessment_module.py:226-253 `downsample_bicubic`). The on-device SR
models also use bicubic as their base interpolation (residual-learning
head start), so this op is on the hot path.

Two implementations:
- :func:`resize_bicubic_up` — integer-factor upscale via polyphase shifted
  slices: ``scale`` phases x 4 taps of statically-shifted slices with
  constant weights, interleaved. Pure VPU adds, no gather; fuses under jit.
- :func:`resize_bicubic` — arbitrary target size via per-axis 4-tap gather
  (jnp.take); used by QA where exact cv2 parity at rational scales matters.

Kernel: Keys cubic with a = -0.75 (cv2's choice), source coordinate mapping
``src = (dst + 0.5) / scale - 0.5``, replicate-clamped borders — all
matching cv2.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["cubic_weights", "resize_bicubic", "resize_bicubic_up", "resize_bicubic_banded"]

_A = -0.75  # cv2's bicubic coefficient


def cubic_weights(f: np.ndarray) -> np.ndarray:
    """4 Keys-cubic taps (a=-0.75) for fractional offsets ``f`` in [0,1).

    Returns (..., 4) weights for source samples at floor-1, floor, floor+1,
    floor+2 — identical to OpenCV's interpolateCubic table generator.
    """
    f = np.asarray(f, dtype=np.float64)
    a = _A
    w0 = ((a * (f + 1) - 5 * a) * (f + 1) + 8 * a) * (f + 1) - 4 * a
    w1 = ((a + 2) * f - (a + 3)) * f * f + 1
    w2 = ((a + 2) * (1 - f) - (a + 3)) * (1 - f) * (1 - f) + 1
    w3 = 1.0 - w0 - w1 - w2  # cv2 normalizes the last tap
    return np.stack([w0, w1, w2, w3], axis=-1).astype(np.float32)


@lru_cache(maxsize=64)
def _axis_plan(src_n: int, dst_n: int) -> Tuple[np.ndarray, np.ndarray]:
    """(idx (dst_n, 4) int32 clamped, w (dst_n, 4) f32) for one axis."""
    scale = src_n / dst_n
    dst = np.arange(dst_n, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    f = src - base
    w = cubic_weights(f)
    idx = base[:, None] + np.arange(-1, 3)[None, :]
    idx = np.clip(idx, 0, src_n - 1).astype(np.int32)
    return idx, w.astype(np.float32)


def _down_axis_int(x: jax.Array, axis: int, s: int) -> jax.Array:
    """Integer-factor bicubic decimation via 4 strided slices (no gather).

    For scale 1/s the source coordinate (i+0.5)s - 0.5 = s*i + (s-1)/2 has
    a *constant* fractional part, so there is a single polyphase phase:
    out[i] = sum_t w[t] * x[s*i + floor((s-1)/2) - 1 + t]. Gather-free,
    which matters on TPU where big gathers force channel-minor layouts.
    """
    n = x.shape[axis]
    m = n // s
    off = (s - 1) / 2.0
    base = int(np.floor(off))
    f = off - base
    w = cubic_weights(np.array([f]))[0]
    # tap source indices: s*i + base - 1 + t, clamped via edge padding
    pads = [(0, 0)] * x.ndim
    pads[axis] = (1, 2)  # covers t-1 at i=0 and t+2 at i=m-1
    xp = jnp.pad(x, pads, mode="edge")
    acc = None
    for t in range(4):
        start = base + t  # (-1 shifted by the 1-left pad)
        sl = _slice_take(xp, axis, start, m, s)
        term = sl * np.float32(w[t])
        acc = term if acc is None else acc + term
    return acc


def _slice_take(x: jax.Array, axis: int, start: int, count: int, stride: int) -> jax.Array:
    starts = [0] * x.ndim
    limits = list(x.shape)
    strides = [1] * x.ndim
    starts[axis] = start
    limits[axis] = start + (count - 1) * stride + 1
    strides[axis] = stride
    return jax.lax.slice(x, starts, limits, strides)


def _resize_axis(x: jax.Array, axis: int, dst_n: int) -> jax.Array:
    src_n = x.shape[axis]
    if src_n == dst_n:
        return x
    if src_n % dst_n == 0:
        return _down_axis_int(x, axis, src_n // dst_n)
    idx, w = _axis_plan(src_n, dst_n)
    taps = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=axis)
    new_shape = list(x.shape)
    new_shape[axis : axis + 1] = [dst_n, 4]
    taps = taps.reshape(new_shape)
    wshape = [1] * len(new_shape)
    wshape[axis], wshape[axis + 1] = dst_n, 4
    return jnp.sum(taps * jnp.asarray(w).reshape(wshape), axis=axis + 1)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bicubic(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Resize (..., H, W, C) to (..., out_h, out_w, C), cv2 INTER_CUBIC parity."""
    ah, aw = x.ndim - 3, x.ndim - 2
    return _resize_axis(_resize_axis(x, ah, out_h), aw, out_w)


@lru_cache(maxsize=16)
def _up_phases(scale: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-phase (offset (scale,) int, weights (scale, 4) f32) for upscale."""
    p = np.arange(scale, dtype=np.float64)
    src = (p + 0.5) / scale - 0.5
    base = np.floor(src).astype(np.int64)  # -1 or 0
    f = src - base
    return base.astype(np.int32), cubic_weights(f)


def _up_axis(x: jax.Array, axis: int, scale: int) -> jax.Array:
    n = x.shape[axis]
    base, w = _up_phases(scale)
    # Replicate-pad by 2 each side so every tap index base+k+{-1..2} is valid.
    pads = [(0, 0)] * x.ndim
    pads[axis] = (2, 2)
    xp = jnp.pad(x, pads, mode="edge")

    def tap_slice(off: int) -> jax.Array:
        starts = [0] * x.ndim
        limits = list(xp.shape)
        starts[axis] = 2 + off
        limits[axis] = 2 + off + n
        return jax.lax.slice(xp, starts, limits)

    phases = []
    for p in range(scale):
        acc = None
        for t in range(4):
            s = tap_slice(int(base[p]) + t - 1)
            term = s * np.float32(w[p, t])
            acc = term if acc is None else acc + term
        phases.append(acc)
    from .interleave import interleave_axis

    return interleave_axis(phases, axis)


@partial(jax.jit, static_argnames=("scale",))
def resize_bicubic_up(x: jax.Array, scale: int) -> jax.Array:
    """Integer-factor bicubic upscale of (..., H, W, C) via polyphase slices.

    Matches :func:`resize_bicubic` (and cv2) exactly for integer factors.
    """
    if scale == 1:
        return x
    ah, aw = x.ndim - 3, x.ndim - 2
    return _up_axis(_up_axis(x, ah, scale), aw, scale)




def _band_matrix(idx: np.ndarray, w: np.ndarray, src_n: int) -> np.ndarray:
    """Dense [out, src_n] resize operator from a 4-tap plan (MXU path:
    gathers execute at scalar speed on TPU; a banded matmul is ~free)."""
    out = idx.shape[0]
    r = np.zeros((out, src_n), np.float32)
    for t in range(4):
        r[np.arange(out), idx[:, t]] += w[:, t]
    return r


@lru_cache(maxsize=32)
def _w_block_plan(src_n: int, dst_n: int, block: int = 2048):
    """Column-blocked resize operators: (starts, src_b, out_b, R [nb, src_b, out_b]).

    A full [src_n, dst_n] operator at print width is ~0.5 GB; uniform
    column blocks keep each operator a few MB while staying one compiled
    program (static starts, unrolled)."""
    idx, w = _axis_plan(src_n, dst_n)
    nb = -(-dst_n // block)
    out_b = block
    spans = []
    for b in range(nb):
        o0, o1 = b * block, min((b + 1) * block, dst_n)
        rows = idx[o0:o1]
        spans.append((int(rows.min()), int(rows.max()) + 1))
    src_b = min(max(hi - lo for lo, hi in spans), src_n)
    starts = []
    mats = np.zeros((nb, src_b, out_b), np.float32)
    for b in range(nb):
        o0, o1 = b * block, min((b + 1) * block, dst_n)
        lo, hi = spans[b]
        start = min(lo, src_n - src_b)
        starts.append(start)
        rel = idx[o0:o1] - start
        r = _band_matrix(rel, w[o0:o1], src_b)  # [o1-o0, src_b]
        mats[b, :, : o1 - o0] = r.T
    return tuple(starts), src_b, out_b, mats


def _resize_w_blocked(x: jax.Array, dst_n: int, mats: jax.Array, starts, src_b: int,
                      out_b: int) -> jax.Array:
    """W-axis resize of (H, W, C) via unrolled static-slice matmuls."""
    h, _, c = x.shape
    outs = []
    for b, start in enumerate(starts):
        src = jax.lax.slice(x, (0, start, 0), (h, start + src_b, c))
        outs.append(jnp.einsum(
            "hjc,jo->hoc", src, mats[b], precision=jax.lax.Precision.HIGHEST
        ))
    out = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    return jax.lax.slice(out, (0, 0, 0), (h, dst_n, c))


@partial(jax.jit, static_argnames=("src_h0", "band_src_h", "band_out_h", "out_w", "to_uint8"))
def _resize_band(
    x: jax.Array,
    src_start: jax.Array,
    r_h: jax.Array,
    src_h0: int,
    band_src_h: int,
    band_out_h: int,
    out_w: int,
    to_uint8: bool,
) -> jax.Array:
    """One output row band: dynamic source slice + 4-tap combines."""
    src = jax.lax.dynamic_slice(
        x, (src_start, 0, 0), (band_src_h, x.shape[1], x.shape[2])
    )
    # Vertical taps as one banded matmul (r_h [out, band_src_h]); gathers
    # run at scalar speed on TPU, matmuls on the MXU.
    rows = jnp.einsum("oj,jwc->owc", r_h, src, precision=jax.lax.Precision.HIGHEST)
    src_w = x.shape[1]
    if src_w == out_w:
        out = rows
    elif src_w % out_w == 0:
        out = _down_axis_int(rows, 1, src_w // out_w)
    else:
        starts, src_b, out_b, mats = _w_block_plan(src_w, out_w)
        out = _resize_w_blocked(rows, out_w, jnp.asarray(mats), starts, src_b, out_b)
    if to_uint8 == "uint16":
        return jnp.clip(jnp.round(out * 257.0), 0, 65535).astype(jnp.uint16)
    if to_uint8:
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out


def resize_bicubic_banded(
    x: jax.Array,
    out_h: int,
    out_w: int,
    bands: int = 8,
    crop_h: Optional[int] = None,
    crop_w: Optional[int] = None,
    to_uint8: bool = False,
    as_iterator: bool = False,
    as_device: bool = False,
):
    """Print-grade resize: (H, W, C) -> host np array (out_h, out_w, C).

    Giant single-program resizes of 100-200 MP canvases compile for
    minutes and materialize 4x-tap gathers; this splits the OUTPUT into
    uniform row bands so one small program is compiled once and executed
    per band, optionally fusing crop (unpad), clip and uint8 quantization.
    Matches cv2 INTER_CUBIC like :func:`resize_bicubic` (same tap plans).
    Each band is fetched to host as it finishes (pipelines with the
    ~30 MB/s device link).
    """
    src_h = crop_h if crop_h is not None else x.shape[0]
    src_w = crop_w if crop_w is not None else x.shape[1]
    if crop_w is not None and crop_w != x.shape[1]:
        x = x[:, :crop_w]
    band_out_h = -(-out_h // bands)
    idx_full, w_full = _axis_plan(src_h, out_h)
    # pad the plan to bands*band_out_h rows (extra rows recompute the last)
    total = bands * band_out_h
    pad = total - out_h
    if pad:
        idx_full = np.concatenate([idx_full, np.repeat(idx_full[-1:], pad, 0)])
        w_full = np.concatenate([w_full, np.repeat(w_full[-1:], pad, 0)])
    # uniform source band height covering any band's tap span
    spans = []
    for b in range(bands):
        rows = idx_full[b * band_out_h : (b + 1) * band_out_h]
        spans.append((int(rows.min()), int(rows.max())))
    band_src_h = max(hi - lo + 1 for lo, hi in spans)
    band_src_h = min(band_src_h, x.shape[0])
    handles = []
    for b in range(bands):
        lo, hi = spans[b]
        start = min(lo, x.shape[0] - band_src_h)
        rows = idx_full[b * band_out_h : (b + 1) * band_out_h] - start
        r_h = _band_matrix(rows, w_full[b * band_out_h : (b + 1) * band_out_h], band_src_h)
        handles.append(_resize_band(
            x,
            jnp.int32(start),
            jnp.asarray(r_h),
            src_h,
            band_src_h,
            band_out_h,
            out_w,
            to_uint8,
        ))

    if as_device:
        return jnp.concatenate(handles, axis=0)[:out_h]

    def bands_iter():
        # Start every device->host copy up front so band b+1's transfer
        # rides the link while band b is consumed on host.
        for hnd in handles:
            try:
                hnd.copy_to_host_async()
            except Exception:
                break
        remaining = out_h
        for hnd in handles:
            arr = np.asarray(hnd)
            take = min(band_out_h, remaining)
            remaining -= take
            yield arr[:take]

    if as_iterator:
        return bands_iter()
    _dt = np.uint16 if to_uint8 == "uint16" else (np.uint8 if to_uint8 else np.float32)
    out_np = np.empty((out_h, out_w, x.shape[2]), _dt)
    r = 0
    for arr in bands_iter():
        out_np[r : r + arr.shape[0]] = arr
        r += arr.shape[0]
    return out_np
