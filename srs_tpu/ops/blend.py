"""Tile fusion kernels: Laplacian, weighted, feather, gradient-domain, Poisson.

TPU-native rebuild of the reference's fusion algorithms (reference:
blending_module.py:369-506 `laplacian_fusion`, :563-659 `poisson_fusion`,
:661-760 `weighted_average_fusion`, :1245-1270 `multi_band_fusion`,
:1272-1375 `feather_blend`, :1377-1487 `gradient_domain_fusion`).

Design departures from the reference (all TPU-motivated):
- Tiles are one static-shape batch ``[N, B, B, C]``; every pyramid build /
  weighting / collapse is vectorized over N in a single XLA program instead
  of a Python loop over tiles (+ ThreadPoolExecutor, blending:1665-1705,
  which this subsumes).
- Gradient-domain reconstruction solves the actual Poisson equation with a
  DCT/FFT spectral solver instead of the reference's naive cumsum
  integration (a documented reference defect, SURVEY §7).
- Poisson (seamless-clone) fusion is a Jacobi relaxation kernel with a
  pyramid-coarse initial guess rather than a cv2.seamlessClone call.

The per-tile math of `laplacian_fusion` is parity with the reference:
weighted_tile = collapse(L_i(tile) * G_i(weight)), accumulated and
normalized by the level-0 weight sum, clipped to [0, 255].
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tiling.geometry import TileLayout
from .pyramid import (
    build_gaussian_pyramid,
    build_laplacian_pyramid,
    collapse_laplacian_pyramid,
    pyr_down,
    pyr_up,
)
from .tiles import merge_tiles

__all__ = [
    "laplacian_fusion_tiles",
    "blend_finalize_banded",
    "weighted_fusion_tiles",
    "gradient_domain_fusion_tiles",
    "poisson_solve_neumann",
    "seamless_clone",
    "seamless_clone_multigrid",
]


@partial(jax.jit, static_argnames=("levels", "clip"))
def _weighted_collapse(
    tiles: jax.Array, weights: jax.Array, levels: int, clip: bool
) -> jax.Array:
    """collapse(L_i(tile) * G_i(w)) for a [N,B,B,C] batch."""
    lap = build_laplacian_pyramid(tiles.astype(jnp.float32), levels)
    wpyr = build_gaussian_pyramid(weights[..., None].astype(jnp.float32), levels)
    weighted = [l * w for l, w in zip(lap, wpyr)]
    out = collapse_laplacian_pyramid(weighted)
    return out


def _v2(n: int) -> int:
    """2-adic valuation (number of trailing zero bits); 64 for n == 0."""
    if n == 0:
        return 64
    v = 0
    while n % 2 == 0:
        n //= 2
        v += 1
    return v


@partial(jax.jit, static_argnames=("levels", "padded_h", "padded_w"))
def _canvas_pyramid_blend(
    tiles: jax.Array,
    weights: jax.Array,
    positions: jax.Array,
    levels: int,
    padded_h: int,
    padded_w: int,
) -> jax.Array:
    """Textbook Burt-Adelson: accumulate weighted Laplacian levels into
    *canvas-level* pyramids, normalize per level, collapse once."""
    n, b = tiles.shape[0], tiles.shape[1]
    c = tiles.shape[-1]
    lap = build_laplacian_pyramid(tiles.astype(jnp.float32), levels)
    wpyr = build_gaussian_pyramid(weights[..., None].astype(jnp.float32), levels)
    canvas_lap = []
    ch, cw = padded_h, padded_w
    for i, (lv, wv) in enumerate(zip(lap, wpyr)):
        tb_h, tb_w = lv.shape[1], lv.shape[2]
        num = jnp.zeros((ch, cw, c), jnp.float32)
        den = jnp.zeros((ch, cw, 1), jnp.float32)
        pos_i = positions // (2**i)

        def step(carry, inp):
            num, den = carry
            l, w, p = inp
            npatch = jax.lax.dynamic_slice(num, (p[0], p[1], 0), (tb_h, tb_w, c))
            num2 = jax.lax.dynamic_update_slice(num, npatch + l * w, (p[0], p[1], 0))
            dpatch = jax.lax.dynamic_slice(den, (p[0], p[1], 0), (tb_h, tb_w, 1))
            den2 = jax.lax.dynamic_update_slice(den, dpatch + w, (p[0], p[1], 0))
            return (num2, den2), None

        (num, den), _ = jax.lax.scan(step, (num, den), (lv, wv, pos_i))
        canvas_lap.append(num / jnp.maximum(den, 1e-8))
        ch, cw = (ch + 1) // 2, (cw + 1) // 2
    return collapse_laplacian_pyramid(canvas_lap)


@partial(jax.jit, static_argnames=("levels",))
def _build_pyramids(tiles: jax.Array, weights: jax.Array, levels: int):
    lap = build_laplacian_pyramid(tiles.astype(jnp.float32), levels)
    wpyr = build_gaussian_pyramid(weights[..., None].astype(jnp.float32), levels)
    return tuple(lap), tuple(wpyr)


@partial(jax.jit, static_argnames=("ch", "cw"))
def _accumulate_level(
    lv: jax.Array, wv: jax.Array, pos: jax.Array, ch: int, cw: int
) -> jax.Array:
    tb_h, tb_w, c = lv.shape[1], lv.shape[2], lv.shape[3]
    num = jnp.zeros((ch, cw, c), jnp.float32)
    den = jnp.zeros((ch, cw, 1), jnp.float32)

    def step(carry, inp):
        num, den = carry
        l, w, p = inp
        npatch = jax.lax.dynamic_slice(num, (p[0], p[1], 0), (tb_h, tb_w, c))
        num2 = jax.lax.dynamic_update_slice(num, npatch + l * w, (p[0], p[1], 0))
        dpatch = jax.lax.dynamic_slice(den, (p[0], p[1], 0), (tb_h, tb_w, 1))
        den2 = jax.lax.dynamic_update_slice(den, dpatch + w, (p[0], p[1], 0))
        return (num2, den2), None

    (num, den), _ = jax.lax.scan(step, (num, den), (lv, wv, pos))
    return num / jnp.maximum(den, 1e-8)


@partial(jax.jit, static_argnames=("hw",))
def _collapse_step(lap_i: jax.Array, coarser: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    return lap_i + pyr_up(coarser, hw)


def _canvas_pyramid_blend_staged(
    tiles: jax.Array,
    weights: jax.Array,
    positions: jax.Array,
    levels: int,
    padded_h: int,
    padded_w: int,
) -> jax.Array:
    """The canvas-pyramid blend split into per-level programs.

    At 100-200 MP one fused program is too large for the TPU compiler
    (observed compile-helper OOM); staging keeps every compiled unit small
    at the cost of a few extra HBM round trips. Math identical to
    :func:`_canvas_pyramid_blend`.
    """
    lap, wpyr = _build_pyramids(tiles, weights, levels)
    canvas_lap = []
    ch, cw = padded_h, padded_w
    for i, (lv, wv) in enumerate(zip(lap, wpyr)):
        pos_i = positions // (2**i)
        canvas_lap.append(_accumulate_level(lv, wv, pos_i, ch, cw))
        ch, cw = (ch + 1) // 2, (cw + 1) // 2
    x = canvas_lap[-1]
    for i in range(len(canvas_lap) - 2, -1, -1):
        hw = (canvas_lap[i].shape[0], canvas_lap[i].shape[1])
        x = _collapse_step(canvas_lap[i], x, hw)
    return x


@partial(jax.jit, static_argnames=("levels",), donate_argnums=(0,))
def _build_gauss(tiles: jax.Array, levels: int):
    return tuple(build_gaussian_pyramid(tiles.astype(jnp.float32), levels))


@partial(jax.jit, static_argnames=("ch", "cw", "is_last"), donate_argnums=(0,))
def _accumulate_level_sep(
    g_i: jax.Array,
    g_next: jax.Array,
    wy: jax.Array,
    wx: jax.Array,
    pos: jax.Array,
    ch: int,
    cw: int,
    is_last: bool,
) -> jax.Array:
    """One canvas-pyramid level with on-the-fly Laplacian + separable
    weights: lap = G_i - pyrUp(G_{i+1}) computed inside, per-tile weight
    synthesized as outer(wy_t, wx_t) in the scan body (never a dense
    [N, B, B] array in HBM)."""
    tb_h, tb_w, c = g_i.shape[1], g_i.shape[2], g_i.shape[3]
    n = g_i.shape[0]
    lap = g_i if is_last else g_i - pyr_up(g_next, (tb_h, tb_w))
    num = jnp.zeros((ch, cw, c), jnp.float32)
    den = jnp.zeros((ch, cw, 1), jnp.float32)
    # Unrolled over the (small, static) tile count: a lax.scan whose carry
    # is a multi-GB canvas compiles pathologically on TPU; the unrolled
    # graph is tiny (4 dynamic ops per tile).
    for t in range(n):
        w = wy[t][:, None, None] * wx[t][None, :, None]  # [h, w, 1]
        p0, p1 = pos[t, 0], pos[t, 1]
        npatch = jax.lax.dynamic_slice(num, (p0, p1, 0), (tb_h, tb_w, c))
        num = jax.lax.dynamic_update_slice(num, npatch + lap[t] * w, (p0, p1, 0))
        dpatch = jax.lax.dynamic_slice(den, (p0, p1, 0), (tb_h, tb_w, 1))
        den = jax.lax.dynamic_update_slice(den, dpatch + w, (p0, p1, 0))
    return num / jnp.maximum(den, 1e-8)


def _canvas_pyramid_blend_profiles(
    tiles: jax.Array,
    wy: np.ndarray,
    wx: np.ndarray,
    positions: jax.Array,
    levels: int,
    padded_h: int,
    padded_w: int,
    collapse_last: bool = True,
):
    """HBM-lean canvas-pyramid blend for separable weights.

    vs the dense staged path: the tile batch is donated into its Gaussian
    pyramid, Laplacian levels are formed inside each per-level program
    (never all materialized), and weight pyramids live as [N, L] host
    vectors (1-D pyrDown of the profiles — exact, since the binomial
    kernel is separable). Peak HBM ~ Gauss pyramid (4/3 x batch) + one
    canvas level.
    """
    from .weights import profile_pyramid

    gauss = _build_gauss(tiles, levels)
    n_lv = len(gauss)
    py = profile_pyramid(wy, n_lv)
    px = profile_pyramid(wx, n_lv)
    canvas_lap = []
    ch, cw = padded_h, padded_w
    gauss = list(gauss)
    for i in range(n_lv):
        pos_i = positions // (2**i)
        is_last = i == n_lv - 1
        # never alias the donated g_i as g_next (unused when is_last)
        g_next = gauss[i + 1] if not is_last else jnp.zeros((1, 1, 1, tiles.shape[-1]), jnp.float32)
        canvas_lap.append(
            _accumulate_level_sep(
                gauss[i], g_next, jnp.asarray(py[i]), jnp.asarray(px[i]),
                pos_i, ch, cw, is_last,
            )
        )
        gauss[i] = None  # donated/consumed
        ch, cw = (ch + 1) // 2, (cw + 1) // 2
    x = canvas_lap[-1]
    stop = 1 if not collapse_last and len(canvas_lap) > 1 else 0
    for i in range(len(canvas_lap) - 2, stop - 1, -1):
        hw = (canvas_lap[i].shape[0], canvas_lap[i].shape[1])
        x = _collapse_step(canvas_lap[i], x, hw)
        canvas_lap[i] = None
    if stop:
        # caller finishes level 0 banded (blend_finalize_banded)
        return canvas_lap[0], x
    return x


# One fused program is faster for small canvases; beyond this pixel count
# the staged path keeps compile sizes sane.
_FUSED_BLEND_MAX_PIXELS = 16_000_000


def laplacian_fusion_tiles(
    tiles: jax.Array,
    weights: jax.Array | np.ndarray,
    layout: TileLayout,
    levels: int = 6,
    positions: jax.Array | None = None,
    clip_range: Optional[Tuple[float, float]] = (0.0, 255.0),
    mode: str = "canvas",
    weight_profiles: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    collapse_last: bool = True,
):
    """Burt-Adelson multiresolution blend over a tile batch.

    ``mode='canvas'`` (default): weighted Laplacian levels are accumulated
    into canvas-level pyramids with per-level weight normalization, then
    collapsed once — the mathematically consistent multiband blend (exact
    reconstruction when overlapping tiles agree). Requires tile positions
    aligned to 2^(levels-1) for dyadic-grid alignment; levels are clamped
    to the alignment the layout provides (see
    :func:`srs_tpu.tiling.geometry.compute_layout` ``step_multiple``).

    ``weight_profiles=(wy, wx)`` ([N, B] each, separable weights — ramp or
    content-aware) selects the HBM-lean path: the tile batch is DONATED
    (do not reuse it afterwards on TPU), Laplacian levels form on the fly
    and weight pyramids stay 1-D. Required for print-grade canvases.

    ``mode='reference'``: per-tile math parity with reference
    blending_module.py:369-506 — collapse(L_i(tile) * G_i(w)) accumulated
    on the canvas and normalized by the *level-0* weight sum. Faithful to
    the reference including its seam overshoot near weight ramps (the
    smoothed numerator is divided by unsmoothed weights).

    ``weights`` is [N, B, B] (:func:`srs_tpu.ops.weights.layout_weights`:
    'distance' for reference parity, 'ramp' for partition of unity);
    ignored when ``weight_profiles`` is given.
    """
    if positions is None:
        positions = jnp.asarray(layout.positions)
    if mode == "reference":
        weights = jnp.asarray(weights)
        weighted = _weighted_collapse(tiles, weights, levels, clip_range is not None)
        canvas = merge_tiles(weighted, weights, layout, positions, premultiplied=True)
    else:
        if layout.num_tiles > 1:
            align = min(_v2(int(p)) for p in np.asarray(layout.positions).reshape(-1) if int(p) != 0)
            # Clamp so (a) tile dyadic grids align with the canvas grid and
            # (b) the coarsest level's footprint (2^(L-1) px) stays well
            # inside the overlap band — reflected tile borders must carry
            # negligible weight (SURVEY §7 hard part #3).
            overlap_cap = max(1, int(np.log2(max(layout.overlap, 4))) - 1)
            levels = max(1, min(levels, align + 1, overlap_cap))
        if weight_profiles is not None:
            wy, wx = weight_profiles
            canvas = _canvas_pyramid_blend_profiles(
                tiles, wy, wx, positions, levels, layout.padded_h, layout.padded_w,
                collapse_last=collapse_last,
            )
            if not collapse_last:
                return canvas  # (lap0, coarse) pair for blend_finalize_banded
        else:
            weights = jnp.asarray(weights)
            blend_fn = (
                _canvas_pyramid_blend
                if layout.padded_h * layout.padded_w <= _FUSED_BLEND_MAX_PIXELS
                else _canvas_pyramid_blend_staged
            )
            canvas = blend_fn(
                tiles, weights, positions, levels, layout.padded_h, layout.padded_w
            )
    if clip_range is not None:
        canvas = jnp.clip(canvas, clip_range[0], clip_range[1])
    return canvas


def weighted_fusion_tiles(
    tiles: jax.Array,
    weights: jax.Array | np.ndarray,
    layout: TileLayout,
    positions: jax.Array | None = None,
    clip_range: Optional[Tuple[float, float]] = None,
) -> jax.Array:
    """Plain weighted-average fusion (reference blending:661-760) /
    feather blend (reference blending:1272-1375 — same math, weights built
    from the distance transform which for rectangular tiles equals the
    distance-to-edge map in :mod:`srs_tpu.ops.weights`)."""
    canvas = merge_tiles(tiles, weights, layout, positions)
    if clip_range is not None:
        canvas = jnp.clip(canvas, clip_range[0], clip_range[1])
    return canvas


# ---------------------------------------------------------------------------
# Spectral Poisson solver (gradient-domain reconstruction)
# ---------------------------------------------------------------------------


def _dct2(x: jax.Array, axis: int) -> jax.Array:
    """DCT-II along ``axis`` via FFT of the even extension (TPU-friendly)."""
    n = x.shape[axis]
    idx = jnp.arange(n)
    # Even-symmetric reordering trick: v = [x0, x2, ..., x3, x1]
    v = jnp.concatenate(
        [jnp.take(x, idx[::2], axis=axis), jnp.take(x, idx[1::2][::-1], axis=axis)],
        axis=axis,
    )
    V = jnp.fft.fft(v, axis=axis)
    k = jnp.arange(n, dtype=jnp.float32)
    shape = [1] * x.ndim
    shape[axis] = n
    w = 2.0 * jnp.exp(-1j * jnp.pi * k / (2 * n)).reshape(shape)
    return jnp.real(V * w)


def _idct2(X: jax.Array, axis: int) -> jax.Array:
    """Exact inverse of :func:`_dct2` (unnormalized DCT-II) along ``axis``.

    Reconstructs the FFT spectrum of the reordered signal from the DCT
    coefficients via V[k] = (X[k] - i X[(n-k) mod n]) / 2 * e^{i pi k / 2n}
    (with the k=0 imaginary part zeroed), inverse-FFTs, and undoes the
    even-odd reordering."""
    n = X.shape[axis]
    k = jnp.arange(n, dtype=jnp.float32)
    shape = [1] * X.ndim
    shape[axis] = n
    w = (0.5 * jnp.exp(1j * jnp.pi * k / (2 * n))).reshape(shape)
    rev_idx = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.arange(n - 1, 0, -1, dtype=jnp.int32)])
    Xshift = jnp.take(X, rev_idx, axis=axis)
    zero_mask = jnp.concatenate([jnp.zeros((1,)), jnp.ones((n - 1,))]).reshape(shape)
    V = (X - 1j * Xshift * zero_mask) * w
    v = jnp.real(jnp.fft.ifft(V, axis=axis))
    # Undo reordering: x[0::2] = v[:h], x[1::2] = v[h:][::-1].
    h = (n + 1) // 2
    out_idx_even = jnp.arange(h) * 2
    last_odd = n - 1 if n % 2 == 0 else n - 2
    out_idx_odd = last_odd - 2 * jnp.arange(n - h)
    out = jnp.zeros_like(v)
    out = out.at[
        tuple(slice(None) if a != axis else out_idx_even for a in range(v.ndim))
    ].set(jax.lax.slice_in_dim(v, 0, h, axis=axis))
    out = out.at[
        tuple(slice(None) if a != axis else out_idx_odd for a in range(v.ndim))
    ].set(jax.lax.slice_in_dim(v, h, n, axis=axis))
    return out


@jax.jit
def poisson_solve_neumann(div: jax.Array) -> jax.Array:
    """Solve lap(u) = div with homogeneous Neumann BC on (H, W[, C]).

    Spectral solve via DCT-II diagonalization of the 5-point Laplacian:
    eigenvalues 2cos(pi k / n) - 2 per axis. Mean (zero mode) is set to 0 —
    add the desired mean afterwards. O(HW log HW) on the TPU FFT unit; this
    replaces the reference's invalid cumsum integration
    (blending_module.py:1461-1487)."""
    squeeze = div.ndim == 2
    if squeeze:
        div = div[..., None]
    h, w = div.shape[0], div.shape[1]
    d = _dct2(_dct2(div, 0), 1)
    ky = 2.0 * jnp.cos(jnp.pi * jnp.arange(h) / h) - 2.0
    kx = 2.0 * jnp.cos(jnp.pi * jnp.arange(w) / w) - 2.0
    denom = ky[:, None, None] + kx[None, :, None]
    denom = jnp.where(denom == 0, 1.0, denom)
    u = d / denom
    u = u.at[0, 0, :].set(0.0)
    out = _idct2(_idct2(u, 0), 1)
    return out[..., 0] if squeeze else out


def gradient_domain_fusion_tiles(
    tiles: jax.Array,
    weights: jax.Array | np.ndarray,
    layout: TileLayout,
    positions: jax.Array | None = None,
    clip_range: Optional[Tuple[float, float]] = (0.0, 255.0),
) -> jax.Array:
    """Gradient-domain fusion: weighted-average the per-tile forward
    gradients on the canvas, then reconstruct by solving Poisson exactly
    (spectral). Replaces reference blending:1377-1487 whose cumsum
    "reconstruction" does not invert its gradient operator."""
    tiles = tiles.astype(jnp.float32)
    weights = jnp.asarray(weights)
    # Forward differences (zero at the last row/col).
    gx = jnp.diff(tiles, axis=2, append=tiles[:, :, -1:, :])
    gy = jnp.diff(tiles, axis=1, append=tiles[:, -1:, :, :])
    gx_c = merge_tiles(gx, weights, layout, positions)
    gy_c = merge_tiles(gy, weights, layout, positions)
    base = merge_tiles(tiles, weights, layout, positions)
    # Divergence via backward differences.
    div = (
        gx_c - jnp.concatenate([jnp.zeros_like(gx_c[:, :1]), gx_c[:, :-1]], axis=1)
        + gy_c - jnp.concatenate([jnp.zeros_like(gy_c[:1]), gy_c[:-1]], axis=0)
    )
    u = poisson_solve_neumann(div)
    u = u - jnp.mean(u, axis=(0, 1), keepdims=True) + jnp.mean(base, axis=(0, 1), keepdims=True)
    if clip_range is not None:
        u = jnp.clip(u, clip_range[0], clip_range[1])
    return u


# ---------------------------------------------------------------------------
# Seamless clone (Poisson editing)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("mode", "iters"))
def seamless_clone(
    dst: jax.Array,
    src: jax.Array,
    mask: jax.Array,
    mode: str = "normal",
    iters: int = 400,
) -> jax.Array:
    """cv2.seamlessClone equivalent on aligned (H, W, C) arrays.

    Solves lap(u) = div(g) inside ``mask`` with Dirichlet boundary = dst,
    where g is the source gradient field (``mode='normal'``) or the
    max-magnitude mix of source and destination gradients
    (``mode='mixed'``; reference blending_module.py:45-50, 563-625 uses
    cv2 NORMAL/MIXED). ``mode='monochrome'`` transfers the gray gradients
    of src. Jacobi relaxation with a fixed iteration count (static for
    XLA); 400 iterations converges visually for feather-scale masks.
    """
    dst = dst.astype(jnp.float32)
    src = src.astype(jnp.float32)
    m = (mask > 0).astype(jnp.float32)
    if m.ndim == 2:
        m = m[..., None]

    def grads(img):
        gx = jnp.diff(img, axis=1, append=img[:, -1:])
        gy = jnp.diff(img, axis=0, append=img[-1:])
        return gx, gy

    sx, sy = grads(src)
    if mode == "monochrome":
        gray = (0.299 * src[..., 0] + 0.587 * src[..., 1] + 0.114 * src[..., 2])[..., None]
        sx, sy = grads(jnp.broadcast_to(gray, src.shape))
    dx, dy = grads(dst)
    if mode == "mixed":
        sx = jnp.where(jnp.abs(dx) > jnp.abs(sx), dx, sx)
        sy = jnp.where(jnp.abs(dy) > jnp.abs(sy), dy, sy)

    div = (
        sx - jnp.concatenate([jnp.zeros_like(sx[:, :1]), sx[:, :-1]], axis=1)
        + sy - jnp.concatenate([jnp.zeros_like(sy[:1]), sy[:-1]], axis=0)
    )

    def shift(a, dy_, dx_):
        return jnp.roll(jnp.roll(a, dy_, axis=0), dx_, axis=1)

    u0 = dst * (1 - m) + src * m  # warm start

    def body(_, u):
        nb = shift(u, 1, 0) + shift(u, -1, 0) + shift(u, 0, 1) + shift(u, 0, -1)
        upd = (nb - div) * 0.25
        return dst * (1 - m) + upd * m

    return jax.lax.fori_loop(0, iters, body, u0)


@partial(
    jax.jit,
    static_argnames=("band_src_h", "band_coarse_h", "band_out_h", "out_w", "to_uint8"),
)
def _finalize_band(
    lap0: jax.Array,
    coarse: jax.Array,
    lap_start: jax.Array,
    coarse_start: jax.Array,
    up_offset: jax.Array,
    r_h: jax.Array,
    band_src_h: int,
    band_coarse_h: int,
    band_out_h: int,
    out_w: int,
    to_uint8: bool,
):
    """One output band of: collapse level-0 (lap0 + pyrUp(coarse)) ->
    vertical resize taps -> horizontal resize -> optional quantize."""
    c = lap0.shape[-1]
    lap_band = jax.lax.dynamic_slice(
        lap0, (lap_start, 0, 0), (band_src_h, lap0.shape[1], c)
    )
    coarse_band = jax.lax.dynamic_slice(
        coarse, (coarse_start, 0, 0), (band_coarse_h, coarse.shape[1], c)
    )
    # Upsample at the coarse level's full width, then cut to the (possibly
    # cropped) lap0 width — cropping coarse first would replace real
    # neighbor columns with border rules.
    up = pyr_up(coarse_band, (2 * band_coarse_h, 2 * coarse.shape[1]))
    up_band = jax.lax.dynamic_slice(
        up, (up_offset, 0, 0), (band_src_h, lap0.shape[1], c)
    )
    canvas_band = lap_band + up_band
    # Vertical taps as one banded matmul; W resize via blocked matmuls —
    # TPU gathers run at scalar speed, the MXU is idle here anyway.
    rows = jnp.einsum(
        "oj,jwc->owc", r_h, canvas_band, precision=jax.lax.Precision.HIGHEST
    )
    from .resize import _down_axis_int, _resize_w_blocked, _w_block_plan

    src_w = lap0.shape[1]
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


def blend_finalize_banded(
    lap0: jax.Array,
    coarse: jax.Array,
    out_h: int,
    out_w: int,
    bands: int = 8,
    crop_h: Optional[int] = None,
    crop_w: Optional[int] = None,
    to_uint8: bool = False,
    as_iterator: bool = False,
    as_device: bool = False,
):
    """Final pyramid collapse + exact-size resize + quantize, banded.

    The level-0 collapse of a 100-200 MP canvas is the single largest
    program in the pipeline (the TPU compile helper takes tens of minutes
    or dies on it); this fuses it with the output resize per uniform row
    band, so only one small program is compiled. ``lap0``/``coarse`` are
    the two finest canvas-pyramid levels from
    `_canvas_pyramid_blend_profiles(..., collapse_last=False)`.
    """
    from .resize import _axis_plan

    src_h = crop_h if crop_h is not None else lap0.shape[0]
    src_w = crop_w if crop_w is not None else lap0.shape[1]
    if crop_w is not None and crop_w != lap0.shape[1]:
        lap0 = lap0[:, :crop_w]
    band_out_h = -(-out_h // bands)
    idx_full, w_full = _axis_plan(src_h, out_h)
    total = bands * band_out_h
    pad = total - out_h
    if pad:
        idx_full = np.concatenate([idx_full, np.repeat(idx_full[-1:], pad, 0)])
        w_full = np.concatenate([w_full, np.repeat(w_full[-1:], pad, 0)])
    spans = []
    for b in range(bands):
        rows = idx_full[b * band_out_h : (b + 1) * band_out_h]
        spans.append((int(rows.min()), int(rows.max()) + 1))
    band_src_h = max(hi - lo for lo, hi in spans)
    band_src_h = min(band_src_h, lap0.shape[0])
    coarse_h = coarse.shape[0]
    # coarse halo: rows [lo//2 - 1, (hi-1)//2 + 2) cover every pyrUp tap
    # (+4: one extra for odd band heights, one for the cut contaminated rows)
    band_coarse_h = min(band_src_h // 2 + 4, coarse_h)

    # Dispatch every band up front (async), then fetch in order: band b+1
    # computes while band b crosses the host link.
    handles = []
    for b in range(bands):
        lo, hi = spans[b]
        lap_start = min(lo, lap0.shape[0] - band_src_h)
        ci0 = min(max(lap_start // 2 - 1, 0), coarse_h - band_coarse_h)
        up_offset = lap_start - 2 * ci0
        rows = idx_full[b * band_out_h : (b + 1) * band_out_h] - lap_start
        from .resize import _band_matrix

        r_h = _band_matrix(
            rows, w_full[b * band_out_h : (b + 1) * band_out_h], band_src_h
        )
        handles.append(_finalize_band(
            lap0,
            coarse,
            jnp.int32(lap_start),
            jnp.int32(ci0),
            jnp.int32(up_offset),
            jnp.asarray(r_h),
            band_src_h,
            band_coarse_h,
            band_out_h,
            out_w,
            to_uint8,
        ))

    if as_device:
        # Keep the result on device (e.g. the QA stage consumes it as a
        # jnp array — no host round-trip for an input-size proxy).
        return jnp.concatenate(handles, axis=0)[:out_h]

    def bands_iter():
        # Start every device->host copy up front: band b+1's transfer
        # rides the link while band b is being written/consumed on host
        # (np.asarray alone would serialize transfer with host work).
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
    out_np = np.empty((out_h, out_w, lap0.shape[2]), _dt)
    r = 0
    for arr in bands_iter():
        out_np[r : r + arr.shape[0]] = arr
        r += arr.shape[0]
    return out_np


def _masked_jacobi(u, div, m, dst, iters):
    def shift(a, dy_, dx_):
        return jnp.roll(jnp.roll(a, dy_, axis=0), dx_, axis=1)

    def body(_, u):
        nb = shift(u, 1, 0) + shift(u, -1, 0) + shift(u, 0, 1) + shift(u, 0, -1)
        upd = (nb - div) * 0.25
        return dst * (1 - m) + upd * m

    return jax.lax.fori_loop(0, iters, body, u)


def _laplace(u):
    def shift(a, dy_, dx_):
        return jnp.roll(jnp.roll(a, dy_, axis=0), dx_, axis=1)

    return shift(u, 1, 0) + shift(u, -1, 0) + shift(u, 0, 1) + shift(u, 0, -1) - 4.0 * u


def _vcycle(u, div, m, dst, depth, nu=12):
    """One multigrid V-cycle for lap(u)=div inside mask m (Dirichlet=dst).

    Restriction/prolongation reuse the cv2-parity pyramid kernels; the
    coarse-grid equation keeps the 5-point stencil (Galerkin-ish, good
    enough for seam-scale masks). Static recursion depth."""
    u = _masked_jacobi(u, div, m, dst, nu)
    if depth > 0 and min(u.shape[0], u.shape[1]) >= 8:
        r = (div - _laplace(u)) * m
        # Restrict: pyrDown of the residual; scale by 4 (h^2 factor of the
        # coarse stencil), coarse mask = strict interior of the fine mask.
        r_c = pyr_down(r) * 4.0
        m_c = (pyr_down(m) > 0.999).astype(jnp.float32)
        zero = jnp.zeros_like(r_c)
        e_c = _vcycle(zero, r_c, m_c, zero, depth - 1, nu)
        e = pyr_up(e_c, (u.shape[0], u.shape[1]))
        u = u + e * m
    return _masked_jacobi(u, div, m, dst, nu)


@partial(jax.jit, static_argnames=("mode", "cycles", "depth"))
def seamless_clone_multigrid(
    dst: jax.Array,
    src: jax.Array,
    mask: jax.Array,
    mode: str = "normal",
    cycles: int = 6,
    depth: int = 5,
) -> jax.Array:
    """Multigrid Poisson editing: same equation as :func:`seamless_clone`
    but solved with V-cycles — converges at print scale where fixed-count
    Jacobi stalls (low-frequency error decays once per cycle instead of
    once per ~N^2 sweeps)."""
    dst = dst.astype(jnp.float32)
    src = src.astype(jnp.float32)
    m = (mask > 0).astype(jnp.float32)
    if m.ndim == 2:
        m = m[..., None]

    def grads(img):
        gx = jnp.diff(img, axis=1, append=img[:, -1:])
        gy = jnp.diff(img, axis=0, append=img[-1:])
        return gx, gy

    sx, sy = grads(src)
    if mode == "monochrome":
        gray = (0.299 * src[..., 0] + 0.587 * src[..., 1] + 0.114 * src[..., 2])[..., None]
        sx, sy = grads(jnp.broadcast_to(gray, src.shape))
    dx, dy = grads(dst)
    if mode == "mixed":
        sx = jnp.where(jnp.abs(dx) > jnp.abs(sx), dx, sx)
        sy = jnp.where(jnp.abs(dy) > jnp.abs(sy), dy, sy)
    div = (
        sx - jnp.concatenate([jnp.zeros_like(sx[:, :1]), sx[:, :-1]], axis=1)
        + sy - jnp.concatenate([jnp.zeros_like(sy[:1]), sy[:-1]], axis=0)
    )
    u = dst * (1 - m) + src * m
    for _ in range(cycles):
        u = _vcycle(u, div, m, dst, depth)
    return u
