"""Halo-exchange tile merge over a spatial mesh axis.

This is the TPU-native replacement for the reference's redundant-overlap
reconciliation (SURVEY §2 parallelism table: "overlap regions (20%)" →
halo exchange over ICI): the canvas is sharded by row bands across the
``space`` mesh axis, each device accumulates only its own tiles, and the
overlap rows that spill into the next band travel over the interconnect as
one `ppermute` — instead of every chip re-fetching and re-blending
redundant halo pixels.

Ownership: with ``ny`` tile rows split into ``S`` groups of ``k`` rows,
device d owns canvas rows [d*k*step, (d+1)*k*step) (the last device also
owns the trailing ``overlap`` rows). A tile row group's accumulation spans
``Hl = (k-1)*step + block`` rows — the last ``overlap`` of which belong to
device d+1 and are sent down; symmetric weight sums travel with them, so
normalization at shard boundaries is exact (SURVEY §7 hard part #2).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tiling.geometry import TileLayout

__all__ = ["sharded_weighted_merge", "sharded_laplacian_blend"]

# shard_map programs are built per (layout, mesh, levels, ...) config and
# memoized JITTED: an un-jitted shard_map call re-traces and re-lowers its
# whole unrolled accumulation loop on EVERY invocation (~18 s per blend on
# the 8-virtual-device CPU mesh, and seconds of host time per job on TPU);
# with the jit cache it is trace-once, dispatch-thereafter.


class _LRUProgramCache(dict):
    """Bounded program memo (ADVICE r3): a long-lived server seeing many
    distinct canvas/tile geometries must not accumulate compiled shard_map
    programs (each pins Mesh/device references) for the process lifetime.
    Plain dict interface so halo.py/finalize.py call sites stay unchanged;
    recency is refreshed on .get hits, oldest entry evicted past the cap.
    """

    def __init__(self, maxsize: int = 48):
        super().__init__()
        self.maxsize = maxsize

    def get(self, key, default=None):
        if key in self:
            val = super().pop(key)
            super().__setitem__(key, val)  # move to MRU end
            return val
        return default

    def __setitem__(self, key, value):
        if key in self:
            super().pop(key)
        super().__setitem__(key, value)
        while len(self) > self.maxsize:
            super().pop(next(iter(self)))


_PROGRAM_CACHE: dict = _LRUProgramCache()


def _layout_key(layout: TileLayout) -> tuple:
    return (
        layout.ny, layout.nx, layout.block, layout.step,
        layout.padded_w, np.asarray(layout.positions).tobytes(),
    )


def _accumulate(tiles, weights, pos_rel, hl, w_pad, vary_axis=None):
    n, b, _, c = tiles.shape
    canvas = jnp.zeros((hl, w_pad, c), jnp.float32)
    wsum = jnp.zeros((hl, w_pad, 1), jnp.float32)
    if vary_axis is not None:
        # inside shard_map the scan carry must be device-varying like the
        # per-device inputs (JAX vma typing)
        canvas = jax.lax.pcast(canvas, (vary_axis,), to="varying")
        wsum = jax.lax.pcast(wsum, (vary_axis,), to="varying")

    def step(carry, inp):
        canvas, wsum = carry
        tile, wt, pos = inp
        w3 = wt[..., None]
        patch = jax.lax.dynamic_slice(canvas, (pos[0], pos[1], 0), (b, b, c))
        canvas = jax.lax.dynamic_update_slice(
            canvas, patch + tile.astype(jnp.float32) * w3, (pos[0], pos[1], 0)
        )
        wpatch = jax.lax.dynamic_slice(wsum, (pos[0], pos[1], 0), (b, b, 1))
        wsum = jax.lax.dynamic_update_slice(wsum, wpatch + w3, (pos[0], pos[1], 0))
        return (canvas, wsum), None

    (canvas, wsum), _ = jax.lax.scan(step, (canvas, wsum), (tiles, weights, pos_rel))
    return canvas, wsum


def sharded_weighted_merge(
    tiles: jax.Array,
    weights: jax.Array,
    layout: TileLayout,
    mesh: Mesh,
    axis: str = "space",
) -> jax.Array:
    """Merge a [N, B, B, C] tile batch into the padded canvas with the
    canvas row-sharded over ``axis``. Requires ``layout.ny`` divisible by
    the axis size. Returns the full (replicated-view) canvas; math parity
    with :func:`srs_tpu.ops.tiles.merge_tiles`.
    """
    s = mesh.shape[axis]
    ny, nx = layout.ny, layout.nx
    if ny % s:
        raise ValueError(f"ny={ny} not divisible by mesh axis {axis}={s}")
    k = ny // s
    step_px = layout.step
    block = layout.block
    overlap = block - step_px
    hl = (k - 1) * step_px + block
    own = k * step_px
    w_pad = layout.padded_w
    c = tiles.shape[-1]

    # Per-device relative positions (static).
    pos = np.asarray(layout.positions).reshape(ny, nx, 2)
    rel = pos.copy()
    for d in range(s):
        rel[d * k : (d + 1) * k, :, 0] -= d * k * step_px
    rel = jnp.asarray(rel.reshape(ny * nx, 2))

    perm_down = [(d, d + 1) for d in range(s - 1)]

    cache_key = ("merge", _layout_key(layout), mesh, axis,
                 tiles.shape, np.dtype(tiles.dtype).str)
    merge = _PROGRAM_CACHE.get(cache_key)
    if merge is None:
        @jax.jit
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(axis),
        )
        def merge(local_tiles, local_w, local_pos):
            canvas, wsum = _accumulate(local_tiles, local_w, local_pos, hl, w_pad, vary_axis=axis)
            if s > 1 and overlap > 0:
                spill_c = canvas[own:hl]
                spill_w = wsum[own:hl]
                recv_c = jax.lax.ppermute(spill_c, axis, perm_down)
                recv_w = jax.lax.ppermute(spill_w, axis, perm_down)
                canvas = canvas.at[0:overlap].add(recv_c)
                wsum = wsum.at[0:overlap].add(recv_w)
            return canvas / jnp.maximum(wsum, 1e-8)

        _PROGRAM_CACHE[cache_key] = merge

    bands = merge(tiles, weights, rel)  # [s*hl, w_pad, c] globally
    # Strip the non-owned tail rows of every band but the last.
    parts = [
        jax.lax.dynamic_slice_in_dim(bands, d * hl, own if d < s - 1 else hl, axis=0)
        for d in range(s)
    ]
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _pyr_up_rows_halo(coarse, top_row, bot_row, out_rows, axis_w_dst):
    """Polyphase 2x row-upsample of a local coarse band whose vertical
    border rows come from neighbors (halo) instead of border rules.

    coarse: [m, W, C] local band; top_row/bot_row: [1, W, C] neighbor rows
    (already resolved to border rules at the global edges by the caller).
    Returns [2m, W, C] rows (caller trims to out_rows), W upsampled to
    ``axis_w_dst`` with true global border rules (full width is local).
    """
    import jax.numpy as jnp

    from ..ops.pyramid import _up_axis

    ext = jnp.concatenate([top_row, coarse, bot_row], axis=0)  # [m+2, W, C]
    m = coarse.shape[0]
    left = ext[0:m]       # c[i-1]
    mid = ext[1 : m + 1]  # c[i]
    right = ext[2 : m + 2]  # c[i+1]
    even = (left + 6.0 * mid + right) * 0.125
    odd = (mid + right) * 0.5
    rows = jnp.stack([even, odd], axis=1).reshape(2 * m, *coarse.shape[1:])
    rows = rows[:out_rows]
    return _up_axis(rows, 1, axis_w_dst)


def sharded_laplacian_blend(
    tiles: jax.Array,
    wy: np.ndarray,
    wx: np.ndarray,
    layout: TileLayout,
    mesh: Mesh,
    levels: int = 6,
    axis: str = "space",
    collapse_last: bool = True,
):
    """Canvas-pyramid Laplacian blend with the canvas row-sharded over
    ``axis`` — the full multi-chip blend (SURVEY config[4]): per-level
    accumulation spills travel as one ppermute per level, and the collapse
    exchanges single-row pyramid halos between neighbor bands instead of
    materializing any full canvas on one chip.

    Requires ny divisible by the axis size and own-band heights divisible
    by 2^(levels-1) (``step_multiple=32`` layouts give this for
    levels <= 6 when ny/S tile rows each span a 32-multiple). Math parity
    with the single-device `_canvas_pyramid_blend_profiles` path away from
    band boundaries; at boundaries the halo exchange reproduces the exact
    global operator. Returns the owned canvas rows [S*own, W, C].

    ``collapse_last=False`` stops the collapse at level 1 and returns a
    :class:`srs_tpu.parallel.finalize.ShardedCanvas` — the deferred
    ``(lap0, coarse)`` pair kept row-sharded over ``axis`` for the sharded
    banded finalize (no full-resolution canvas ever gathers on one chip;
    SURVEY §7 hard part 2). Falls back to the collapsed path when the
    layout only admits one pyramid level.
    """
    from ..ops.pyramid import build_gaussian_pyramid, pyr_up
    from ..ops.weights import profile_pyramid

    s_sz = mesh.shape[axis]
    ny, nx = layout.ny, layout.nx
    if ny % s_sz:
        raise ValueError(f"ny={ny} not divisible by mesh axis {axis}={s_sz}")
    k = ny // s_sz
    step_px, block = layout.step, layout.block
    own = k * step_px
    hl = (k - 1) * step_px + block
    w_pad = layout.padded_w

    # Same level clamp as the single-device path (ops.blend
    # laplacian_fusion_tiles): dyadic position alignment + overlap cap —
    # the two paths must blend identically for checkpoint/mesh portability.
    from ..ops.blend import _v2

    if layout.num_tiles > 1:
        align = min(
            _v2(int(p)) for p in np.asarray(layout.positions).reshape(-1) if int(p) != 0
        )
        overlap_cap = max(1, int(np.log2(max(layout.overlap, 4))) - 1)
        levels = max(1, min(levels, align + 1, overlap_cap))
    lv = levels
    while lv > 1 and (own % (2 ** (lv - 1)) or block // (2 ** (lv - 1)) < 4):
        lv -= 1
    levels = lv

    own_i = [own // (2**i) for i in range(levels)]
    hl_i = [-(-hl // (2**i)) for i in range(levels)]
    cw_i = [-(-w_pad // (2**i)) for i in range(levels)]

    pos = np.asarray(layout.positions).reshape(ny, nx, 2)
    rel = pos.copy()
    for d in range(s_sz):
        rel[d * k : (d + 1) * k, :, 0] -= d * k * step_px
    rel = jnp.asarray(rel.reshape(ny * nx, 2))

    py = profile_pyramid(wy, levels)  # list of [N, L_i]
    px = profile_pyramid(wx, levels)
    levels = min(levels, len(py))

    perm_down = [(d, d + 1) for d in range(s_sz - 1)]
    perm_up = [(d + 1, d) for d in range(s_sz - 1)]
    dev_rows = jnp.arange(s_sz, dtype=jnp.int32).reshape(s_sz, 1)

    deferred = (not collapse_last) and levels > 1
    in_specs = tuple([P(axis)] * (3 + 2 * levels))
    out_specs = (P(axis), P(axis)) if deferred else P(axis)

    cache_key = ("blend", _layout_key(layout), mesh, axis, levels, deferred,
                 tiles.shape, np.dtype(tiles.dtype).str)
    blend = _PROGRAM_CACHE.get(cache_key)
    if blend is not None:
        return _finish_blend(blend, tiles, rel, dev_rows, py, px, levels,
                             deferred, mesh, axis, s_sz, own, hl, own_i, hl_i,
                             w_pad, cw_i)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    def blend(local_tiles, local_pos, dev_row, *profs):
        pys = profs[:levels]
        pxs = profs[levels:]
        d = dev_row[0, 0]
        gauss = build_gaussian_pyramid(local_tiles.astype(jnp.float32), levels)
        canvas_lap = []
        for i in range(len(gauss)):
            g_i = gauss[i]
            tb = g_i.shape[1]
            lap = (
                g_i
                if i == len(gauss) - 1
                else g_i - pyr_up(gauss[i + 1], (tb, g_i.shape[2]))
            )
            num = jax.lax.pcast(
                jnp.zeros((hl_i[i], cw_i[i], 3), jnp.float32), (axis,), to="varying"
            )
            den = jax.lax.pcast(
                jnp.zeros((hl_i[i], cw_i[i], 1), jnp.float32), (axis,), to="varying"
            )
            for t in range(local_tiles.shape[0]):
                wmap = pys[i][t][:, None, None] * pxs[i][t][None, :, None]
                p0 = local_pos[t, 0] // (2**i)
                p1 = local_pos[t, 1] // (2**i)
                npatch = jax.lax.dynamic_slice(num, (p0, p1, 0), (tb, tb, 3))
                num = jax.lax.dynamic_update_slice(
                    num, npatch + lap[t] * wmap, (p0, p1, 0)
                )
                dpatch = jax.lax.dynamic_slice(den, (p0, p1, 0), (tb, tb, 1))
                den = jax.lax.dynamic_update_slice(den, dpatch + wmap, (p0, p1, 0))
            if s_sz > 1 and hl_i[i] > own_i[i]:
                spill_n = jax.lax.ppermute(num[own_i[i] :], axis, perm_down)
                spill_d = jax.lax.ppermute(den[own_i[i] :], axis, perm_down)
                pad_rows = hl_i[i] - own_i[i]
                num = num.at[0:pad_rows].add(spill_n)
                den = den.at[0:pad_rows].add(spill_d)
            canvas_lap.append(num / jnp.maximum(den, 1e-8))

        # Collapse over the FULL local band [0, hl_i): interior devices'
        # tail rows ([own_i, hl_i), authoritative on the next device) are
        # garbage there and discarded at stitching; the last device's tail
        # is complete (it received no spill-out) and owns the canvas
        # bottom. Halos come from the *owned* row positions of neighbors.
        x = canvas_lap[-1]
        stop = 1 if deferred else 0
        for i in range(len(gauss) - 2, stop - 1, -1):
            oc = own_i[i + 1] if i + 1 < len(own_i) else own_i[-1] // 2
            hc = x.shape[0]
            # row preceding d's band = d-1's local row oc-1;
            # row following d's band tail = d+1's local row hc-oc.
            top_from_above = jax.lax.ppermute(x[oc - 1 : oc], axis, perm_down)
            bot_from_below = jax.lax.ppermute(x[hc - oc : hc - oc + 1], axis, perm_up)
            is_top = (d == 0)[None, None, None]
            is_bot = (d == s_sz - 1)[None, None, None]
            # The last *owned* output rows read coarse row ``oc`` — the
            # first tail row, incomplete on interior devices. Patch it
            # with the authoritative value (the next device's row 0).
            row0_below = jax.lax.ppermute(x[:1], axis, perm_up)
            patched = jnp.where(is_bot, x[oc : oc + 1], row0_below)
            x = jax.lax.dynamic_update_slice(x, patched, (oc, 0, 0))
            # global edges: top row uses REFLECT_101 (c[-1]=c[1]); bottom
            # uses replicate (c[m]=c[m-1]) — pyr_up border conventions.
            top_row = jnp.where(is_top, x[1:2], top_from_above)
            bot_row = jnp.where(is_bot, x[-1:], bot_from_below)
            up = _pyr_up_rows_halo(x, top_row, bot_row, hl_i[i], cw_i[i])
            x = canvas_lap[i] + up
        if deferred:
            return canvas_lap[0], x
        return x

    _PROGRAM_CACHE[cache_key] = blend
    return _finish_blend(blend, tiles, rel, dev_rows, py, px, levels,
                         deferred, mesh, axis, s_sz, own, hl, own_i, hl_i,
                         w_pad, cw_i)


def _finish_blend(blend, tiles, rel, dev_rows, py, px, levels, deferred,
                  mesh, axis, s_sz, own, hl, own_i, hl_i, w_pad, cw_i):
    prof_args = [jnp.asarray(p) for p in py[:levels]] + [jnp.asarray(p) for p in px[:levels]]
    if deferred:
        from .finalize import ShardedCanvas

        lap0, coarse = blend(tiles, rel, dev_rows, *prof_args)
        return ShardedCanvas(
            lap0=lap0, coarse=coarse, mesh=mesh, axis=axis, s=s_sz,
            own0=own, hl0=hl, own1=own_i[1], hl1=hl_i[1],
            w_pad=w_pad, cw1=cw_i[1],
        )
    bands = blend(tiles, rel, dev_rows, *prof_args)  # [S*hl, W, C] globally
    parts = [
        jax.lax.dynamic_slice_in_dim(bands, d * hl, own if d < s_sz - 1 else hl, axis=0)
        for d in range(s_sz)
    ]
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
