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

__all__ = ["sharded_weighted_merge"]


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

    bands = merge(tiles, weights, rel)  # [s*hl, w_pad, c] globally
    # Strip the non-owned tail rows of every band but the last.
    parts = [
        jax.lax.dynamic_slice_in_dim(bands, d * hl, own if d < s - 1 else hl, axis=0)
        for d in range(s)
    ]
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
