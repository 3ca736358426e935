"""Mesh tile dispatcher — device-parallel execution of the SR stages.

Replaces the execution role of the reference's AgentScheduler + asyncio
semaphore (reference: main.py:254-262, agent_scheduler.py:447-496): the
tile batch is sharded over the ``data`` mesh axis and the jitted SR model
runs on all chips at once; XLA lays collectives over ICI. The policy role
(priorities, retries, degradation) stays in srs_tpu.scheduler.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tiling.geometry import TileLayout
from .halo import sharded_weighted_merge
from .mesh import make_mesh

__all__ = ["MeshTileDispatcher"]


class MeshTileDispatcher:
    """Runs per-tile fns over the mesh with data sharding + halo merge."""

    def __init__(self, mesh: Optional[Mesh] = None):
        self.mesh = mesh or make_mesh()
        self._jitted: Dict[str, Callable] = {}

    @property
    def num_devices(self) -> int:
        return int(np.prod(list(self.mesh.shape.values())))

    def pad_batch(self, tiles: jax.Array) -> jax.Array:
        """Pad the tile batch to a multiple of the data-axis size (XLA needs
        equal shards); padded tiles are zero-weight no-ops at merge."""
        d = self.mesh.shape.get("data", 1)
        n = tiles.shape[0]
        rem = (-n) % d
        if rem:
            tiles = jnp.concatenate([tiles, jnp.zeros((rem, *tiles.shape[1:]), tiles.dtype)])
        return tiles

    def run_tiled(self, fn: Callable, tiles: jax.Array, key: str) -> jax.Array:
        """Apply a [N, ...] -> [N, ...] tile fn with the batch sharded over
        the ``data`` axis."""
        if key not in self._jitted:
            sharding = NamedSharding(self.mesh, P("data"))
            self._jitted[key] = jax.jit(fn, in_shardings=sharding, out_shardings=sharding)
        n0 = tiles.shape[0]
        padded = self.pad_batch(tiles)
        out = self._jitted[key](padded)
        return out[:n0]

    def _space_ok(self, layout: TileLayout) -> bool:
        return (
            "space" in self.mesh.shape
            and self.mesh.shape["space"] > 1
            and layout.ny % self.mesh.shape["space"] == 0
        )

    def merge(
        self,
        tiles: jax.Array,
        weights: jax.Array,
        layout: TileLayout,
    ) -> jax.Array:
        """Halo-exchange merge over the ``space`` axis when present (and
        the row count divides); single-device merge otherwise."""
        if self._space_ok(layout):
            return sharded_weighted_merge(tiles, weights, layout, self.mesh)
        from ..ops.tiles import merge_tiles

        return merge_tiles(tiles, weights, layout)

    def laplacian_blend(
        self,
        tiles: jax.Array,
        weight_profiles,
        layout: TileLayout,
        levels: int = 6,
        collapse_last: bool = True,
    ):
        """Canvas-pyramid blend sharded over ``space`` when possible;
        single-device profile blend otherwise. Returns the owned canvas
        rows ([S*own(+tail), W, C]) — same coverage as the single-device
        padded canvas. With ``collapse_last=False`` the level-0 collapse
        is deferred: the sharded path returns a
        :class:`..parallel.finalize.ShardedCanvas` (never gathers the
        canvas), the single-device path a ``(lap0, coarse)`` pair — both
        consumed band-wise by the save stage."""
        if self._space_ok(layout):
            from .halo import sharded_laplacian_blend

            wy, wx = weight_profiles
            return sharded_laplacian_blend(
                tiles, wy, wx, layout, self.mesh, levels,
                collapse_last=collapse_last,
            )
        from ..ops.blend import laplacian_fusion_tiles

        return laplacian_fusion_tiles(
            tiles, None, layout, levels=levels,
            weight_profiles=weight_profiles, clip_range=None,
            collapse_last=collapse_last,
        )
