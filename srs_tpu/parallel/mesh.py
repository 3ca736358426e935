"""Device mesh construction.

Replaces the reference's elastic agent pool (reference:
agent_scheduler.py:889-959 autoscaling over software agents) with a static
TPU mesh: axes ``data`` (tile/batch parallelism — the analog of the
reference's 30-way asyncio semaphore, main.py:254-262), ``space`` (spatial
sharding of canvas rows with halo exchange — the context-parallel analog
of the reference's redundant overlap bands, SURVEY §5 long-context), and
optionally ``model`` (tensor parallelism over conv channels for the larger
SR nets).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "spatial_sharding", "replicated"]


def make_mesh(
    shape: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh from an axis-name -> size dict.

    With ``shape=None``, all devices go on a 1-D ``data`` axis. Axis sizes
    of -1 are inferred (at most one). Total must divide the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not shape:
        shape = {"data": n}
    names = list(shape.keys())
    sizes = list(shape.values())
    if sizes.count(-1) > 1:
        raise ValueError("at most one inferred (-1) axis")
    known = int(np.prod([s for s in sizes if s != -1]))
    if -1 in sizes:
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    if total > n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} devices, have {n}")
    arr = np.array(devices[:total]).reshape(sizes)
    return Mesh(arr, tuple(names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch/tile) dimension."""
    return NamedSharding(mesh, P(axis))


def spatial_sharding(mesh: Mesh, data_axis: str = "data", space_axis: str = "space") -> NamedSharding:
    """[N, H, W, C]: batch over data, rows over space (XLA inserts conv
    halo exchanges automatically under jit)."""
    return NamedSharding(mesh, P(data_axis, space_axis, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
