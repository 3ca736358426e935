from .dispatch import MeshTileDispatcher
from .halo import sharded_laplacian_blend, sharded_weighted_merge
from .mesh import data_sharding, make_mesh, replicated, spatial_sharding

__all__ = [
    "MeshTileDispatcher",
    "sharded_weighted_merge",
    "sharded_laplacian_blend",
    "make_mesh",
    "data_sharding",
    "spatial_sharding",
    "replicated",
]
