from .geometry import TileLayout, compute_layout
from .tiling import PaddingMode, Tile, TileMetadata, TileStatus, TilingModule

__all__ = [
    "TileLayout",
    "compute_layout",
    "TilingModule",
    "Tile",
    "TileMetadata",
    "TileStatus",
    "PaddingMode",
]
