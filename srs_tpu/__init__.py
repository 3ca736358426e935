"""srs_tpu — TPU-native tile-parallel super-resolution framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
squellww/super-resolution-system (see SURVEY.md): overlap-grid tiling,
on-device SR networks, Laplacian-pyramid fusion, full QA, and a mesh tile
dispatcher — with the reference's public API surface preserved.
"""

from .config import SystemConfig, config
from .pipeline import PipelineConfig, PipelineResult, SuperResolutionPipeline

__version__ = "0.1.0"

__all__ = [
    "SuperResolutionPipeline",
    "PipelineConfig",
    "PipelineResult",
    "SystemConfig",
    "config",
    "__version__",
]
