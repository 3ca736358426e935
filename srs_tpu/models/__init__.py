from .nets import EDSR, ESPCN, RCAN, back_project, depth_to_space
from .prompts import PromptTemplateManager
from .registry import MODEL_REGISTRY, build_model
from .sr_module import (
    SuperResolutionModule,
    SuperResolutionResult,
    UpscaleConfig,
    UpscaleProvider,
    VeImageXTemplate,
)

__all__ = [
    "EDSR",
    "ESPCN",
    "RCAN",
    "back_project",
    "depth_to_space",
    "PromptTemplateManager",
    "MODEL_REGISTRY",
    "build_model",
    "SuperResolutionModule",
    "SuperResolutionResult",
    "UpscaleConfig",
    "UpscaleProvider",
    "VeImageXTemplate",
]
