"""Configuration tree for the TPU-native super-resolution framework.

API-parity port of the reference config system (reference: config.py:12-273):
a dataclass tree with env-var overrides and a module-level singleton. The
reference's remote-API credentials (`APIConfig`, config.py:12-31) become model
/ device configuration, since the super-resolution "engine" runs on-device.

All defaults mirror the reference values (block 2048, overlap 0.2, 6 pyramid
levels, scheduler 100 agents / 60 concurrent, QA thresholds, resolution
presets) so that a user of the reference finds identical knobs.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

# ---------------------------------------------------------------------------
# Resolution presets (reference: main.py:171-175, config.py:225-229)
# ---------------------------------------------------------------------------

RESOLUTION_PRESETS: Dict[str, Tuple[int, int]] = {
    "100MP": (12245, 8163),
    "150MP": (15000, 10000),
    "200MP": (17320, 11547),
}


@dataclass
class ModelConfig:
    """On-device SR model configuration.

    Replaces the reference's remote-API credentials (reference:
    config.py:12-31 `APIConfig`: endpoints, ak/sk, model ids). "Providers"
    (seedream / veimagex / hybrid, super_resolution_module.py:44) map to
    on-device model variants: ``quality`` (EDSR-style), ``fast``
    (ESPCN-style) and ``hybrid`` (staged ladder).
    """

    default_provider: str = "hybrid"  # quality | fast | hybrid | bicubic
    quality_model: str = "edsr_xl"  # registry key for the quality net
    fast_model: str = "espcn"  # registry key for the fast net
    # Degradation-aware routing (models/routing.py): probe the input's
    # noise/blur and swap the quality tier to ``robust_model`` on damaged
    # inputs. The reference can only route on *failure* (sr:947-962).
    auto_route: bool = True
    robust_model: str = "edsr_l_robust"
    # Per-scale family selection (models/selection.py): each ladder step
    # serves the net that wins the held-out photo panel AT THAT SCALE
    # (edsr_l wins x2, edsr_xl wins x3/x4 — round-4 panel). quality_model
    # stays the default/fallback; explicit ``model=`` overrides (the
    # degradation router) bypass selection entirely.
    per_scale_selection: bool = True
    compute_dtype: str = "bfloat16"  # MXU-friendly; accumulation in f32
    params_dtype: str = "float32"
    # Geometric self-ensemble (the EDSR-paper "+" mode): average the net
    # over the 8 dihedral transforms of each tile. ~+0.3-0.4 dB measured
    # on the real-photo holdout for 8x the SR-stage compute (the stage is
    # a minority of end-to-end time; see BENCH_LOCAL.md). Off by default.
    self_ensemble: bool = False
    checkpoint_dir: str = field(
        default_factory=lambda: os.path.expanduser("~/.cache/srs_tpu/models")
    )
    # Retry/timeout parity (reference: super_resolution_module.py:254-256).
    max_retries: int = 3
    retry_base_delay: float = 1.0
    retry_max_delay: float = 8.0


@dataclass
class TilingConfig:
    """Tile decomposition configuration (reference: config.py:33-55)."""

    block_size: int = 2048
    output_block_size: int = 4096
    overlap_ratio: float = 0.2  # valid range [0.1, 0.3]
    min_overlap_ratio: float = 0.1
    max_overlap_ratio: float = 0.3
    padding_mode: str = "mirror"  # mirror | replicate | reflect | constant
    constant_value: int = 0
    content_aware: bool = True
    cache_dir: str = field(
        default_factory=lambda: os.path.expanduser("~/.cache/srs_tpu/tiling")
    )
    l1_cache_size: int = 50  # in-memory LRU entries (reference: config.py:52)
    enable_checkpoint: bool = True

    def __post_init__(self) -> None:
        if not (self.min_overlap_ratio <= self.overlap_ratio <= self.max_overlap_ratio):
            raise ValueError(
                f"overlap_ratio {self.overlap_ratio} outside "
                f"[{self.min_overlap_ratio}, {self.max_overlap_ratio}]"
            )


@dataclass
class SuperResolutionConfig:
    """SR stage configuration (reference: config.py:57-131)."""

    target_resolution: str = "100MP"  # preset key or "custom"
    custom_width: int = 0
    custom_height: int = 0
    scale_factor: float = 2.0
    strength: float = 0.5  # conditioning strength (API parity)
    steps: int = 50  # refinement iterations for iterative providers
    guidance_scale: float = 7.5
    seed: int = -1  # -1 => deterministic content-hash seed
    # Hybrid ladder stages (reference: config.py:74-78,
    # super_resolution_module.py:842-1009): prefilter -> main -> polish.
    hybrid_stages: List[str] = field(
        default_factory=lambda: ["fast_prefilter", "quality_main", "fast_polish"]
    )
    prompt_category: str = "general"
    negative_prompt: str = ""

    def target_size(self) -> Tuple[int, int]:
        if self.target_resolution in RESOLUTION_PRESETS:
            return RESOLUTION_PRESETS[self.target_resolution]
        if self.custom_width > 0 and self.custom_height > 0:
            return (self.custom_width, self.custom_height)
        raise ValueError(f"unknown target resolution {self.target_resolution!r}")


@dataclass
class BlendingConfig:
    """Tile fusion configuration (reference: config.py:134-151)."""

    fusion_method: str = "laplacian"  # laplacian|poisson|weighted|feather|gradient
    pyramid_levels: int = 6
    weight_type: str = "cosine"  # linear | cosine | sigmoid
    seam_threshold: float = 0.95  # windowed-SSIM seam threshold
    seam_window: int = 16
    seam_stride: int = 8
    enable_seam_repair: bool = True
    enable_color_correction: bool = True
    color_correction_method: str = "histogram"  # histogram | mean_std | guided
    poisson_mode: str = "normal"  # normal | mixed | monochrome


@dataclass
class SchedulerConfig:
    """Tile dispatcher configuration (reference: config.py:153-177).

    The reference's "agent pool" becomes a host-side work queue feeding
    device batches; these knobs keep the same policy surface (priority,
    retries, degradation, autoscaling bounds).
    """

    max_agents: int = 100
    max_concurrent: int = 60
    min_agents: int = 5
    scale_max_agents: int = 500
    queue_depth_low: int = 10
    queue_depth_high: int = 50
    queue_depth_critical: int = 100
    scale_up_threshold: float = 0.8
    scale_down_threshold: float = 0.2
    autoscale_up_queue: int = 50
    autoscale_down_queue: int = 10
    max_retries: int = 3
    retry_delays: List[float] = field(default_factory=lambda: [1.0, 2.0, 4.0])
    weight_factors: Dict[str, float] = field(
        default_factory=lambda: {"queue": 0.4, "time": 0.3, "latency": 0.3}
    )
    heartbeat_timeout: float = 30.0
    checkpoint_dir: str = field(
        default_factory=lambda: os.path.expanduser("~/.cache/srs_tpu/scheduler")
    )


@dataclass
class QualityThresholds:
    """Quality gates (reference: quality_assessment_module.py:44-75)."""

    psnr_excellent: float = 40.0
    psnr_good: float = 35.0
    psnr_acceptable: float = 30.0
    ssim_excellent: float = 0.98
    ssim_good: float = 0.95
    ssim_acceptable: float = 0.90
    lpips_excellent: float = 0.02
    lpips_good: float = 0.05
    lpips_acceptable: float = 0.10
    niqe_excellent: float = 3.0
    niqe_good: float = 5.0
    niqe_acceptable: float = 8.0
    brisque_excellent: float = 20.0
    brisque_good: float = 35.0
    brisque_acceptable: float = 50.0
    delta_e_excellent: float = 1.0
    delta_e_good: float = 3.0
    delta_e_acceptable: float = 5.0


@dataclass
class QualityAssessmentConfig:
    """QA configuration (reference: config.py:180-202)."""

    assessment_level: str = "full"  # full | fast | none
    thresholds: QualityThresholds = field(default_factory=QualityThresholds)
    # Multi-scale weights (reference: quality_assessment_module.py:78-87).
    scale_weights: Dict[str, float] = field(
        default_factory=lambda: {
            "structure_color": 0.1,
            "mid_frequency": 0.2,
            "high_frequency": 0.4,
        }
    )
    # Commercial metric weights (reference: config.py:196-200).
    commercial_weights: Dict[str, float] = field(
        default_factory=lambda: {
            "detail_fidelity": 0.3,
            "color_accuracy": 0.4,
            "visual_comfort": 0.3,
        }
    )
    device: str = "tpu"  # tpu | cpu
    enable_lpips: bool = True


@dataclass
class WebUIConfig:
    """WebUI parity configuration (reference: config.py:204-229)."""

    max_upload_mb: int = 500
    allowed_formats: List[str] = field(
        default_factory=lambda: ["jpg", "jpeg", "png", "tiff", "raw", "cr2", "nef", "arw"]
    )
    output_formats: List[str] = field(
        default_factory=lambda: ["tiff", "png", "jpeg", "jxl"]
    )
    resolution_presets: Dict[str, Tuple[int, int]] = field(
        default_factory=lambda: dict(RESOLUTION_PRESETS)
    )
    port: int = 8501


@dataclass
class ParallelConfig:
    """TPU mesh configuration — new in this framework.

    Replaces the reference's asyncio semaphore concurrency
    (reference: main.py:254-262) and agent autoscaling with a static device
    mesh. ``mesh_shape`` axes: ``data`` shards the tile batch, ``space``
    shards canvas rows (spatial/sequence parallelism with halo exchange).
    """

    mesh_shape: Dict[str, int] = field(default_factory=lambda: {"data": 1, "space": 1})
    use_all_devices: bool = True
    halo_exchange: bool = True
    donate_buffers: bool = True


@dataclass
class SystemConfig:
    """Root configuration (reference: config.py:232-268)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    tiling: TilingConfig = field(default_factory=TilingConfig)
    super_resolution: SuperResolutionConfig = field(default_factory=SuperResolutionConfig)
    blending: BlendingConfig = field(default_factory=BlendingConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    quality: QualityAssessmentConfig = field(default_factory=QualityAssessmentConfig)
    webui: WebUIConfig = field(default_factory=WebUIConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    @classmethod
    def from_env(cls) -> "SystemConfig":
        """Build config with env overrides (reference: config.py:251-268).

        Recognized variables keep the reference names where they still make
        sense: BLOCK_SIZE, OVERLAP_RATIO, TARGET_RESOLUTION, MAX_CONCURRENT,
        QA_DEVICE; plus SRS_PROVIDER / SRS_MESH for the new knobs.
        """
        cfg = cls()
        env = os.environ
        if "BLOCK_SIZE" in env:
            cfg.tiling.block_size = int(env["BLOCK_SIZE"])
        if "OVERLAP_RATIO" in env:
            cfg.tiling.overlap_ratio = float(env["OVERLAP_RATIO"])
        if "TARGET_RESOLUTION" in env:
            cfg.super_resolution.target_resolution = env["TARGET_RESOLUTION"]
        if "MAX_CONCURRENT" in env:
            cfg.scheduler.max_concurrent = int(env["MAX_CONCURRENT"])
        if "QA_DEVICE" in env:
            cfg.quality.device = env["QA_DEVICE"]
        if "SRS_PROVIDER" in env:
            cfg.model.default_provider = env["SRS_PROVIDER"]
        if "SRS_MESH" in env:  # e.g. "data=4,space=2"
            mesh: Dict[str, int] = {}
            for part in env["SRS_MESH"].split(","):
                k, _, v = part.partition("=")
                mesh[k.strip()] = int(v)
            cfg.parallel.mesh_shape = mesh
        return cfg

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def replace(self, **kwargs: Any) -> "SystemConfig":
        return dataclasses.replace(self, **kwargs)


# Module-level singleton (reference: config.py:272).
config = SystemConfig.from_env()
