"""Generative image module (ARK analog).

API-parity port of the reference's ARK client (reference:
ark_api_module.py:17-96: `ARKImageConfig`, `ARKImageGenerator.generate`
posting to a text-to-image endpoint with Bearer auth, size "2K",
watermark flag). There is no remote generation here; `generate` runs an
on-device procedural synthesizer seeded from the prompt hash — a
deterministic stand-in that preserves the call surface, usable for
placeholder fills and test fixtures. SURVEY §2 #10 marks this component
optional/low priority; a learned generative-fill model can replace the
synthesizer behind the same API.
"""

from __future__ import annotations

import hashlib
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import numpy as np

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None

_SIZES = {"1K": (1024, 1024), "2K": (2048, 2048), "4K": (4096, 4096)}


@dataclass
class ARKImageConfig:
    """(reference: ark_api_module.py:17-25)."""

    model: str = "procedural-v1"
    size: str = "2K"
    watermark: bool = False
    seed: Optional[int] = None
    guidance_scale: float = 7.5
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass
class ARKImageResult:
    image: Any
    prompt: str
    seed: int
    size: Tuple[int, int]
    processing_time: float


class ARKImageGenerator:
    """(reference: ark_api_module.py:28-80). api_key accepted for parity."""

    def __init__(self, api_key: str = "", config: Optional[ARKImageConfig] = None):
        del api_key
        self.config = config or ARKImageConfig()

    def generate(self, prompt: str, config: Optional[ARKImageConfig] = None) -> ARKImageResult:
        cfg = config or self.config
        t0 = time.time()
        w, h = _SIZES.get(cfg.size, _SIZES["2K"])
        seed = cfg.seed
        if seed is None:
            seed = int(hashlib.md5(prompt.encode()).hexdigest()[:8], 16) % (2**31)
        rng = np.random.default_rng(seed)
        # Procedural field: smooth random low-frequency color gradients.
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.zeros((h, w, 3), np.float32)
        for _ in range(4):
            fx, fy = rng.uniform(0.5, 4.0, 2)
            px, py = rng.uniform(0, 2 * np.pi, 2)
            amp = rng.uniform(20, 60, 3)
            wave = np.sin(xx / w * fx * 2 * np.pi + px) * np.cos(yy / h * fy * 2 * np.pi + py)
            img += wave[..., None] * amp[None, None, :]
        img = np.clip(img + 127.0, 0, 255)
        if cfg.watermark:
            img[-32:, -192:] = np.clip(img[-32:, -192:] * 0.6 + 80, 0, 255)
        out = Image.fromarray(img.astype(np.uint8)) if Image is not None else img
        return ARKImageResult(
            image=out, prompt=prompt, seed=seed, size=(w, h),
            processing_time=time.time() - t0,
        )


def generate_image(prompt: str, **kwargs: Any) -> ARKImageResult:
    """Module-level helper (reference: ark_api_module.py:84-87)."""
    return ARKImageGenerator().generate(prompt, ARKImageConfig(**kwargs) if kwargs else None)
