"""Generative image module (ARK analog).

API-parity port of the reference's ARK client (reference:
ark_api_module.py:17-96: `ARKImageConfig`, `ARKImageGenerator.generate`
posting a prompt to a remote text-to-image endpoint with Bearer auth,
size "2K", watermark flag). There is no remote generation here; two
on-device backends serve the same call surface:

- **learned** (default when the ``ark_gen`` checkpoint is packaged):
  the class-conditional diffusion model of models/generative.py samples
  a 64 px base image for the prompt's visual class (DDIM +
  classifier-free guidance, `guidance_scale` honored), and the
  framework's own packaged SR ladder super-resolves it to the requested
  1K/2K/4K size — generation and super-resolution share one stack;
- **procedural** fallback (untrained checkouts, or
  ``SRS_ARK_PROCEDURAL=1``): a deterministic low-frequency synthesizer
  seeded from the prompt hash, kept for test fixtures and placeholder
  fills.

Both are deterministic given (prompt, seed).
"""

from __future__ import annotations

import hashlib
import os
import re
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

    model: str = "ark-gen-v1"
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
    metadata: Dict[str, Any] = field(default_factory=dict)


def _force_procedural(cfg: "ARKImageConfig") -> bool:
    """True when the procedural backend is explicitly requested.

    Two routes (ADVICE r3): the config's ``model`` field — the knob the
    reference API exposes (ark_api_module.py:17-25) — selects the backend
    when it names the procedural synthesizer; and the SRS_ARK_PROCEDURAL
    env var, parsed as a boolean so ``=0`` does NOT force procedural.
    """
    if (cfg.model or "").lower().startswith("procedural"):
        return True
    return os.environ.get("SRS_ARK_PROCEDURAL", "").strip().lower() in (
        "1", "true", "yes", "on",
    )


def _resolve_size(size: str) -> Tuple[int, int]:
    if size in _SIZES:
        return _SIZES[size]
    m = re.fullmatch(r"(\d+)x(\d+)", size or "")
    if m:
        return int(m.group(1)), int(m.group(2))
    return _SIZES["2K"]


class ARKImageGenerator:
    """(reference: ark_api_module.py:28-80). api_key accepted for parity."""

    def __init__(self, api_key: str = "", config: Optional[ARKImageConfig] = None):
        del api_key
        self.config = config or ARKImageConfig()

    def generate(self, prompt: str, config: Optional[ARKImageConfig] = None) -> ARKImageResult:
        cfg = config or self.config
        t0 = time.time()
        w, h = _resolve_size(cfg.size)
        seed = cfg.seed
        if seed is None:
            seed = int(hashlib.md5(prompt.encode()).hexdigest()[:8], 16) % (2**31)
        img = meta = None
        if not _force_procedural(cfg):
            try:
                img, meta = self._generate_learned(prompt, cfg, seed, (w, h))
            except Exception:
                import logging

                logging.getLogger(__name__).warning(
                    "learned ARK backend failed; serving procedural fallback",
                    exc_info=True,
                )
                img = None
        if img is None:
            img = _procedural(prompt, seed, (w, h))
            meta = {"model": "procedural-v1"}
        if cfg.watermark:
            img[-32:, -192:] = np.clip(img[-32:, -192:] * 0.6 + 80, 0, 255)
        out = Image.fromarray(img.astype(np.uint8)) if Image is not None else img
        return ARKImageResult(
            image=out, prompt=prompt, seed=seed, size=(w, h),
            processing_time=time.time() - t0, metadata=meta,
        )

    # -- learned backend ---------------------------------------------------

    def _generate_learned(
        self, prompt: str, cfg: ARKImageConfig, seed: int, wh: Tuple[int, int]
    ) -> Tuple[Optional[np.ndarray], Dict[str, Any]]:
        import jax
        import jax.numpy as jnp

        from .generative import (ARK_CLASSES, ark_meta, build_ark,
                                 class_for_prompt, sample_ark)

        module, params, trained = build_ark()
        if not trained:
            return None, {}
        w, h = wh
        cls = class_for_prompt(prompt, cfg.extra.get("category"))
        steps = int(cfg.extra.get("steps", 50))
        # The API's guidance_scale rides the reference's diffusion range
        # (default 7.5); this small model saturates lower, so map it into
        # [1, 4] around the same default.
        g = float(np.clip(1.0 + (cfg.guidance_scale - 1.0) * 0.25, 1.0, 4.0))
        native = int(cfg.extra.get("base_size", ark_meta()["size"]))
        base = sample_ark(
            module, params, cls, jax.random.PRNGKey(seed), size=native,
            steps=steps, guidance=g
        )
        side = int(base.shape[1])
        total = max(w, h) / side
        ladder = []
        provider = cfg.extra.get("sr_provider", "quality")
        if total > 1.0:
            from .sr_module import scale_ladder

            sr = _sr_module()
            ladder = scale_ladder(total, trained=sr.trained_scales(provider))
            cur = base
            for s in ladder:
                cur = sr.upscale_tiles(cur, s, provider=provider)
            base = cur
        if base.shape[1] != h or base.shape[2] != w:
            from ..ops.resize import resize_bicubic

            base = jnp.clip(resize_bicubic(base, h, w), 0, 255)
        refined = False
        if cfg.extra.get("refine") and max(w, h) > side:
            # native-resolution detail pass (SDEdit tiles at the trained
            # size): synthesized high frequencies where the SR ladder
            # could only interpolate (reference returns native-2K samples,
            # ark_api_module.py:42-80)
            from .generative import refine_ark

            base = refine_ark(
                module, params, base[0], cls,
                jax.random.PRNGKey(seed ^ 0x5EED),
                t0=float(cfg.extra.get("refine_t0", 0.22)),
                steps=int(cfg.extra.get("refine_steps", 8)),
                guidance=g if g <= 2.0 else 1.5,
                tile=side,
            )[None]
            refined = True
        img = np.asarray(base[0], np.float32)
        return img, {
            "model": "ark_gen-ddim",
            "class": ARK_CLASSES[cls],
            "guidance": g,
            "steps": steps,
            "base_size": side,
            "sr_ladder": ladder,
            "refined": refined,
        }


_SR_SINGLETON = None


def _sr_module():
    global _SR_SINGLETON
    if _SR_SINGLETON is None:
        from .sr_module import SuperResolutionModule

        _SR_SINGLETON = SuperResolutionModule()
    return _SR_SINGLETON


def _procedural(prompt: str, seed: int, wh: Tuple[int, int]) -> np.ndarray:
    """Deterministic low-frequency synthesizer (the round-1/2 stand-in)."""
    w, h = wh
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    for _ in range(4):
        fx, fy = rng.uniform(0.5, 4.0, 2)
        px, py = rng.uniform(0, 2 * np.pi, 2)
        amp = rng.uniform(20, 60, 3)
        wave = np.sin(xx / w * fx * 2 * np.pi + px) * np.cos(yy / h * fy * 2 * np.pi + py)
        img += wave[..., None] * amp[None, None, :]
    return np.clip(img + 127.0, 0, 255)


def generate_image(prompt: str, **kwargs: Any) -> ARKImageResult:
    """Module-level helper (reference: ark_api_module.py:84-87)."""
    return ARKImageGenerator().generate(prompt, ARKImageConfig(**kwargs) if kwargs else None)
