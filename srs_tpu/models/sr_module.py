"""SuperResolutionModule — public SR engine surface.

API-parity port of the reference's `SuperResolutionModule` (reference:
super_resolution_module.py:225-1082): same enums (`UpscaleProvider`,
`VeImageXTemplate`), dataclasses (`UpscaleConfig`,
`SuperResolutionResult`), method names (`upscale_seedream`,
`upscale_veimagex`, `hybrid_upscale`, `upscale`, `retry_with_backoff`,
`_deterministic_seed`) and retry/fallback semantics — with the remote HTTP
engines replaced by on-device flax networks:

- ``seedream``  -> quality net (EDSR) + iterative back-projection, where
  ``num_inference_steps`` drives the refinement loop;
- ``veimagex``  -> fast net (ESPCN); template FAST_SR at 1.0x is the
  scale-1 polish variant;
- ``hybrid``    -> the reference's 3-stage ladder (fast 2x prefilter ->
  quality main with fast fallback -> polish), reference sr:842-1009,
  including `processing_history` metadata.

The HMAC request signing (sr:316-463), base64 transport (sr:465-488) and
HTTP retry machinery exist only because the reference's compute was remote;
they have no equivalent here. `retry_with_backoff` is kept (sync, same
exponential 2^attempt capped at 8 s schedule) because the scheduler's
failure ladder still consumes it.
"""

from __future__ import annotations

import hashlib
import io
import time
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None

from ..config import ModelConfig
from ..ops.resize import resize_bicubic, resize_bicubic_up
from .nets import back_project
from .prompts import PromptTemplateManager
from .registry import build_model


class UpscaleProvider(Enum):
    """Provider registry (reference: sr:44-49). The remote names remain as
    aliases of the on-device variants."""

    SEEDREAM = "seedream"  # alias: quality
    VEIMAGEX = "veimagex"  # alias: fast
    HYBRID = "hybrid"
    QUALITY = "quality"
    FAST = "fast"
    BICUBIC = "bicubic"


class VeImageXTemplate(Enum):
    """(reference: sr:51-56)."""

    AI_SUPER_RESOLUTION = "system_workflow_ai_super_resolution"  # 2x
    STANDARD_SR = "system_workflow_sr"  # 1.5-4x
    FAST_SR = "system_workflow_fast_sr"  # polish


@dataclass
class UpscaleConfig:
    """(reference: sr:58-77)."""

    provider: UpscaleProvider = UpscaleProvider.SEEDREAM
    target_scale: float = 2.0
    strength: float = 0.5
    num_inference_steps: int = 30
    seed: Optional[int] = None
    quality: int = 95
    preserve_style: bool = True
    category: str = "general"


@dataclass
class SuperResolutionResult:
    """(reference: sr:80-99)."""

    image: Any  # PIL.Image when PIL input, else np.ndarray
    original_size: Tuple[int, int]  # (width, height)
    upscaled_size: Tuple[int, int]
    scale_factor: float
    provider: str
    processing_time: float
    metadata: Dict[str, Any] = field(default_factory=dict)


ImageLike = Union["Image.Image", np.ndarray, jax.Array]


def _dihedral_ensemble(net, tiles: jax.Array) -> jax.Array:
    """Geometric self-ensemble (EDSR's "+" mode): average the net over the
    8 dihedral transforms of each square tile batch [N,B,B,C].

    Runs as 8 sequential calls of the SAME [N,B,B,C] program — rot90/flip
    keep the shape, so XLA compiles once and peak HBM stays at the plain
    batch's footprint (one 8N mega-batch would multiply activation memory
    8x at print-grade tile sizes). Measured on the real-photo holdout:
    +0.34 dB (edsr_l x2) over the single-pass net."""
    acc = None
    for k in range(4):
        for flip in (False, True):
            t = jnp.rot90(tiles, k, axes=(1, 2))
            if flip:
                t = t[:, :, ::-1]
            o = net(t)
            if flip:
                o = o[:, :, ::-1]
            o = jnp.rot90(o, -k, axes=(1, 2))
            acc = o if acc is None else acc + o
    return acc / 8.0


def scale_ladder(
    total: float,
    max_undershoot: float = 0.88,
    trained: Optional[set] = None,
) -> list:
    """Ladder of {2,3,4}x net passes landing nearest ``total``.

    Slight undershoot (down to ``max_undershoot * total``, finished by a
    small bicubic upscale) is allowed with a quadratic penalty: overshoot
    costs quadratically in extra pixels (canvas area ~ p^2), so e.g. for a
    9.57x target the 9x ladder (74 MP canvas, +6% bicubic) beats the 12x
    one (132 MP canvas). When ``trained`` is given (the set of integer
    scales with shipped/loaded weights), each untrained step multiplies the
    score by 4: an untrained step is exact bicubic and adds zero learned
    detail, so e.g. at 4x the trained [2, 2] ladder beats a zero-init [4]
    regardless of pixel cost. Ties prefer FEWER steps (x1.02/step): a
    direct trained x4 head runs the conv body once where the [2, 2]
    ladder pays it twice (round-3h measurement). Returns [] when
    total <= 1.
    """
    if total <= 1.0:
        return []
    best: Tuple[float, list] = (float("inf"), [4, 4, 4, 4])

    def score(prod: float, steps: list) -> float:
        if prod >= total:
            s = (prod / total) ** 2
        elif prod < total * max_undershoot:
            return float("inf")
        else:
            s = (total / prod) ** 2 * 1.05
        if trained is not None:
            for st in steps:
                if st not in trained:
                    s *= 4.0
        return s * (1.02 ** len(steps))

    def rec(prod: float, steps: list):
        nonlocal best
        s_here = score(prod, steps)
        if steps and s_here < best[0]:
            best = (s_here, list(steps))
        if prod >= total * 4:
            return
        for s in (2, 3, 4):
            steps.append(s)
            rec(prod * s, steps)
            steps.pop()

    rec(1.0, [])
    return best[1]


class SuperResolutionModule:
    """On-device SR engine with provider dispatch and the hybrid ladder."""

    MAX_RETRIES = 3
    RETRY_BASE_DELAY = 1.0
    RETRY_MAX_DELAY = 8.0

    def __init__(
        self,
        access_key: str = "",
        secret_key: str = "",
        region: str = "",
        config: Optional[ModelConfig] = None,
    ):
        # access_key/secret_key/region accepted for constructor parity with
        # the reference (sr:226-243); on-device compute needs no credentials.
        del access_key, secret_key, region
        self.config = config or ModelConfig()
        self._apply_fns: Dict[Tuple[str, int], Callable] = {}
        # (name, scale) -> served trained weights? IBP is applied only to
        # untrained (bicubic-exact) nets: it is their quality floor, but it
        # drags a trained net's learned deblurring back toward bicubic
        # (held-out panel: net 31.58 dB vs net+IBP 30.83 dB).
        self._trained: Dict[Tuple[str, int], bool] = {}
        # scale -> resolved [(member, weight)] for the fusion provider
        # (None = not packaged / not enough trained members at that scale).
        self._fusion_cache: Dict[int, Optional[list]] = {}

    # -- internals ---------------------------------------------------------
    def select_quality_model(self, scale: int) -> str:
        """Quality-tier net for ONE ladder step: the panel-best packaged
        net at this scale (models/selection.py; VERDICT r4 #4 — edsr_l
        wins the x2 panel while edsr_xl wins x3/x4 and the pipeline used
        to pin one family for the whole ladder). Falls back to the
        configured ``quality_model`` when selection is off or no panel
        evidence exists."""
        name = self.config.quality_model
        if not getattr(self.config, "per_scale_selection", False):
            return name
        from .selection import panel_best_model

        return panel_best_model(
            scale, name, self.config.checkpoint_dir,
            ensemble=getattr(self.config, "self_ensemble", False),
            dtype=jnp.dtype(self.config.compute_dtype),
        )

    def _resolve(self, role: str, scale: int, model: Optional[str]) -> str:
        """Net name for (role, scale): explicit ``model`` override (the
        degradation router / fusion members) > per-scale selection >
        configured tier default."""
        if model is not None:
            return model
        if role == "quality":
            return self.select_quality_model(scale)
        return self.config.fast_model

    def resolve_ladder_models(
        self, ladder, provider: str = "quality", model: Optional[str] = None
    ) -> list:
        """Per-step net names the ladder will serve (pipeline resume keys
        and MFU accounting need the ACTUAL choice, not the config)."""
        role = (
            "quality"
            if provider in ("quality", "seedream", "hybrid", "zssr", "fusion",
                            "shrink")
            else "fast"
        )
        return [self._resolve(role, s, model) for s in ladder]

    def _net(
        self, role: str, scale: int, model: Optional[str] = None
    ) -> Callable[[jax.Array], jax.Array]:
        name = self._resolve(role, scale, model)
        if role == "polish":
            name, scale = "espcn_polish", 1
        key = (name, scale)
        if key not in self._apply_fns:
            from .registry import is_pretrained

            module, params = build_model(
                name, scale, self.config.checkpoint_dir,
                dtype=jnp.dtype(self.config.compute_dtype),
            )
            # Pass params as an ARGUMENT (not a closed-over constant): the
            # compiled program then depends only on the param tree's
            # structure/shapes, so the persistent XLA cache survives
            # retrained checkpoints and XLA never constant-folds weights.
            jitted = jax.jit(module.apply)
            self._apply_fns[key] = lambda x, _f=jitted, _p=params: _f(_p, x)
            self._trained[key] = self._is_pretrained(name, scale)
        return self._apply_fns[key]

    def _is_pretrained(self, name: str, scale: int) -> bool:
        """Registry probe with THIS module's checkpoint_dir/dtype (the
        registry cache is keyed on both; a bare probe would build and
        cache params that ignore the user's config)."""
        from .registry import is_pretrained

        return is_pretrained(
            name, scale, self.config.checkpoint_dir,
            dtype=jnp.dtype(self.config.compute_dtype),
        )

    def _net_trained(self, role: str, scale: int, model: Optional[str] = None) -> bool:
        name = self._resolve(role, scale, model)
        if role == "polish":
            name, scale = "espcn_polish", 1
        return self._trained.get((name, scale), False)

    def _fusion_for(self, scale: int) -> Optional[list]:
        """Resolved [(member, weight)] for the fusion provider at ``scale``
        or None. Members without a trained checkpoint are dropped and the
        surviving weights renormalized (an untrained registry net is
        bicubic-exact — keeping its fitted weight would double-count the
        bicubic direction); fusion needs at least two trained nets to be
        worth the extra passes."""
        if scale in self._fusion_cache:
            return self._fusion_cache[scale]
        from .fusion import load_fusion

        resolved = None
        loaded = load_fusion(scale, self.config.checkpoint_dir)
        if loaded is not None:
            members, weights = loaded
            kept = [
                (m, w)
                for m, w in zip(members, weights)
                # "name+" members serve the member's self-ensemble
                if m == "bicubic" or self._is_pretrained(m.rstrip("+"), scale)
            ]
            total = sum(w for _, w in kept)
            n_trained = sum(1 for m, _ in kept if m != "bicubic")
            if n_trained >= 2 and abs(total) > 0.25:
                resolved = [(m, w / total) for m, w in kept]
        self._fusion_cache[scale] = resolved
        return resolved

    def route_for(self, image) -> Tuple[Optional[str], Optional[Any]]:
        """Degradation-aware quality-model override for THIS input (or
        (None, est) to keep the configured net). See models/routing.py."""
        if not getattr(self.config, "auto_route", False):
            return None, None
        from .routing import route_quality_model

        name, est = route_quality_model(
            np.asarray(image), self.config.quality_model,
            getattr(self.config, "robust_model", "edsr_l_robust"),
            self.config.checkpoint_dir,
        )
        return (name if name != self.config.quality_model else None), est

    @staticmethod
    def _to_batch(image: ImageLike) -> Tuple[jax.Array, bool, bool]:
        """-> ([N,H,W,C] float32 [0,255], was_pil, had_batch)."""
        was_pil = Image is not None and isinstance(image, Image.Image)
        if was_pil:
            arr = np.asarray(image.convert("RGB"), np.float32)
        else:
            arr = np.asarray(image, np.float32) if isinstance(image, np.ndarray) else image
        had_batch = arr.ndim == 4
        x = jnp.asarray(arr, jnp.float32)
        if not had_batch:
            x = x[None]
        return x, was_pil, had_batch

    @staticmethod
    def _from_batch(x: jax.Array, was_pil: bool, had_batch: bool):
        arr = np.clip(np.asarray(x), 0, 255)
        if not had_batch:
            arr = arr[0]
        if was_pil:
            return Image.fromarray(arr.astype(np.uint8))
        return arr.astype(np.float32)

    def _run_net(self, x: jax.Array, role: str, scale: float) -> Tuple[jax.Array, bool]:
        """Apply a ladder of net passes (scale_ladder factorization,
        preferring trained steps), finishing with bicubic to the exact
        target (reference maps arbitrary scales to a fixed SIZE_MAP,
        sr:259-264; we resolve exactly).

        Returns ``(out, all_trained)`` — whether EVERY ladder step served
        trained weights. This is the IBP gate: back-projection is the
        quality floor for bicubic-exact (untrained) ladders but costs a
        trained ladder's learned detail (-0.75 dB measured), and a
        composite ladder like trained [2, 2] for 4x never builds (name, 4),
        so the gate must follow the actual steps, not the product scale."""
        target_h = int(round(x.shape[1] * scale))
        target_w = int(round(x.shape[2] * scale))
        trained = {
            s for s in (2, 3, 4)
            if self._is_pretrained(self._resolve(role, s, None), s)
        }
        steps = scale_ladder(scale, trained=trained)
        cur = x
        for s in steps:
            cur = self._net(role, s)(cur)
        if role == "polish":
            cur = self._net("polish", 1)(cur)
        if cur.shape[1] != target_h or cur.shape[2] != target_w:
            cur = resize_bicubic(cur, target_h, target_w)
        all_trained = bool(steps) and all(s in trained for s in steps)
        return cur, all_trained

    # -- deterministic seed (reference: sr:490-515) ------------------------
    def _deterministic_seed(self, image: ImageLike, block_id: str = "") -> int:
        if Image is not None and isinstance(image, Image.Image):
            buf = io.BytesIO()
            thumb = image.copy()
            thumb.thumbnail((64, 64))
            thumb.save(buf, format="PNG")
            img_hash = hashlib.md5(buf.getvalue()).hexdigest()
        else:
            arr = np.asarray(image)
            small = np.asarray(
                resize_bicubic(jnp.asarray(arr, jnp.float32).reshape(
                    (1,) * (3 - min(arr.ndim, 3)) + arr.shape if arr.ndim < 3 else arr.shape
                ), 64, 64)
            ).astype(np.uint8)
            img_hash = hashlib.md5(small.tobytes()).hexdigest()
        seed_hash = hashlib.md5(f"{block_id}:{img_hash}".encode()).hexdigest()
        return int(seed_hash[:8], 16) % (2**31)

    def fold_seed(self, base_key: jax.Array, image: ImageLike, block_id: str = "") -> jax.Array:
        """jax.random.fold_in of the content-hash seed — the TPU-native form
        of the reference's style-consistency seeding."""
        return jax.random.fold_in(base_key, self._deterministic_seed(image, block_id))

    # -- retry (reference: sr:517-559) ------------------------------------
    def retry_with_backoff(self, func: Callable, *args, **kwargs):
        last_exc: Optional[Exception] = None
        for attempt in range(self.MAX_RETRIES):
            try:
                return func(*args, **kwargs)
            except Exception as e:  # noqa: BLE001 - parity: retry any failure
                last_exc = e
                delay = min(self.RETRY_BASE_DELAY * (2**attempt), self.RETRY_MAX_DELAY)
                time.sleep(delay)
        raise last_exc  # type: ignore[misc]

    # -- providers ---------------------------------------------------------
    def upscale_seedream(
        self,
        image: ImageLike,
        prompt: str = "",
        strength: float = 0.5,
        target_scale: float = 2.0,
        seed: Optional[int] = None,
        num_inference_steps: int = 30,
        block_id: str = "",
        category: Optional[str] = None,
    ) -> SuperResolutionResult:
        """Quality provider (reference: sr:561-711). ``category`` applies
        the trained FiLM-conditioned polish after the SR ladder — the
        prompt steers the pixels, as the reference's prompt steers its
        diffusion output (sr:625-640); steps drive back-projection
        refinement; strength is its step size."""
        t0 = time.time()
        x, was_pil, had_batch = self._to_batch(image)
        if seed is None:
            seed = self._deterministic_seed(image, block_id)
        out, ladder_trained = self._run_net(x, "quality", target_scale)
        eff_scale = out.shape[1] / x.shape[1]
        if ladder_trained:
            num_inference_steps = 0  # trained ladder: IBP would undo its detail
        if num_inference_steps > 0 and float(eff_scale).is_integer() and eff_scale > 1:
            out = back_project(
                out, x, int(eff_scale), steps=min(num_inference_steps, 50),
                strength=float(np.clip(strength, 0.05, 1.0)),
            )
        out = jnp.clip(out, 0, 255)
        conditioned = out
        if category is not None:
            conditioned = self._conditioned(out, category)
        return SuperResolutionResult(
            image=self._from_batch(conditioned, was_pil, had_batch),
            original_size=(int(x.shape[2]), int(x.shape[1])),
            upscaled_size=(int(conditioned.shape[2]), int(conditioned.shape[1])),
            scale_factor=float(conditioned.shape[1] / x.shape[1]),
            provider=UpscaleProvider.SEEDREAM.value,
            processing_time=time.time() - t0,
            metadata={
                "seed": seed,
                "prompt": prompt,
                "steps": num_inference_steps,
                "strength": strength,
                "model": self.config.quality_model,
                "conditioned": conditioned is not out,
                "category": category,
            },
        )

    def upscale_veimagex(
        self,
        image: ImageLike,
        template: VeImageXTemplate = VeImageXTemplate.AI_SUPER_RESOLUTION,
        scale_factor: float = 2.0,
    ) -> SuperResolutionResult:
        """Fast provider (reference: sr:713-840)."""
        t0 = time.time()
        x, was_pil, had_batch = self._to_batch(image)
        if template == VeImageXTemplate.FAST_SR and abs(scale_factor - 1.0) < 1e-6:
            out = self._net("polish", 1)(x)
        else:
            out, _ = self._run_net(x, "fast", scale_factor)
        out = jnp.clip(out, 0, 255)
        return SuperResolutionResult(
            image=self._from_batch(out, was_pil, had_batch),
            original_size=(int(x.shape[2]), int(x.shape[1])),
            upscaled_size=(int(out.shape[2]), int(out.shape[1])),
            scale_factor=float(out.shape[1] / x.shape[1]),
            provider=UpscaleProvider.VEIMAGEX.value,
            processing_time=time.time() - t0,
            metadata={"template": template.value, "model": self.config.fast_model},
        )

    def hybrid_upscale(
        self,
        image: ImageLike,
        target_scale: float = 4.0,
        category: str = "general",
        block_id: str = "",
    ) -> SuperResolutionResult:
        """3-stage ladder (reference: sr:842-1009): fast 2x prefilter ->
        quality main (falls back to fast on failure) -> 1.0x polish, with
        per-stage `processing_history`."""
        t0 = time.time()
        history = []
        current: ImageLike = image
        remaining = target_scale

        # Stage 1: fast 2x prefilter (skipped for small targets / failure).
        if target_scale >= 2.0:
            try:
                r1 = self.retry_with_backoff(
                    self.upscale_veimagex, current,
                    VeImageXTemplate.AI_SUPER_RESOLUTION, 2.0,
                )
                current = r1.image
                remaining = target_scale / r1.scale_factor
                history.append({"stage": "fast_prefilter", "scale": r1.scale_factor,
                                "time": r1.processing_time})
            except Exception as e:  # parity: stage-1 failure is non-fatal
                history.append({"stage": "fast_prefilter", "skipped": str(e)})

        # Stage 2: quality main with fallback to fast standard SR.
        prompt = PromptTemplateManager.build_prompt(category)
        from_trained_quality = False
        if remaining > 1.0 + 1e-6:
            try:
                r2 = self.retry_with_backoff(
                    self.upscale_seedream, current, prompt, 0.5, remaining,
                    None, 30, block_id, category=category,
                )
                current = r2.image
                history.append({"stage": "quality_main", "scale": r2.scale_factor,
                                "time": r2.processing_time})
                from_trained_quality = bool(self.trained_scales("quality"))
            except Exception as e:
                r2 = self.upscale_veimagex(
                    current, VeImageXTemplate.STANDARD_SR, remaining
                )
                current = r2.image
                history.append({"stage": "quality_fallback_fast", "scale": r2.scale_factor,
                                "time": r2.processing_time, "reason": str(e)})

        # Stage 3: 1.0x polish — an SR-artifact-cleanup net trained on
        # fast/bicubic-tier outputs (scripts/train_polish.py). Measured
        # effect (held-out corpus, x2): espcn output +0.17 dB, bicubic
        # +0.15, trained edsr_l output -0.07 — so it engages only when
        # the main stage did NOT come from a trained quality net, and is
        # skipped (with the reason in the history) otherwise. Also
        # skipped when espcn_polish has no trained weights (zero-init =
        # identity: the pass would cost a net evaluation for nothing).
        self._net("polish", 1)  # build -> populates the trained flag
        if not self._net_trained("polish", 1):
            history.append({"stage": "fast_polish", "skipped": "untrained"})
        elif from_trained_quality:
            history.append({"stage": "fast_polish",
                            "skipped": "no_gain_after_trained_quality"})
        else:
            r3 = self.upscale_veimagex(current, VeImageXTemplate.FAST_SR, 1.0)
            current = r3.image
            history.append({"stage": "fast_polish", "scale": 1.0,
                            "time": r3.processing_time})

        x0, _, _ = self._to_batch(image)
        xn, _, _ = self._to_batch(current)
        return SuperResolutionResult(
            image=current,
            original_size=(int(x0.shape[2]), int(x0.shape[1])),
            upscaled_size=(int(xn.shape[2]), int(xn.shape[1])),
            scale_factor=float(xn.shape[1] / x0.shape[1]),
            provider=UpscaleProvider.HYBRID.value,
            processing_time=time.time() - t0,
            metadata={"processing_history": history, "category": category},
        )

    # -- dispatcher (reference: sr:1031-1082) ------------------------------
    def upscale(self, image: ImageLike, config: Optional[UpscaleConfig] = None) -> SuperResolutionResult:
        cfg = config or UpscaleConfig()
        provider = cfg.provider
        if provider in (UpscaleProvider.SEEDREAM, UpscaleProvider.QUALITY):
            return self.upscale_seedream(
                image,
                PromptTemplateManager.build_prompt(cfg.category),
                cfg.strength,
                cfg.target_scale,
                cfg.seed,
                cfg.num_inference_steps,
                category=cfg.category,
            )
        if provider in (UpscaleProvider.VEIMAGEX, UpscaleProvider.FAST):
            return self.upscale_veimagex(
                image, VeImageXTemplate.STANDARD_SR, cfg.target_scale
            )
        if provider == UpscaleProvider.BICUBIC:
            t0 = time.time()
            x, was_pil, had_batch = self._to_batch(image)
            s = cfg.target_scale
            if float(s).is_integer():
                out = resize_bicubic_up(x, int(s))
            else:
                out = resize_bicubic(x, int(round(x.shape[1] * s)), int(round(x.shape[2] * s)))
            return SuperResolutionResult(
                image=self._from_batch(jnp.clip(out, 0, 255), was_pil, had_batch),
                original_size=(int(x.shape[2]), int(x.shape[1])),
                upscaled_size=(int(out.shape[2]), int(out.shape[1])),
                scale_factor=float(out.shape[1] / x.shape[1]),
                provider="bicubic",
                processing_time=time.time() - t0,
            )
        return self.hybrid_upscale(image, cfg.target_scale, cfg.category)

    # -- zero-shot self-supervised refinement ------------------------------
    def zssr_prepare(
        self,
        image: ImageLike,
        scale: int = 2,
        steps: int = 150,
        patch: int = 48,
        batch: int = 8,
        lr: Optional[float] = None,
    ) -> None:
        """Fine-tune a net on the input image itself (ZSSR, Shocher et al.
        2018): downscale-degrade the image for LR/HR pairs so the net
        learns this image's internal statistics, then serve the tuned
        params for subsequent ``provider='zssr'`` upscales.

        Starts from the *quality* net's packaged corpus prior when it is
        trained (generic detail prior + per-image adaptation beats either
        alone; fine-tuned gently at 1e-4), else from the fast net at the
        classic from-scratch 5e-4."""
        from .train import zssr_finetune

        arr, _, had_batch = self._to_batch(image)
        img = np.asarray(arr[0] if not had_batch else arr[0])
        base = (
            self.config.quality_model
            if self._is_pretrained(self.config.quality_model, scale)
            else self.config.fast_model
        )
        if lr is None:
            lr = 1e-4 if self._is_pretrained(base, scale) else 5e-4
        module, params = build_model(
            base, scale, self.config.checkpoint_dir,
            dtype=jnp.dtype(self.config.compute_dtype),
        )
        tuned = zssr_finetune(
            module, params, img, scale=scale, steps=steps, patch=patch,
            batch=batch, lr=lr,
        )
        _jitted = jax.jit(module.apply)
        self._apply_fns[("zssr", scale)] = lambda x, _f=_jitted, _p=tuned: _f(_p, x)

    # -- batch device path (pipeline hot path) -----------------------------
    def trained_scales(self, provider: str = "quality", model: Optional[str] = None) -> set:
        """Integer net scales {2,3,4} with trained weights for the model
        the given provider resolves to (or the ``model`` override from
        degradation routing). Drives the pipeline's ladder factorization:
        an untrained step is exact bicubic, so the ladder prefers e.g.
        trained [2, 2] over zero-init [4] at 4x."""
        role = (
            "quality"
            if provider in ("quality", "seedream", "hybrid", "zssr", "fusion",
                            "shrink")
            else "fast"
        )
        # per-scale selection: a scale counts trained when the net that
        # would actually SERVE that step is trained
        return {
            s for s in (2, 3, 4)
            if self._is_pretrained(self._resolve(role, s, model), s)
        }

    def upscale_tiles(
        self,
        tiles: jax.Array,
        scale: int,
        provider: str = "quality",
        steps: int = 0,
        model: Optional[str] = None,
        category: Optional[str] = None,
        alpha: float = 1.0,
    ) -> jax.Array:
        """Jit-friendly batch path: [N,B,B,C] float32 [0,255] -> upscaled.

        This is what the pipeline calls on the device-resident tile batch;
        the PIL-facing methods above exist for API parity and single-image
        use. ``model`` overrides the quality/fast registry pick (the
        degradation router's per-input selection). ``category`` (a prompt
        template key) applies the trained conditioned polish after SR —
        the prompt-steering path (models/conditioning.py); None skips it.
        ``provider="shrink"`` serves ``bicubic + alpha * (net - bicubic)``
        — the probe-fitted residual shrinkage (routing.probe_sr_alpha) for
        inputs where the net alone measures at or below bicubic."""
        if provider == "bicubic":
            return self._conditioned(resize_bicubic_up(tiles, scale), category)
        if provider == "shrink":
            net_out = self.upscale_tiles(
                tiles, scale, provider="quality", steps=steps, model=model,
                category=None,
            )
            bic = resize_bicubic_up(tiles, scale)
            out = bic + jnp.float32(alpha) * (net_out - bic)
            return self._conditioned(jnp.clip(out, 0, 255), category)
        if provider == "zssr" and ("zssr", scale) in self._apply_fns:
            # zssr params are trained (on the input itself) — no IBP.
            out = self._apply_fns[("zssr", scale)](tiles)
            return self._conditioned(jnp.clip(out, 0, 255), category)
        if provider == "fusion" and model is None:
            # ``model`` set means the degradation router overrode the tier
            # for this damaged input — a single robust net, not the
            # clean-photo fusion blend.
            fused = self._fusion_for(scale)
            if fused is not None:
                se = (
                    getattr(self.config, "self_ensemble", False)
                    and tiles.shape[1] == tiles.shape[2]
                )
                out = None
                for name, w in fused:
                    if name == "bicubic":
                        y = resize_bicubic_up(tiles, scale)
                    else:
                        # "name+": the FUSION.json fit ran this member as
                        # its dihedral self-ensemble — serve it the same way
                        member_se = se or name.endswith("+")
                        net = self._net("quality", scale,
                                        model=name.rstrip("+"))
                        y = (_dihedral_ensemble(net, tiles)
                             if member_se and tiles.shape[1] == tiles.shape[2]
                             else net(tiles))
                    out = y * w if out is None else out + y * w
                return self._conditioned(jnp.clip(out, 0, 255), category)
            provider = "quality"  # not packaged at this scale
        role = (
            "quality"
            if provider in ("quality", "seedream", "hybrid", "zssr", "fusion")
            else "fast"
        )
        net = self._net(role, scale, model=model)
        if getattr(self.config, "self_ensemble", False) and tiles.shape[1] == tiles.shape[2]:
            out = _dihedral_ensemble(net, tiles)
        else:
            out = net(tiles)
        if provider in ("hybrid",) and not self._net_trained(role, scale, model=model):
            # Polish is a cleanup net for fast/bicubic-tier outputs; after a
            # trained quality net it costs -0.07 dB (see hybrid_upscale).
            polish = self._net("polish", 1)
            if self._net_trained("polish", 1):  # identity when untrained
                out = polish(out)
        if steps > 0 and not self._net_trained(role, scale, model=model):
            out = back_project(out, tiles, scale, steps=steps)
        return self._conditioned(jnp.clip(out, 0, 255), category)

    def _conditioned(
        self, out: jax.Array, category: Optional[str]
    ) -> jax.Array:
        """Prompt-conditioned polish (models/conditioning.py) — the path
        by which a prompt category changes output pixels (reference
        analog: prompt-steered diffusion, sr:625-640). No-op when no
        category is requested or no trained cond_polish is packaged.

        Callers that trace this under jax.jit must warm
        ``build_cond_polish`` eagerly first: the orbax restore fails
        inside a trace and the loader's try/except would silently
        disable conditioning (pipeline._upscale_batch does this)."""
        if category is None:
            return out
        from .conditioning import build_cond_polish, cond_vector

        module, params, trained = build_cond_polish(
            self.config.checkpoint_dir, jnp.dtype(self.config.compute_dtype)
        )
        if not trained:
            return out
        key = ("cond_polish", 1)
        if key not in self._apply_fns:
            # params as an ARGUMENT, matching _net: the persistent XLA
            # cache survives retrained checkpoints.
            jitted = jax.jit(module.apply)
            self._apply_fns[key] = lambda x, c, _f=jitted, _p=params: _f(_p, x, c)
        return jnp.clip(self._apply_fns[key](out, cond_vector(category)), 0, 255)
