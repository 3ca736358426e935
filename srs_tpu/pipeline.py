"""SuperResolutionPipeline — the 5-stage public entry point.

API-parity port of the reference pipeline (reference: main.py:47-441):
`PipelineConfig`, `PipelineResult`, `SuperResolutionPipeline` with async
context manager and the 5 stages — tiling, parallel SR, blending, QA,
save — plus `_calculate_target_size` (reference main.py:157-192; dead code
there, actually used here).

TPU-native inversion (SURVEY §7 design stance): the reference is an async
I/O orchestrator around per-tile HTTPS calls with a 30-way semaphore
(main.py:254-262); here stages 1-3 are jitted array programs over one
HBM-resident tile batch. `process()` is synchronous — there is no network
to await. The AgentScheduler still runs as the policy/bookkeeping layer
(properly awaited, fixing the reference's un-awaited `submit_task` defect,
main.py:251) and its checkpoint/statistics surfaces feed the monitor UI.
"""

from __future__ import annotations

import asyncio
import json
import logging
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .blending import BlendingModule
from .config import RESOLUTION_PRESETS, SystemConfig
from .io.image import load_image, save_image
from .models.sr_module import SuperResolutionModule
from .ops import blend as B
from .ops.weights import layout_weights
from .ops.tiles import extract_tiles, pad_image
from .qa.module import QualityAssessmentModule
from .scheduler.scheduler import AgentScheduler, Task, TaskStatus
from .tiling.geometry import compute_layout
from .tiling.tiling import TilingModule

logger = logging.getLogger("srs_tpu.pipeline")


class PipelineCancelled(RuntimeError):
    """Raised between stages after SuperResolutionPipeline.cancel()."""


@dataclass
class PipelineConfig:
    """(reference: main.py:47-76). volc_* credential fields are accepted
    for drop-in parity and ignored (no remote engine)."""

    block_size: int = 512
    overlap_ratio: float = 0.2
    padding_mode: str = "mirror"
    target_resolution: str = "100MP"
    seedream_strength: float = 0.5
    seedream_steps: int = 50
    blend_method: str = "laplacian"
    num_pyramid_levels: int = 6
    max_agents: int = 60
    max_concurrent: int = 30
    enable_qa: bool = True
    qa_device: str = "tpu"
    provider: str = "quality"  # quality | fast | hybrid | bicubic | zssr | fusion
    quality_model: str = "edsr_xl"  # registry net for the quality tier (e.g. rcan)
    fast_model: str = "espcn"  # registry net for the fast tier
    # Probe each input's noise/blur and auto-swap the quality tier to the
    # degradation-robust net on damaged inputs (models/routing.py).
    auto_route: bool = True
    robust_model: str = "edsr_l_robust"
    # SR-gain self-probe (models/routing.py probe_sr_gain): reconstruct a
    # crop of THIS input through the net and through bicubic; when the net
    # measures below this floor (dB vs bicubic) the whole job serves the
    # sr_gain_route ladder — the per-image guard for self-similar textures
    # (wood-family panel crops) where every clean net loses to bicubic.
    sr_gain_floor: float = 0.0
    # Where probe-negative inputs go: "shrink" (serve bicubic +
    # alpha*(net - bicubic) with alpha fitted per image on the probe
    # crops — PSNR-optimal between the two ladders, keeps the correlated
    # fraction of the net's detail; routing.probe_sr_alpha), "bicubic"
    # (never hallucinate; the hard floor, alpha=0), or "zssr" (fine-tune
    # the prior on the input's own statistics first; costs zssr_steps of
    # per-image training). Default "shrink": the held-out routed panel
    # measures it >= the bicubic route on every image and strictly better
    # on the probe-negative one (wood +0.107 dB vs +0.0, alpha 0.483 —
    # EVAL.json pipeline_x2.routed_panel_shrink, .r5/log/routed_panel.log).
    sr_gain_route: str = "shrink"
    # Texture-tier candidates the shrink route may serve instead of the
    # configured net: when the probe measures the clean net below the
    # floor, every packaged candidate here is probed too and the job
    # serves whichever net's alpha-shrunk ladder predicts the best PSNR
    # on the input's own crops (routing.best_shrink_candidate). The
    # probe guarantees a candidate never serves below bicubic, but it
    # CANNOT guarantee the candidate beats the incumbent's shrinkage:
    # the probe reconstructs one octave below serving scale, and the
    # packaged edsr_l_tex wins that in-octave test on the held-out wood
    # image while serving worse than edsr_l's shrinkage (+0.018 vs
    # +0.107 dB, even under leave-one-out scoring — EVAL.json
    # pipeline_x2.routed_panel_shrink across .r5 runs). Demoted from the
    # default until a candidate measures a panel win; the mechanism
    # stays for drop-in tiers.
    texture_models: Tuple[str, ...] = ()
    # Per-scale family selection (models/selection.py): each ladder step
    # serves the panel-best packaged net at that scale (x2 -> edsr_l,
    # x3/x4 -> edsr_xl on the round-4 panel); quality_model is the
    # fallback. Set False to pin quality_model for every step.
    per_scale_selection: bool = True
    # Geometric self-ensemble over the 8 dihedral tile transforms (EDSR's
    # "+" mode): +0.3-0.4 dB on photographs for 8x SR-stage compute.
    self_ensemble: bool = False
    # Prompt template category (models/prompts.py) applied as a FiLM
    # conditioning vector by the trained cond_polish after the SR ladder
    # (models/conditioning.py) — the reference's prompt-steering analog.
    # None = unconditioned (default; identical to pre-conditioning runs).
    prompt_category: Optional[str] = None
    zssr_steps: int = 150  # self-supervised finetune steps for provider=zssr
    ibp_steps: int = 8  # back-projection refinement steps on the tile batch
    content_aware: bool = False  # seam placement avoids faces/text/saliency
    # Device mesh, e.g. {"data": 4, "space": 2}; None = single device.
    mesh_shape: Optional[Dict[str, int]] = None
    bit_depth: int = 8  # 8 or 16 (16-bit TIFF via the native writer)
    # Persist upscaled tiles to the tile store after SR and resume from
    # them on re-run (reference probes its cache before stage 2,
    # main.py:299-304). Off by default: the store write fetches the full
    # upscaled batch over the ~30 MB/s host link, which at print sizes
    # costs more than recomputing — enable for kill-resumable long jobs.
    enable_checkpoint: bool = False
    enable_seam_repair: bool = False  # post-blend seam QA + repair pass
    enable_color_correction: bool = False  # histogram-match to source
    seam_threshold: float = 0.95
    volc_ak: str = ""
    volc_sk: str = ""
    volc_region: str = ""


@dataclass
class PipelineResult:
    """(reference: main.py:78-90)."""

    success: bool
    output_path: Optional[str]
    processing_time: float
    total_blocks: int
    successful_blocks: int
    failed_blocks: int
    quality_score: Optional[float]
    quality_report: Optional[Dict[str, Any]]
    error_message: Optional[str]
    stage_times: Dict[str, float] = field(default_factory=dict)


# Ladder factorization lives with the SR engine; re-exported here for the
# tests and historical imports.
from .models.sr_module import scale_ladder as _scale_ladder  # noqa: E402


class SuperResolutionPipeline:
    """tile -> SR -> blend -> assess -> save."""

    def __init__(self, config: Optional[PipelineConfig] = None):
        from .utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        self.config = config or PipelineConfig()
        sys_cfg = SystemConfig.from_env()
        # Stage modules constructed eagerly (reference: main.py:115-128).
        self.tiling_module = TilingModule(
            block_size=self.config.block_size,
            overlap_ratio=self.config.overlap_ratio,
            padding_mode=self.config.padding_mode,
            config=sys_cfg.tiling,
        )
        self.blending_module = BlendingModule(
            config=sys_cfg.blending, num_levels=self.config.num_pyramid_levels
        )
        self.quality_module = (
            QualityAssessmentModule(sys_cfg.quality, device=self.config.qa_device)
            if self.config.enable_qa
            else None
        )
        # Engine + scheduler built in __aenter__ for reference parity
        # (main.py:136-150) but also lazily on first use for sync callers.
        self.sr_module: Optional[SuperResolutionModule] = None
        self.scheduler: Optional[AgentScheduler] = None
        # Cooperative cancellation: checked between stages (the WebUI
        # monitor's Cancel button and any host thread can abort a
        # print-grade job without killing the process).
        self._cancel_event = threading.Event()
        # Fused whole-ladder programs keyed by (ladder, provider, steps,
        # model, category) — see _upscale_batch. Lives on the instance so
        # a fresh pipeline after a retrain re-bakes checkpoints.
        self._ladder_jits: Dict[tuple, Any] = {}
        # Batch pipelining (process_batch): serializes the device stages
        # (2-4) across worker threads so job N+1's SR/blend compute fills
        # the chips while job N's save streams over the host link — the
        # on-device analog of the reference's 60-concurrent tile requests
        # across images (main.py:254-262).
        self._stage_sem: Optional[threading.Semaphore] = None
        self._sched_tlock = threading.Lock()

    def cancel(self) -> None:
        """Request cancellation; process() aborts at the next stage boundary."""
        self._cancel_event.set()

    def _check_cancel(self, stage: str) -> None:
        if self._cancel_event.is_set():
            raise PipelineCancelled(f"cancelled before {stage}")

    # -- async context parity (reference: main.py:136-155) -----------------
    async def __aenter__(self) -> "SuperResolutionPipeline":
        self._ensure_engine()
        return self

    async def __aexit__(self, exc_type, exc, tb) -> None:
        if self.scheduler is not None:
            await self.scheduler.stop()

    def __enter__(self) -> "SuperResolutionPipeline":
        self._ensure_engine()
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        pass

    def _ensure_engine(self) -> None:
        if self.sr_module is None:
            from dataclasses import replace as _dc_replace

            from .config import ModelConfig

            self.sr_module = SuperResolutionModule(config=_dc_replace(
                ModelConfig(),
                quality_model=self.config.quality_model,
                fast_model=self.config.fast_model,
                auto_route=self.config.auto_route,
                robust_model=self.config.robust_model,
                per_scale_selection=self.config.per_scale_selection,
                self_ensemble=self.config.self_ensemble,
            ))
        if getattr(self, "dispatcher", None) is None:
            self.dispatcher = None
            if self.config.mesh_shape:
                from .parallel import MeshTileDispatcher, make_mesh

                self.dispatcher = MeshTileDispatcher(make_mesh(self.config.mesh_shape))
        if self.scheduler is None:
            self.scheduler = AgentScheduler(
                max_agents=self.config.max_agents,
                max_concurrent=self.config.max_concurrent,
                initial_agents=0,
            )
            try:
                self.scheduler.attach_mesh_devices()
            except Exception:
                pass

    # -- target size (reference: main.py:157-192) --------------------------
    def _calculate_target_size(
        self, original_size: Tuple[int, int], target_resolution: str
    ) -> Tuple[int, int]:
        width, height = original_size
        aspect = width / height
        if target_resolution in RESOLUTION_PRESETS:
            tw, th = RESOLUTION_PRESETS[target_resolution]
            if aspect > tw / th:
                th = int(tw / aspect)
            else:
                tw = int(th * aspect)
            return (tw, th)
        try:
            w, h = map(int, target_resolution.lower().split("x"))
            return (w, h)
        except Exception:
            logger.warning("unparseable target resolution %r; using 100MP", target_resolution)
            tw, th = RESOLUTION_PRESETS["100MP"]
            if aspect > tw / th:
                th = int(tw / aspect)
            else:
                tw = int(th * aspect)
            return (tw, th)

    # -- device stages -----------------------------------------------------
    def _trained_scales(
        self, provider: Optional[str] = None, model: Optional[str] = None
    ) -> Optional[set]:
        """Trained net scales for the active provider (None = no
        preference, e.g. provider=bicubic or engine not built)."""
        p = provider or self.config.provider
        if p == "bicubic" or self.sr_module is None:
            return None
        try:
            return self.sr_module.trained_scales(p, model=model)
        except Exception:
            return None

    def _upscale_batch(
        self,
        tiles: jnp.ndarray,
        ladder: List[int],
        provider: Optional[str] = None,
        model: Optional[str] = None,
        category: Optional[str] = None,
    ) -> jnp.ndarray:
        """Run the net ladder over the tile batch, chunked to bound HBM.

        With a mesh configured, the batch shards over the ``data`` axis and
        the whole ladder runs as one sharded program (per-device memory is
        batch/N_data, so host-side chunking is unnecessary).
        ``provider`` overrides the configured provider (the degradation
        ladder's fallback-engine path); ``category`` overrides the
        configured prompt-conditioning category (per-job prompt)."""
        assert self.sr_module is not None
        provider_name = provider or self.config.provider
        cat = category if category is not None else self.config.prompt_category
        if cat is not None:
            # Warm the conditioned-polish checkpoint cache EAGERLY: the
            # orbax restore cannot run inside a jit trace (tensorstore
            # fails under tracing and the loader's try/except would
            # silently turn conditioning into a no-op).
            from .models.conditioning import build_cond_polish

            build_cond_polish(
                self.sr_module.config.checkpoint_dir,
                jnp.dtype(self.sr_module.config.compute_dtype),
            )
        # Warm every net the ladder will serve EAGERLY, before any jit
        # trace: a checkpoint restore reached from inside a trace used to
        # fail into the silent bicubic-init fallback (registry now also
        # guards with ensure_compile_time_eval, but warm checkpoints keep
        # the trace free of host IO) — and _net_trained/_fusion_for answers
        # are only accurate once the nets are built.
        if provider_name not in ("bicubic",):
            for s in ladder:
                members = (
                    self.sr_module._fusion_for(int(s))
                    if provider_name == "fusion" and model is None
                    else None
                ) or [(None, 1.0)]
                for nm, _w in members:
                    if nm == "bicubic":
                        continue
                    role = ("quality" if provider_name in (
                        "quality", "seedream", "hybrid", "zssr", "fusion",
                        "shrink")
                        else "fast")
                    self.sr_module._net(
                        role, int(s),
                        model=nm.rstrip("+") if nm else model,
                    )
        # Probe-fitted residual shrinkage: the per-image alpha is baked as
        # a compile-time constant into the ladder program, so every jit
        # memo key below must include it (rounded to 3 decimals at probe
        # time — ~1000 distinct programs worst-case, in practice a handful).
        shrink_alpha = (
            float(getattr(self, "_shrink_alpha", 1.0))
            if provider_name == "shrink" else 1.0
        )
        if self.dispatcher is not None and provider_name != "bicubic":
            provider = provider_name
            steps = self.config.ibp_steps

            def ladder_fn(x):
                cur = x
                for si, s in enumerate(ladder):
                    last = si == len(ladder) - 1
                    cur = self.sr_module.upscale_tiles(
                        cur, s, provider=provider,
                        steps=steps if last else 0,
                        model=model,
                        category=cat if last else None,
                        alpha=shrink_alpha,
                    )
                if not ladder:  # no net pass: conditioning still applies
                    cur = self.sr_module._conditioned(cur, cat)
                return cur

            return self.dispatcher.run_tiled(
                ladder_fn, tiles,
                key=f"ladder{ladder}{provider}{steps}{model}{cat}{shrink_alpha}"
                    f"{self._ladder_models(list(ladder), model, provider=provider_name)}",
            )
        n = int(tiles.shape[0])
        # Multi-pass providers (the "+" dihedral self-ensemble and the
        # fusion blend) run STAGED: tracing all passes into one program
        # (8 transforms x members x ladder steps) built a jit program that
        # exceeded HBM at the 100MP preset (measured 18.61G > 15.75G with
        # the 2-tile chunk) and SIGKILLed this image's remote compile
        # helper — every bench attempt failed and the degradation ladder
        # silently served bicubic. Staging keeps each compiled program at
        # the single-pass footprint (see _staged_multipass).
        ens_cfg = bool(getattr(self.config, "self_ensemble", False))
        square = tiles.shape[1] == tiles.shape[2]

        def _step_trained(s: int) -> bool:
            # What actually serves at this step: the resolved fusion
            # members (already filtered to trained checkpoints) or the
            # resolved quality net.
            if provider_name == "fusion" and model is None:
                if self.sr_module._fusion_for(int(s)) is not None:
                    return True
            return self.sr_module._net_trained("quality", int(s), model=model)

        if (
            square
            and ladder
            and provider_name not in ("bicubic", "zssr", "shrink")
            and (ens_cfg or (provider_name == "fusion" and model is None))
            and all(_step_trained(s) for s in ladder)
        ):
            return self._staged_multipass(tiles, ladder, provider_name, model, cat)
        final_block = int(tiles.shape[1]) * int(np.prod(ladder)) if ladder else int(tiles.shape[1])
        # Peak per tile ~= pre-shuffle feature maps (64ch bf16 at output
        # resolution after progressive x2 stages) + fp32 output. Budget
        # targets 2 tiles per program at the 100MP preset's 4608 final
        # block (measured: XLA allocates ~2.7 GB/tile there; a 2-tile
        # program is 9% faster device-side than two 1-tile programs and
        # halves the dispatch round-trips, while a 3-tile program already
        # kills this image's remote compile helper). The shrink provider
        # carries one extra output-resolution buffer (the bicubic arm).
        bytes_per_tile = final_block * final_block * (
            200 if provider_name == "shrink" else 160
        )
        chunk = max(1, min(n, int(7e9 // max(bytes_per_tile, 1))))

        def ladder_chunk(cur):
            for si, s in enumerate(ladder):
                last = si == len(ladder) - 1
                cur = self.sr_module.upscale_tiles(
                    cur, s, provider=provider_name,
                    steps=self.config.ibp_steps if last else 0, model=model,
                    category=cat if last else None,
                    alpha=shrink_alpha,
                )
            if not ladder:  # no net pass: conditioning still applies
                cur = self.sr_module._conditioned(cur, cat)
            return cur

        # One jitted program per chunk, not one per ladder step: each
        # dispatch to the tunneled remote chip costs ~90 ms of host
        # latency, so fusing the whole [3,3] ladder + clips into a single
        # program cut the measured 100MP SR stage 1.77 s -> 1.21 s
        # (device compute is ~1.2 s; MFU 25% -> 37%). The fused program
        # bakes net params as HLO constants — acceptable because a
        # recompile only recurs after a retrain — EXCEPT for zssr, whose
        # per-image fine-tuned params change every job and must stay in
        # the per-step (params-as-arguments) path.
        if provider_name != "zssr":
            key = (tuple(ladder), provider_name, self.config.ibp_steps, model,
                   cat, shrink_alpha)
            fn = self._ladder_jits.get(key)
            if fn is None:
                fn = jax.jit(ladder_chunk)
                self._ladder_jits[key] = fn
            ladder_chunk = fn
        # (Investigated and rejected: fusing ALL chunks into one lax.scan
        # program to save the per-chunk dispatch round-trips. Measured on
        # the real chip (r3, 100MP/16 tiles): SR stage 1.42 s and MFU 31.0%
        # in BOTH variants — jax's async dispatch already hides the later
        # chunks' ~90 ms host latency under the first chunk's device
        # compute, so the single-dispatch program buys nothing and costs a
        # second compiled copy of the ladder. 1.42 s IS device compute.)
        outs = []
        for i in range(0, n, chunk):
            outs.append(ladder_chunk(tiles[i : i + chunk]))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def _staged_multipass(
        self,
        tiles: jnp.ndarray,
        ladder: List[int],
        provider_name: str,
        model: Optional[str],
        cat: Optional[str],
    ) -> jnp.ndarray:
        """Dispatch-staged execution for multi-pass providers.

        Semantics match ``upscale_tiles``: per ladder step, a weighted sum
        over fusion members, each member optionally averaged over the 8
        dihedral transforms. The difference is execution shape: ONE cached
        single-net program per (member, scale) — the same programs the
        plain quality path compiles — with the rot90/flip transforms and
        the weighted accumulate dispatched as separate small XLA programs.
        Peak HBM stays at the single-pass footprint plus one accumulator,
        and the remote compile helper only ever sees single-net programs
        (the fully-traced variant was 22 net applications per step at the
        refit fusion's member list and OOMed/killed it; see CLAUDE.md's
        staged-per-level rule for the blend, same hazard). The ~90 ms
        per-dispatch host latency hides under device compute exactly as in
        the chunked ladder path (measured there, r3)."""
        from .ops.resize import resize_bicubic_up

        sr = self.sr_module
        ens_cfg = bool(getattr(self.config, "self_ensemble", False))
        n = int(tiles.shape[0])
        final_block = int(tiles.shape[1]) * int(np.prod(ladder))
        bytes_per_tile = final_block * final_block * 160
        chunk = max(1, min(n, int(7e9 // max(bytes_per_tile, 1))))

        def member_pass(net, x, ensembled: bool) -> jnp.ndarray:
            if not ensembled:
                return net(x)
            acc = None
            for k in range(4):
                for flip in (False, True):
                    t = jnp.rot90(x, k, axes=(1, 2))
                    if flip:
                        t = t[:, :, ::-1]
                    o = net(t)
                    if flip:
                        o = o[:, :, ::-1]
                    o = jnp.rot90(o, -k, axes=(1, 2))
                    acc = o if acc is None else acc + o
            return acc / 8.0

        outs = []
        for i in range(0, n, chunk):
            cur = tiles[i : i + chunk]
            for si, s in enumerate(ladder):
                members = None
                if provider_name == "fusion" and model is None:
                    members = sr._fusion_for(s)
                if members is None:
                    members = [(model or sr._resolve("quality", s, model), 1.0)]
                acc = None
                for name, w in members:
                    if name == "bicubic":
                        y = resize_bicubic_up(cur, s)
                    else:
                        base = name.rstrip("+")
                        net = sr._net("quality", s, model=base)
                        y = member_pass(net, cur, ens_cfg or name.endswith("+"))
                    acc = y * w if acc is None else acc + y * w
                cur = jnp.clip(acc, 0, 255)
            outs.append(sr._conditioned(cur, cat) if cat is not None else cur)
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    # -- stage 2 with failure recovery --------------------------------------
    _FALLBACK_PROVIDERS = {"quality": "fast", "hybrid": "fast", "zssr": "fast",
                           "seedream": "fast", "fusion": "fast",
                           "fast": "bicubic", "veimagex": "bicubic"}

    def _run_stage2(
        self,
        image: np.ndarray,
        tiles: jnp.ndarray,
        ladder: List[int],
        layout,
        tasks: List[Task],
        max_attempts: int = 10,
        model: Optional[str] = None,
        category: Optional[str] = None,
        provider: Optional[str] = None,
    ):
        """Run the SR batch with the scheduler's retry -> degradation ladder
        wired to REAL device compute (reference: agent_scheduler.py:752-887).

        A failed/OOM'd device batch routes through ``handle_failure``: the
        first ``max_retries`` failures re-run unchanged (transient-error
        parity); after that ``_apply_degradation`` rewrites the task config
        and the batch re-tiles at the degraded tile size (256/16), drops to
        the fallback engine, and reduces the net scale (x0.7, floor 1.5 —
        the output still reaches the requested size via the final bicubic
        in the banded save). ``provider`` seeds the override (the SR-gain
        probe's bicubic routing). Returns (up_tiles, layout, ladder,
        provider).
        """
        degradations = 0
        for attempt in range(max_attempts):
            try:
                up_tiles = self._upscale_batch(
                    tiles, ladder, provider=provider, model=model,
                    category=category,
                )
                up_tiles.block_until_ready()
                # Instrumentation for last_run_info/bench: a row that ran
                # through retries or the degradation ladder must say so —
                # round-5 lesson: two bench rows silently measured the
                # bicubic fallback and labeled it fusion/ensemble.
                self._sr_attempts = attempt + 1
                self._sr_degradations = degradations
                return up_tiles, layout, ladder, provider
            except Exception as e:  # noqa: BLE001 - any device failure enters the ladder
                if self.scheduler is None or attempt == max_attempts - 1:
                    raise
                logger.warning("SR batch failed (attempt %d): %s", attempt + 1, e)

                async def _report():
                    for t in tasks:
                        await self.scheduler.handle_failure(t, str(e))

                self._run_async(_report())
                degraded = [t for t in tasks if t.status == TaskStatus.DEGRADED]
                if degraded and degradations < len(self._FALLBACK_PROVIDERS):
                    degradations += 1
                    cfg = degraded[0].tile_config
                    block = int(cfg.get("tile_size", 256))
                    overlap_px = int(cfg.get("overlap", 16))
                    cur = provider or self.config.provider
                    if cfg.get("use_fallback_engine"):
                        provider = self._FALLBACK_PROVIDERS.get(cur, "bicubic")
                        model = None  # routed override is a quality-tier pick
                    new_scale = float(degraded[0].scale_factor)
                    ladder = _scale_ladder(new_scale, trained=self._trained_scales(provider))
                    layout = compute_layout(
                        image.shape[1], image.shape[0], block,
                        overlap_px / max(block, 1),
                        step_multiple=self.tiling_module.step_multiple,
                    )
                    padded = pad_image(
                        jnp.asarray(image, jnp.float32), layout,
                        self.tiling_module.padding_mode.value,
                    )
                    tiles = extract_tiles(padded, layout)
                    logger.warning(
                        "degraded: tile %d/%d, provider %s, ladder %s",
                        block, overlap_px, provider, ladder,
                    )
        raise RuntimeError("unreachable")  # pragma: no cover

    def _weight_profiles(self, out_layout, image: Optional[np.ndarray], net_scale: int):
        """Separable (wy, wx) blend profiles: content-aware when enabled,
        ramp otherwise. Separable weights keep the blend HBM-lean."""
        from .ops.weights import layout_weight_profiles

        if self.config.content_aware and image is not None:
            try:
                from .tiling.content import ContentAnalyzer
                from .tiling.content_layout import content_aware_weight_profiles

                zone = ContentAnalyzer().create_forbidden_zone_map(image)
                zone_up = np.repeat(np.repeat(zone, net_scale, axis=0), net_scale, axis=1)
                pad_h = out_layout.padded_h - zone_up.shape[0]
                pad_w = out_layout.padded_w - zone_up.shape[1]
                zone_up = np.pad(zone_up, ((0, max(0, pad_h)), (0, max(0, pad_w))))
                zone_up = zone_up[: out_layout.padded_h, : out_layout.padded_w]
                return content_aware_weight_profiles(out_layout, zone_up)
            except Exception:
                logger.warning("content-aware weighting failed; using ramp")
        return layout_weight_profiles(out_layout)

    def _blend_weights(self, out_layout, kind: str, image: Optional[np.ndarray],
                       net_scale: int, weight_type: str = "cosine"):
        if self.config.content_aware and image is not None:
            try:
                from .tiling.content import ContentAnalyzer
                from .tiling.content_layout import content_aware_weights

                zone = ContentAnalyzer().create_forbidden_zone_map(image)
                zone_up = np.repeat(np.repeat(zone, net_scale, axis=0), net_scale, axis=1)
                pad_h = out_layout.padded_h - zone_up.shape[0]
                pad_w = out_layout.padded_w - zone_up.shape[1]
                zone_up = np.pad(zone_up, ((0, max(0, pad_h)), (0, max(0, pad_w))))
                zone_up = zone_up[: out_layout.padded_h, : out_layout.padded_w]
                return content_aware_weights(out_layout, zone_up)
            except Exception:
                logger.warning("content-aware weighting failed; using %s", kind)
        if kind == "distance":
            return layout_weights(out_layout, kind="distance", weight_type=weight_type)
        return layout_weights(out_layout, kind="ramp")

    def _blend(self, up_tiles: jnp.ndarray, out_layout,
               image: Optional[np.ndarray] = None, net_scale: int = 1) -> jnp.ndarray:
        method = self.config.blend_method
        if method == "laplacian":
            profiles = self._weight_profiles(out_layout, image, net_scale)
            # Sharded blend when a space axis is configured and divides the
            # tile rows (canvas never materializes on one chip).
            if (
                self.dispatcher is not None
                and self.dispatcher._space_ok(out_layout)
                and not self.config.enable_seam_repair
                and not self.config.enable_color_correction
            ):
                # Deferred: the blend returns a ShardedCanvas and the save
                # stage streams each device's own quantized bands — no
                # full-resolution canvas ever gathers on one chip.
                return self.dispatcher.laplacian_blend(
                    up_tiles, profiles, out_layout,
                    levels=self.config.num_pyramid_levels,
                    collapse_last=False,
                )
            # Defer the level-0 collapse to the banded output programs when
            # nothing downstream needs the full-res canvas — the collapse of
            # a 100-200 MP canvas is the worst compile in the pipeline.
            defer = not (
                self.config.enable_seam_repair or self.config.enable_color_correction
            )
            return B.laplacian_fusion_tiles(
                up_tiles, None, out_layout,
                levels=self.config.num_pyramid_levels,
                weight_profiles=profiles,
                clip_range=None,  # the banded save path clips + quantizes
                collapse_last=not defer,
            )
        if method == "multi_band":
            weights = self._blend_weights(out_layout, "distance", image, net_scale, "sigmoid")
            return B.laplacian_fusion_tiles(
                up_tiles, weights, out_layout, levels=self.config.num_pyramid_levels
            )
        if method in ("weighted", "weighted_average", "feather"):
            kind = "ramp" if method != "feather" else "distance"
            return B.weighted_fusion_tiles(
                up_tiles, self._blend_weights(out_layout, kind, image, net_scale),
                out_layout, clip_range=None,
            )
        if method in ("gradient", "gradient_domain", "poisson"):
            return B.gradient_domain_fusion_tiles(
                up_tiles, self._blend_weights(out_layout, "ramp", image, net_scale),
                out_layout,
            )
        raise ValueError(f"unknown blend method {method!r}")

    # -- SR checkpoint/resume (reference: main.py:299-304) ------------------
    def _ladder_models(
        self, ladder: List[int], model: Optional[str] = None,
        provider: Optional[str] = None,
    ) -> List[str]:
        """Per-step net names the SR stage will actually serve (per-scale
        selection aware; models/selection.py). Resume keys and MFU
        accounting key on THIS, not on the configured tier."""
        try:
            return self.sr_module.resolve_ladder_models(
                ladder, provider or self.config.provider, model
            )
        except Exception:  # noqa: BLE001 - engine not built / bicubic
            return [model or self.config.quality_model] * len(ladder)

    def _resume_key(
        self, image_hash: str, ladder: List[int], layout,
        model: Optional[str] = None, category: Optional[str] = None,
        step_models: Optional[List[str]] = None,
        provider: Optional[str] = None,
    ) -> Optional[str]:
        """Content-addressed key for the upscaled-tile store: any knob that
        changes the SR output changes the key (incl. the conditioning
        category — a conditioned run must not serve another run's tiles —
        and the per-scale model selection)."""
        if not self.config.enable_checkpoint:
            return None
        import hashlib as _hashlib

        prov = provider or self.config.provider
        sig = (
            f"{image_hash}:{prov}:{ladder}:{self.config.ibp_steps}"
            f":{layout.block}:{layout.overlap}:{self.config.zssr_steps}"
            f":{self.config.seedream_steps}:{model or self.config.quality_model}"
            f":{category if category is not None else self.config.prompt_category}"
            f":{step_models if step_models is not None else self._ladder_models(ladder, model)}"
            # the per-image shrinkage coefficient changes the pixels
            f":{getattr(self, '_shrink_alpha', None) if prov == 'shrink' else ''}"
        )
        return "sr-" + _hashlib.md5(sig.encode()).hexdigest()

    def _probe_resume(
        self, resume_key: Optional[str], num_tiles: int
    ) -> Optional[Dict[int, np.ndarray]]:
        if resume_key is None:
            return None
        store = self.tiling_module.store
        cached: Dict[int, np.ndarray] = {}
        for i in range(num_tiles):
            data = store.get(resume_key, f"sr_{i}") if store.has(resume_key, f"sr_{i}") else None
            if data is not None:
                cached[i] = np.asarray(data, np.float32)
        return cached

    def _checkpoint_sr(self, resume_key: Optional[str], up_tiles: jnp.ndarray) -> None:
        """Persist the upscaled batch (uint8 — 4x less host-link traffic;
        the canvas quantizes to 8/16-bit at save anyway)."""
        if resume_key is None:
            return
        store = self.tiling_module.store
        up_np = np.asarray(jnp.clip(jnp.rint(up_tiles), 0, 255)).astype(np.uint8)
        for i in range(up_np.shape[0]):
            store.put(resume_key, f"sr_{i}", up_np[i])

    # -- full-resolution no-reference QA ------------------------------------
    @staticmethod
    def _sample_fullres_crops(
        band: np.ndarray, row0: int, total_h: int, crops: List[np.ndarray],
        max_crops: int = 6, crop: int = 256,
    ) -> None:
        """Collect output crops from save bands as they stream — the bands
        are already on host, so full-res QA costs no extra device traffic."""
        if len(crops) >= max_crops:
            return
        bh, bw = band.shape[:2]
        cs = min(crop, bh, bw)
        if cs < 16:
            return
        for frac in (0.2, 0.5, 0.8):
            r = int(total_h * frac)
            if row0 <= r < row0 + bh and len(crops) < max_crops:
                y = max(0, min(r - row0, bh - cs))
                for xf in (0.25, 0.7):
                    x = max(0, min(int(bw * xf), bw - cs))
                    crops.append(np.asarray(band[y : y + cs, x : x + cs]))

    def _fullres_noref(self, crops: List[np.ndarray]) -> Dict[str, Any]:
        """Aggregate NIQE/BRISQUE/sharpness over full-res output crops.

        The downsample-consistency score cannot see whether the upscaler
        added real detail (back-projection optimizes exactly what it
        measures); this panel scores the actual print-resolution pixels
        (reference's no-reference path: quality_assessment_module.py:721-812)."""
        assert self.quality_module is not None
        from .qa import noref as _N
        from .qa.niqe import brisque_scores, niqe_scores

        acc: Dict[str, List[float]] = {}
        # Group equal-shape crops and score each group in ONE batched
        # device program per metric family (a per-crop loop costs ~5
        # round-trips per crop over a tunneled link).
        by_shape: Dict[Tuple[int, ...], List[np.ndarray]] = {}
        for c in crops:
            arr = c.astype(np.float32)
            if c.dtype == np.uint16:
                arr = arr / 257.0
            by_shape.setdefault(arr.shape, []).append(arr)
        for group in by_shape.values():
            batch = jnp.asarray(np.stack(group))
            raw = jax.vmap(_N.no_reference_metrics)(batch)
            sharp = np.asarray(raw["sharpness"], np.float64)
            contrast = np.asarray(raw["contrast"], np.float64)
            niqe_cf = np.asarray(raw["niqe"], np.float64)
            brisque_cf = np.asarray(raw["brisque"], np.float64)
            nq = niqe_scores(batch)
            bq = brisque_scores(batch)
            for i in range(len(group)):
                acc.setdefault("niqe", []).append(
                    float(nq[i]) if nq[i] is not None else float(niqe_cf[i])
                )
                acc.setdefault("brisque", []).append(
                    float(bq[i]) if bq[i] is not None else float(brisque_cf[i])
                )
                acc.setdefault("sharpness", []).append(float(sharp[i]))
                acc.setdefault("contrast", []).append(float(contrast[i]))
        out: Dict[str, Any] = {f"fullres_{k}": float(np.mean(v)) for k, v in acc.items()}
        out["fullres_crops"] = len(crops)
        return out

    # -- scheduler bookkeeping --------------------------------------------
    def _book_tasks(self, n: int, output_path: str, scale: float) -> List[Task]:
        tasks = [
            Task(
                input_path=f"tile_{i}",
                output_path=output_path,
                scale_factor=scale,
                has_edge_dependency=True,
            )
            for i in range(n)
        ]
        if self.scheduler is None:
            return tasks

        async def run():
            for t in tasks:
                await self.scheduler.submit_task(t)
            await self.scheduler._dispatch_tasks()

        self._run_async(run())
        return tasks

    def _book_done(self, tasks: List[Task]) -> None:
        if self.scheduler is None:
            return

        async def run():
            for t in tasks:
                await self.scheduler.collect_result(
                    t.task_id,
                    {"output_path": "", "width": 0, "height": 0, "color_mode": "RGB"},
                )

        self._run_async(run())

    def _run_async(self, coro) -> None:
        try:
            asyncio.get_running_loop()
        except RuntimeError:
            # Serialize across batch worker threads: each asyncio.run spins
            # a fresh loop, and the scheduler's asyncio.Lock must not be
            # awaited from two loops at once.
            with self._sched_tlock:
                asyncio.run(coro)
            return
        # inside a running loop: schedule without blocking
        asyncio.ensure_future(coro)

    # -- the 5 stages (reference: main.py:269-441) -------------------------
    def process(
        self,
        input_path: str,
        output_path: str,
        prompt: Optional[str] = None,
        roi_regions: Optional[List[Dict[str, Any]]] = None,
    ) -> PipelineResult:
        start = time.time()
        stage_times: Dict[str, float] = {}
        # A prompt naming a template category steers this job's conditioned
        # polish (reference: process(prompt=...) feeds the diffusion
        # provider, main.py:299-340); other strings are metadata-only.
        from .models.prompts import PromptTemplateManager

        job_category = (
            prompt if prompt in PromptTemplateManager.TEMPLATES else None
        )
        self._ensure_engine()
        if self._stage_sem is None:
            # Batch mode shares one cancel event across worker threads; a
            # per-job clear there would silently wipe a cancel() issued
            # while a sibling job runs. process_batch clears it once at
            # batch entry instead.
            self._cancel_event.clear()
        sem_held = False
        try:
            # ---- Stage 1: tiling ----
            t0 = time.time()
            image = load_image(input_path) if isinstance(input_path, str) else np.asarray(input_path, np.float32)
            h, w = image.shape[:2]
            tw, th = self._calculate_target_size((w, h), self.config.target_resolution)
            scale_total = max(tw / w, th / h)
            # Degradation-aware routing: probe THIS input's noise/blur and
            # swap the quality tier to the robust net when damaged
            # (models/routing.py; the reference routes only on failure).
            routed_model: Optional[str] = None
            if self.config.provider in ("quality", "seedream", "hybrid", "fusion"):
                try:
                    routed_model, est = self.sr_module.route_for(image)
                    if routed_model:
                        logger.info(
                            "degradation router: %s (noise %.2f, band ratio "
                            "%.2f) -> %s", est.reason, est.noise_sigma,
                            est.band_ratio, routed_model,
                        )
                except Exception:  # noqa: BLE001 - routing is best-effort
                    routed_model = None
            ladder = _scale_ladder(
                scale_total, trained=self._trained_scales(model=routed_model)
            )
            # SR-gain self-probe: per-image internal validation (can the
            # net reconstruct THIS input's statistics better than
            # bicubic?). Catches self-similar textures where every clean
            # net loses to bicubic (round-4 panel: wood at x2). Damaged
            # inputs already routed to the robust net skip it.
            routed_provider: Optional[str] = None
            sr_gain: Optional[float] = None
            if (
                self.config.auto_route and routed_model is None and ladder
                and self.config.provider in ("quality", "seedream", "hybrid",
                                             "fusion")
            ):
                try:
                    from .models import routing as _routing

                    probe_model = self._ladder_models([int(ladder[0])])[0]
                    shrink_alpha: Optional[float] = None
                    if self.config.sr_gain_route == "shrink":
                        res = _routing.probe_sr_alpha(
                            image, probe_model, int(ladder[0])
                        )
                        if res is not None:
                            sr_gain, shrink_alpha = res
                    else:
                        sr_gain = _routing.probe_sr_gain(
                            image, probe_model, int(ladder[0])
                        )
                    if sr_gain is not None and sr_gain < self.config.sr_gain_floor:
                        routed_provider = self.config.sr_gain_route
                        if routed_provider == "shrink":
                            self._shrink_alpha = round(
                                float(shrink_alpha
                                      if shrink_alpha is not None else 0.0), 3
                            )
                            # texture tier: probe the candidates and serve
                            # whichever net's shrunk ladder predicts best
                            # on this input (no-op when none is packaged)
                            from .models.registry import is_pretrained

                            # a candidate must be trained at EVERY ladder
                            # scale: routed_model pins all steps to it
                            cands = tuple(
                                c for c in getattr(
                                    self.config, "texture_models", ())
                                if all(is_pretrained(c, int(s))
                                       for s in set(ladder))
                            )
                            if cands:
                                best = _routing.best_shrink_candidate(
                                    image, (probe_model,) + cands,
                                    int(ladder[0]),
                                )
                                if best is not None and best[0] != probe_model:
                                    routed_model = best[0]
                                    self._shrink_alpha = round(best[2], 3)
                        logger.info(
                            "SR-gain probe: %s x%d measures %+.2f dB vs "
                            "bicubic on this input -> %s ladder%s%s",
                            probe_model, int(ladder[0]), sr_gain,
                            routed_provider,
                            (" (alpha %.3f)" % self._shrink_alpha)
                            if routed_provider == "shrink" else "",
                            (" serving %s" % routed_model)
                            if routed_provider == "shrink" and routed_model
                            else "",
                        )
                except Exception:  # noqa: BLE001 - the probe is best-effort
                    routed_provider = None
            net_scale = int(np.prod(ladder)) if ladder else 1
            # One h2d upload of the input: tiling pads/extracts from it and
            # the QA stage reuses it as the device-resident reference.
            image_dev = jnp.asarray(image, jnp.float32)
            layout, tiles = self.tiling_module.split_to_batch(image_dev)
            image_hash = self.tiling_module.compute_image_hash(
                input_path if isinstance(input_path, str) else image
            )
            self.tiling_module._layouts[image_hash] = layout
            stage_times["tiling"] = time.time() - t0
            logger.info(
                "Stage 1: %dx%d -> %dx%d grid (block %d, overlap %d), ladder %s",
                w, h, layout.nx, layout.ny, layout.block, layout.overlap, ladder,
            )

            # ---- Stage 2: parallel SR ----
            self._check_cancel("super_resolution")
            if self._stage_sem is not None:
                # batch pipelining: one job at a time in the device stages
                self._stage_sem.acquire()
                sem_held = True
            t0 = time.time()
            if (routed_provider or self.config.provider) == "zssr" and ladder:
                # Zero-shot SR: fine-tune on the input itself so the net
                # learns this image's internal statistics (the on-device
                # analog of a per-image "quality" engine). Also the
                # sr_gain_route="zssr" destination for probe-negative
                # inputs.
                self.sr_module.zssr_prepare(
                    image, scale=ladder[0], steps=self.config.zssr_steps
                )
            tasks = self._book_tasks(layout.num_tiles, output_path, scale_total)
            self._sr_attempts, self._sr_degradations = 1, 0

            # Mid-run resume: probe the tile store for already-upscaled
            # tiles from a killed previous run (reference: main.py:299-304
            # probed; restore was a TODO there — here it works).
            resume_key = self._resume_key(
                image_hash, ladder, layout, routed_model, job_category,
                provider=routed_provider,
            )
            cached_sr = self._probe_resume(resume_key, layout.num_tiles)
            recomputed = True
            _prov = None
            if cached_sr is not None and len(cached_sr) == layout.num_tiles:
                up_tiles = jnp.asarray(
                    np.stack([cached_sr[i] for i in range(layout.num_tiles)]),
                    jnp.float32,
                )
                recomputed = False
                logger.info("resumed all %d upscaled tiles from checkpoint",
                            layout.num_tiles)
            elif cached_sr:
                try:
                    missing = [i for i in range(layout.num_tiles) if i not in cached_sr]
                    up_missing = self._upscale_batch(
                        jnp.take(tiles, jnp.asarray(missing), axis=0), ladder,
                        provider=routed_provider, model=routed_model,
                        category=job_category,
                    )
                    up_missing.block_until_ready()
                    parts: List[np.ndarray] = [None] * layout.num_tiles  # type: ignore[list-item]
                    up_np = np.asarray(up_missing)
                    for j, i in enumerate(missing):
                        parts[i] = up_np[j]
                    for i, data in cached_sr.items():
                        parts[i] = data
                    up_tiles = jnp.asarray(np.stack(parts), jnp.float32)
                    logger.info("resumed %d/%d tiles; upscaled %d",
                                len(cached_sr), layout.num_tiles, len(missing))
                except Exception:  # noqa: BLE001 - partial resume is best-effort
                    logger.warning("partial resume failed; recomputing batch")
                    up_tiles, layout, ladder, _prov = self._run_stage2(
                        image, tiles, ladder, layout, tasks,
                        model=routed_model, category=job_category,
                        provider=routed_provider,
                    )
            else:
                up_tiles, layout, ladder, _prov = self._run_stage2(
                    image, tiles, ladder, layout, tasks,
                    model=routed_model, category=job_category,
                    provider=routed_provider,
                )
            net_scale = int(np.prod(ladder)) if ladder else 1
            if recomputed and self.config.enable_checkpoint:
                self._checkpoint_sr(
                    self._resume_key(
                        image_hash, ladder, layout, routed_model, job_category,
                        provider=routed_provider,
                    ),
                    up_tiles,
                )
            self._book_done(tasks)
            stage_times["super_resolution"] = time.time() - t0
            # Instrumentation for MFU accounting (bench.py): what actually
            # ran in stage 2 after routing/degradation/resume.
            prov_used = _prov or routed_provider or self.config.provider
            step_models: Optional[List[str]] = None
            if prov_used in ("quality", "seedream", "hybrid", "zssr", "fusion",
                             "shrink"):
                step_models = self._ladder_models(
                    list(ladder), routed_model, provider=prov_used
                )
                model_used = routed_model or (
                    step_models[0] if step_models else self.config.quality_model
                )
            elif prov_used in ("fast", "veimagex"):
                model_used = self.config.fast_model
                step_models = [model_used] * len(ladder)
            else:
                model_used = None
            # Multi-pass accounting: per step, [net, n_passes] pairs (8 for
            # a dihedral "+" pass, 1 otherwise; bicubic members excluded —
            # resizes are bandwidth, not MXU work). MFU for the ensemble/
            # fusion cost rows divides by THIS work, not the single-pass
            # ladder's (utils/flops.multipass_ladder_flops).
            step_members: Optional[List[List[list]]] = None
            ens_used = bool(getattr(self.config, "self_ensemble", False))
            if step_models is not None and (
                ens_used or prov_used == "fusion"
            ):
                step_members = []
                for si, s in enumerate(ladder):
                    fused = (
                        self.sr_module._fusion_for(int(s))
                        if prov_used == "fusion" and routed_model is None
                        else None
                    )
                    if fused is None:
                        step_members.append(
                            [[step_models[si], 8 if ens_used else 1]]
                        )
                    else:
                        step_members.append([
                            [nm.rstrip("+"),
                             8 if (ens_used or nm.endswith("+")) else 1]
                            for nm, _w in fused if nm != "bicubic"
                        ])
            self.last_run_info = {
                "ladder": list(ladder),
                "num_tiles": int(layout.num_tiles),
                "block": int(layout.block),
                "provider": prov_used,
                "model": model_used,
                # per-scale selection: the net each ladder step served
                # (models/selection.py) — MFU accounting keys on this
                "models": step_models,
                "step_members": step_members,
                "resumed": not recomputed,
                "sr_seconds": stage_times["super_resolution"],
                # per-image internal validation result (None = not probed)
                "sr_gain_probe": sr_gain,
                # residual-shrinkage coefficient actually served (None
                # unless the probe routed this job to the shrink ladder)
                "sr_gain_alpha": (
                    getattr(self, "_shrink_alpha", None)
                    if prov_used == "shrink" else None
                ),
                # retry/degradation trail: >1 attempts or >0 degradations
                # means this run does NOT measure the configured provider
                "sr_attempts": getattr(self, "_sr_attempts", 1),
                "sr_degradations": getattr(self, "_sr_degradations", 0),
            }

            # ---- Stage 3: blending ----
            self._check_cancel("blending")
            t0 = time.time()
            out_layout = layout.scaled(net_scale)
            # The profile blend donates its input batch; keep a copy when
            # the seam-repair pass still needs the source tiles.
            blend_input = (
                jnp.array(up_tiles) if self.config.enable_seam_repair else up_tiles
            )
            canvas = self._blend(blend_input, out_layout, image=image, net_scale=net_scale)

            # Optional seam QA + repair (reference: blending stage of
            # main.py via detect_seams/repair_seams, blending:765-1216).
            if self.config.enable_seam_repair:
                from .ops.seam import detect_seams as _detect, repair_seams as _repair
                from .ops.tiles import extract_tiles as _extract

                result_tiles = _extract(canvas, out_layout)
                seams = _detect(
                    result_tiles, up_tiles, out_layout,
                    threshold=self.config.seam_threshold,
                )
                bad = [s for s in seams if s.severity != "low"]
                if bad:
                    logger.info("repairing %d seams", len(bad))
                    canvas = _repair(canvas, bad, up_tiles, out_layout)
                del result_tiles

            # Optional color consistency vs the source (reference:
            # blending:969-1017; reference tile = the original image).
            if self.config.enable_color_correction:
                from .ops.color import color_correction as _cc

                src_dev = jnp.asarray(image, jnp.float32)
                canvas = _cc(canvas, src_dev, method="histogram", local_filter=False)

            if hasattr(canvas, "block_until_ready"):
                canvas.block_until_ready()
            else:
                jax.block_until_ready(canvas)
            stage_times["blending"] = time.time() - t0

            # ---- Stage 4: QA ----
            self._check_cancel("quality_assessment")
            # One small banded program pulls an input-size proxy straight
            # off the padded canvas (crop + resize fused).
            t0 = time.time()
            quality_report = None
            quality_score = None
            from .ops.blend import blend_finalize_banded
            from .ops.resize import resize_bicubic_banded
            from .parallel.finalize import ShardedCanvas, sharded_finalize_banded

            deferred = isinstance(canvas, tuple)
            sharded = isinstance(canvas, ShardedCanvas)

            def _banded_out(oh, ow, nbands, to_uint8, as_iterator=False, as_device=False):
                if sharded:
                    # Each device collapses + resizes + quantizes its own
                    # output rows; the host streams bands per shard.
                    return sharded_finalize_banded(
                        canvas, oh, ow, bands=nbands,
                        crop_h=crop_h, crop_w=crop_w, to_uint8=to_uint8,
                        as_iterator=as_iterator,
                    )
                if deferred:
                    lap0, coarse = canvas
                    return blend_finalize_banded(
                        lap0, coarse, oh, ow, bands=nbands,
                        crop_h=crop_h, crop_w=crop_w, to_uint8=to_uint8,
                        as_iterator=as_iterator, as_device=as_device,
                    )
                return resize_bicubic_banded(
                    canvas, oh, ow, bands=nbands, crop_h=crop_h, crop_w=crop_w,
                    to_uint8=to_uint8, as_iterator=as_iterator, as_device=as_device,
                )

            crop_h = min(out_layout.padded_h, layout.image_h * net_scale)
            crop_w = min(out_layout.padded_w, layout.image_w * net_scale)

            # Dispatch the save bands NOW (async): their device compute and
            # host-link transfer overlap the QA stage below.
            quant = "uint16" if self.config.bit_depth == 16 else True
            save_bands = _banded_out(th, tw, 8, quant, as_iterator=True)

            if self.quality_module is not None:
                if sharded:
                    fused_small = np.clip(_banded_out(h, w, 2, False), 0, 255)
                    qa_ref = image
                else:
                    # Device-resident QA: the input-size proxy never leaves
                    # HBM and the reference is the stage-1 upload — saves
                    # a d2h fetch + two h2d re-uploads per image.
                    fused_small = jnp.clip(
                        _banded_out(h, w, 2, False, as_device=True), 0, 255
                    )
                    qa_ref = image_dev
                fr = self.quality_module.evaluate_full_reference(qa_ref, fused_small)
                nr = self.quality_module.evaluate_no_reference(fused_small)
                quality_report = {**fr, **nr}
                if roi_regions:
                    # ROI boxes are in input coordinates; fused_small is
                    # input-sized, so they apply directly
                    quality_report.update(
                        self.quality_module.evaluate_commercial(
                            np.asarray(fused_small), roi_regions
                        )
                    )
                quality_score = quality_report.get("overall_score")
            stage_times["quality_assessment"] = time.time() - t0
            if sem_held:
                # All device work (including the save bands) is dispatched;
                # stage 5 is host/link-bound — let the next job's SR start.
                self._stage_sem.release()
                sem_held = False

            # ---- Stage 5: save ----
            self._check_cancel("save")
            t0 = time.time()
            # One banded program fuses crop (unpad), exact-size resize,
            # clip and quantization, streaming row bands over the host
            # link at 1 (or 2) bytes/px.
            # TIFF outputs stream band-by-band into the native writer:
            # band b+1 computes + crosses the link while band b deflates on
            # the C++ thread pool.
            streamed = False
            fullres_crops: List[np.ndarray] = []
            want_fullres = self.quality_module is not None and quality_report is not None
            if output_path.lower().endswith((".tiff", ".tif")):
                try:
                    import os as _os

                    from .io.native import TiffStreamWriter

                    # Deflate is pure loss on a single-core host: it
                    # serializes with the device-link transfer instead of
                    # hiding under it.
                    _compress = (_os.cpu_count() or 1) > 1
                    with TiffStreamWriter(
                        output_path, th, tw, bit_depth=self.config.bit_depth,
                        compress=_compress,
                    ) as writer:
                        row0 = 0
                        t_fetch = t_write = 0.0
                        it = iter(save_bands)
                        while True:
                            ts = time.time()
                            band = next(it, None)
                            t_fetch += time.time() - ts
                            if band is None:
                                break
                            ts = time.time()
                            writer.write(band)
                            t_write += time.time() - ts
                            if want_fullres:
                                self._sample_fullres_crops(band, row0, th, fullres_crops)
                            row0 += band.shape[0]
                        logger.info(
                            "save breakdown: fetch %.2fs, write %.2fs",
                            t_fetch, t_write,
                        )
                    streamed = True
                except (ImportError, OSError):
                    # The generator may be partially consumed (a band was
                    # already written when the native writer failed);
                    # re-dispatch the full banded program so the fallback
                    # saves the complete image, not a truncated tail.
                    save_bands = _banded_out(th, tw, 8, quant, as_iterator=True)
                    fullres_crops = []
            if not streamed:
                rows = list(save_bands)
                fused_np = np.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
                if want_fullres and not fullres_crops:
                    self._sample_fullres_crops(fused_np, 0, th, fullres_crops)
                if fused_np.dtype == np.uint16:  # PIL path is 8-bit only
                    fused_np = (fused_np // 257).astype(np.uint8)
                save_image(output_path, fused_np)
            if want_fullres and fullres_crops:
                t_nr = time.time()
                quality_report.update(self._fullres_noref(fullres_crops))
                logger.info("save breakdown: fullres NR panel %.2fs", time.time() - t_nr)
            if quality_report:
                report_path = output_path.rsplit(".", 1)[0] + "_qa_report.json"
                with open(report_path, "w", encoding="utf-8") as f:
                    json.dump(quality_report, f, indent=2, ensure_ascii=False)
            stage_times["save"] = time.time() - t0

            return PipelineResult(
                success=True,
                output_path=output_path,
                processing_time=time.time() - start,
                total_blocks=layout.num_tiles,
                successful_blocks=layout.num_tiles,
                failed_blocks=0,
                quality_score=quality_score,
                quality_report=quality_report,
                error_message=None,
                stage_times=stage_times,
            )
        except Exception as e:  # noqa: BLE001 - parity: never raise (main.py:425-441)
            if sem_held:
                self._stage_sem.release()
            logger.exception("pipeline failed")
            return PipelineResult(
                success=False,
                output_path=None,
                processing_time=time.time() - start,
                total_blocks=0,
                successful_blocks=0,
                failed_blocks=0,
                quality_score=None,
                quality_report=None,
                error_message=str(e),
                stage_times=stage_times,
            )

    def process_batch(
        self, jobs: List[Dict[str, Any]], max_concurrent: int = 2
    ) -> List[PipelineResult]:
        """Process multiple images in scheduler priority order, pipelined.

        Each job: {"input": path, "output": path, optional "vip_level"
        (VIPLevel or int), "prompt", "roi_regions"}. Jobs are ordered by
        the scheduler's VIP/FIFO priority formula (the batch-queue
        semantics of the reference's advanced page, pages/advanced_page.py)
        and the whole run shares one warm pipeline (one set of compiled
        programs when shapes repeat).

        With ``max_concurrent > 1`` jobs run on a small worker pool with the
        device stages (SR/blend/QA) serialized by a semaphore: job N+1's
        tile batch computes while job N's quantized bands stream over the
        host link and encode — the on-device analog of the reference's 60
        concurrent tile requests across images (main.py:254-262), which on
        a link-bound save hides most of a job's device time.
        """
        from .scheduler.scheduler import VIPLevel

        def prio(j: Dict[str, Any]) -> float:
            vip = j.get("vip_level", VIPLevel.NORMAL)
            if isinstance(vip, int):
                vip = VIPLevel(vip)
            return Task.calculate_priority(vip, bool(j.get("roi_regions")), False, time.time())

        ordered = sorted(enumerate(jobs), key=lambda it: prio(it[1]))
        results: List[Optional[PipelineResult]] = [None] * len(jobs)
        if self.config.provider == "zssr":
            # zssr tunes per-image params held on the module — the
            # prepare-and-upscale pair must not interleave across jobs
            max_concurrent = 1
        if max_concurrent <= 1 or len(jobs) < 2:
            for idx, job in ordered:
                results[idx] = self.process(
                    job["input"], job["output"],
                    prompt=job.get("prompt"), roi_regions=job.get("roi_regions"),
                )
            return results  # type: ignore[return-value]

        from concurrent.futures import ThreadPoolExecutor

        self._ensure_engine()
        self._cancel_event.clear()  # once per batch, not per worker job
        self._stage_sem = threading.Semaphore(1)
        try:
            with ThreadPoolExecutor(max_workers=max_concurrent) as ex:
                futures = [
                    (idx, ex.submit(
                        self.process, job["input"], job["output"],
                        prompt=job.get("prompt"),
                        roi_regions=job.get("roi_regions"),
                    ))
                    for idx, job in ordered
                ]
                for idx, fut in futures:
                    results[idx] = fut.result()
        finally:
            self._stage_sem = None
        return results  # type: ignore[return-value]
