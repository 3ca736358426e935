"""Usage examples for every public surface.

Parity role of the reference's example_usage.py:26-233 (whose real API
calls are commented out because they need network credentials); here every
example actually runs, on CPU or TPU.

Run: python examples/example_usage.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_demo_image(h=240, w=320):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [127 + 90 * np.sin(xx / 19), 127 + 90 * np.cos(yy / 13), 127 + 90 * np.sin((xx + yy) / 23)],
        -1,
    )
    return np.clip(img, 0, 255).astype(np.float32)


def example_prompts():
    from srs_tpu.models.prompts import PromptTemplateManager

    print("categories:", PromptTemplateManager.list_categories())
    print("jewelry prompt:", PromptTemplateManager.build_prompt("jewelry")[:80], "...")


def example_sr_module():
    from srs_tpu.models.sr_module import (
        SuperResolutionModule,
        UpscaleConfig,
        UpscaleProvider,
    )

    sr = SuperResolutionModule()
    img = make_demo_image(120, 160)
    res = sr.upscale(img, UpscaleConfig(provider=UpscaleProvider.QUALITY, target_scale=2.0))
    print("sr:", res.original_size, "->", res.upscaled_size, f"{res.processing_time:.2f}s")
    hybrid = sr.hybrid_upscale(img, target_scale=4.0, category="food")
    print("hybrid stages:", [h["stage"] for h in hybrid.metadata["processing_history"]])


def example_tiling_and_blending():
    import jax.numpy as jnp

    from srs_tpu.blending import BlendingModule, TileInfo
    from srs_tpu.tiling.tiling import TilingModule

    img = make_demo_image(200, 300)
    tm = TilingModule(block_size=128, overlap_ratio=0.2)
    tiles = tm.split_image(img)
    print(f"tiling: {len(tiles)} tiles, first block_id {tiles[0].metadata.block_id[:8]}")
    merged = tm.merge_tiles(tiles, output_size=img.shape[:2], scale=1)
    print("merge max err:", float(np.abs(merged - img).max()))

    bm = BlendingModule()
    infos = [
        TileInfo(t.data, t.metadata.global_x, t.metadata.global_y,
                 t.metadata.row, t.metadata.col)
        for t in tiles
    ]
    fused = bm.laplacian_fusion(infos, output_shape=img.shape[:2])
    print("laplacian fusion err:", float(np.abs(fused - img).max()))
    seams = bm.detect_seams(fused, infos)
    print("seams detected:", len(seams))


def example_quality_assessment():
    from srs_tpu.qa.module import QualityAssessmentModule

    qam = QualityAssessmentModule()
    clean = make_demo_image()
    noisy = np.clip(clean + np.random.default_rng(0).normal(0, 8, clean.shape), 0, 255)
    metrics = qam.evaluate_full_reference(clean, noisy)
    print(qam.generate_report(metrics, "summary"))


def example_scheduler():
    import asyncio

    from srs_tpu.scheduler.scheduler import AgentScheduler, Task, VIPLevel

    async def go():
        s = AgentScheduler(initial_agents=3)
        for vip in (VIPLevel.NORMAL, VIPLevel.ENTERPRISE):
            await s.submit_task(Task(vip_level=vip))
        await s._dispatch_tasks()
        print("scheduler:", s.get_statistics()["tasks"])

    asyncio.run(go())


def example_pipeline():
    import tempfile

    from PIL import Image

    from srs_tpu import PipelineConfig, SuperResolutionPipeline

    with tempfile.TemporaryDirectory() as d:
        inp = f"{d}/in.png"
        Image.fromarray(make_demo_image(120, 160).astype(np.uint8)).save(inp)
        pipe = SuperResolutionPipeline(
            PipelineConfig(block_size=64, target_resolution="320x240",
                           provider="fast", num_pyramid_levels=3)
        )
        r = pipe.process(inp, f"{d}/out.tiff")
        print("pipeline:", r.success, f"{r.processing_time:.1f}s",
              "score", r.quality_score)


if __name__ == "__main__":
    example_prompts()
    example_sr_module()
    example_tiling_and_blending()
    example_quality_assessment()
    example_scheduler()
    example_pipeline()
