"""End-to-end pipeline tests (CPU, small shapes)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from srs_tpu.pipeline import (
    PipelineConfig,
    PipelineResult,
    SuperResolutionPipeline,
    _scale_ladder,
)


@pytest.fixture(scope="module")
def input_png(tmp_path_factory):
    d = tmp_path_factory.mktemp("inputs")
    r = np.random.default_rng(5)
    yy, xx = np.mgrid[0:120, 0:160].astype(np.float32)
    img = np.stack(
        [127 + 90 * np.sin(xx / 13), 127 + 90 * np.cos(yy / 11), 127 + 90 * np.sin((xx + yy) / 7)],
        -1,
    )
    img = np.clip(img + r.normal(0, 2, img.shape), 0, 255).astype(np.uint8)
    p = str(d / "input.png")
    Image.fromarray(img).save(p)
    return p


def _cfg(**kw):
    defaults = dict(
        block_size=64,
        overlap_ratio=0.2,
        target_resolution="320x240",
        provider="bicubic",
        num_pyramid_levels=4,
        enable_qa=True,
        seedream_steps=2,
        ibp_steps=2,
    )
    defaults.update(kw)
    return PipelineConfig(**defaults)


def test_scale_ladder():
    assert _scale_ladder(1.0) == []
    assert _scale_ladder(2.0) == [2]
    assert int(np.prod(_scale_ladder(4.0))) == 4
    assert int(np.prod(_scale_ladder(9.57))) == 9  # slight undershoot wins
    assert int(np.prod(_scale_ladder(5.0))) == 6
    for t in (1.5, 3.2, 7.9, 15.0):
        p = int(np.prod(_scale_ladder(t)))
        assert p >= t * 0.88  # never undershoots beyond the bicubic margin


def test_scale_ladder_prefers_trained():
    """An untrained step is exact bicubic (zero learned detail): with
    trained={2,3} the 4x ladder must be [2, 2], never a zero-init [4]."""
    assert _scale_ladder(4.0, trained={2, 3}) == [2, 2]
    assert all(s in (2, 3) for s in _scale_ladder(16.0, trained={2, 3}))
    # but an impossible preference never blocks reaching the target scale
    p = int(np.prod(_scale_ladder(7.9, trained=set())))
    assert p >= 7.9 * 0.88


def test_process_end_to_end(input_png, tmp_path):
    out = str(tmp_path / "out.png")
    pipe = SuperResolutionPipeline(_cfg())
    result = pipe.process(input_png, out)
    assert result.success, result.error_message
    assert result.total_blocks >= 1
    assert os.path.exists(out)
    with Image.open(out) as im:
        assert im.size == (320, 240)
    # QA report written
    report_path = out.rsplit(".", 1)[0] + "_qa_report.json"
    assert os.path.exists(report_path)
    rep = json.loads(open(report_path).read())
    assert "psnr" in rep and "niqe" in rep
    assert result.quality_score is not None
    assert set(result.stage_times) == {
        "tiling", "super_resolution", "blending", "quality_assessment", "save",
    }
    # 2x bicubic of a band-limited image downsampled back must be close
    # (downsample-consistency; folded in here rather than re-running the
    # whole pipeline as a separate test)
    assert result.quality_report["psnr"] > 30
    # full-resolution no-reference panel sampled from the save bands
    # (honest quality reporting — the downsample proxy can't see added
    # detail); folded in here for the same reason
    assert result.quality_report["fullres_crops"] >= 1
    for k in ("fullres_niqe", "fullres_brisque", "fullres_sharpness"):
        assert k in result.quality_report
        assert np.isfinite(result.quality_report[k]), k
    assert "fullres_niqe" in rep  # lands in the saved JSON too


def test_process_quality_provider(input_png, tmp_path):
    # edsr_m: exercises the trained-quality path at half the CPU compile
    # cost of the default edsr_l (which bench/system panels cover on TPU)
    out = str(tmp_path / "outq.png")
    pipe = SuperResolutionPipeline(
        _cfg(provider="quality", quality_model="edsr_m", enable_qa=False)
    )
    result = pipe.process(input_png, out)
    assert result.success, result.error_message


@pytest.mark.parametrize("method", ["weighted", "feather", "gradient_domain"])
def test_blend_methods(input_png, tmp_path, method):
    out = str(tmp_path / f"out_{method}.png")
    pipe = SuperResolutionPipeline(_cfg(blend_method=method, enable_qa=False))
    result = pipe.process(input_png, out)
    assert result.success, result.error_message


def test_target_size_presets():
    pipe = SuperResolutionPipeline(_cfg(enable_qa=False))
    # aspect preserved against 100MP preset
    tw, th = pipe._calculate_target_size((1280, 720), "100MP")
    assert abs(tw / th - 1280 / 720) < 0.01
    assert tw <= 12245 and th <= 8163
    assert pipe._calculate_target_size((100, 100), "500x500") == (500, 500)
    # bad string falls back to 100MP scaled to aspect
    tw2, th2 = pipe._calculate_target_size((1000, 1000), "wat")
    assert tw2 == th2


def test_process_failure_returns_result(tmp_path):
    pipe = SuperResolutionPipeline(_cfg())
    result = pipe.process(str(tmp_path / "missing.png"), str(tmp_path / "o.png"))
    assert isinstance(result, PipelineResult)
    assert not result.success
    assert result.error_message


def test_roi_commercial_metrics(input_png, tmp_path):
    out = str(tmp_path / "roi.png")
    pipe = SuperResolutionPipeline(_cfg())
    rois = [{"type": "brand", "bbox": [10, 10, 50, 50], "reference_color": (200, 30, 30)}]
    result = pipe.process(input_png, out, roi_regions=rois)
    assert result.success
    assert "commercial_score" in result.quality_report
    assert "brand_color_delta_e_0" in result.quality_report


def test_async_context_manager(input_png, tmp_path):
    import asyncio

    async def go():
        async with SuperResolutionPipeline(_cfg(enable_qa=False)) as pipe:
            return pipe.process(input_png, str(tmp_path / "actx.png"))

    result = asyncio.run(go())
    assert result.success


def test_scheduler_bookkeeping(input_png, tmp_path):
    pipe = SuperResolutionPipeline(_cfg(enable_qa=False))
    result = pipe.process(input_png, str(tmp_path / "b.png"))
    assert result.success
    stats = pipe.scheduler.get_statistics()
    assert stats["counters"]["submitted"] == result.total_blocks
    assert stats["counters"]["completed"] == result.total_blocks


def test_content_aware_pipeline(input_png, tmp_path):
    out = str(tmp_path / "ca.png")
    pipe = SuperResolutionPipeline(_cfg(content_aware=True, enable_qa=False))
    result = pipe.process(input_png, out)
    assert result.success, result.error_message
    assert os.path.exists(out)


def test_mesh_pipeline_8dev(input_png, tmp_path):
    """Full pipeline with the tile batch sharded over the 8-device mesh."""
    out = str(tmp_path / "mesh.png")
    pipe = SuperResolutionPipeline(
        _cfg(provider="fast", mesh_shape={"data": 8}, enable_qa=False)
    )
    result = pipe.process(input_png, out)
    assert result.success, result.error_message
    assert pipe.dispatcher is not None and pipe.dispatcher.num_devices == 8
    with Image.open(out) as im:
        assert im.size == (320, 240)


def test_seam_repair_and_color_correction_stages(input_png, tmp_path):
    out = str(tmp_path / "sr_cc.png")
    pipe = SuperResolutionPipeline(
        _cfg(enable_seam_repair=True, enable_color_correction=True,
             enable_qa=False, seam_threshold=0.8)
    )
    result = pipe.process(input_png, out)
    assert result.success, result.error_message
    assert os.path.exists(out)


def test_process_batch_priority_order(input_png, tmp_path):
    from srs_tpu.scheduler.scheduler import VIPLevel

    pipe = SuperResolutionPipeline(_cfg(enable_qa=False))
    jobs = [
        {"input": input_png, "output": str(tmp_path / "n.png")},
        {"input": input_png, "output": str(tmp_path / "v.png"),
         "vip_level": VIPLevel.ENTERPRISE},
    ]
    results = pipe.process_batch(jobs)
    assert len(results) == 2 and all(r.success for r in results)
    assert os.path.exists(str(tmp_path / "v.png"))


def test_process_batch_pipelined_overlap(input_png, tmp_path):
    """Pipelined batch: device stages of job N+1 may start as soon as job N
    enters its save stage, outputs identical to sequential processing."""
    import threading
    import time as _time

    pipe = SuperResolutionPipeline(_cfg(enable_qa=False))
    jobs = [
        {"input": input_png, "output": str(tmp_path / f"b{i}.png")}
        for i in range(3)
    ]
    events = []
    ev_lock = threading.Lock()
    orig_process = pipe.process

    def traced(inp, outp, **kw):
        with ev_lock:
            events.append(("start", outp, _time.time()))
        r = orig_process(inp, outp, **kw)
        with ev_lock:
            events.append(("end", outp, _time.time()))
        return r

    pipe.process = traced
    results = pipe.process_batch(jobs, max_concurrent=2)
    assert all(r.success for r in results), [r.error_message for r in results]
    assert pipe._stage_sem is None  # cleared after the batch
    # overlap: some job started before the previous one ended
    starts = sorted(t for k, _, t in events if k == "start")
    ends = sorted(t for k, _, t in events if k == "end")
    assert starts[1] < ends[0] + 1e-9
    # outputs identical to a sequential run
    seq = SuperResolutionPipeline(_cfg(enable_qa=False))
    r0 = seq.process(input_png, str(tmp_path / "seq.png"))
    assert r0.success
    a = np.asarray(Image.open(jobs[1]["output"]))
    b = np.asarray(Image.open(str(tmp_path / "seq.png")))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_mesh_space_sharded_blend(tmp_path):
    """Laplacian blend sharded over the space axis inside the pipeline."""
    r = np.random.default_rng(9)
    img = np.clip(
        127 + 90 * np.sin(np.mgrid[0:160, 0:160][1].astype(np.float32) / 11)[..., None]
        + r.normal(0, 2, (160, 160, 1)),
        0, 255,
    ).astype(np.uint8).repeat(3, axis=-1)
    p = str(tmp_path / "in.png")
    Image.fromarray(img).save(p)
    out = str(tmp_path / "out.png")
    pipe = SuperResolutionPipeline(
        _cfg(block_size=64, target_resolution="320x320", provider="fast",
             mesh_shape={"data": 2, "space": 4}, enable_qa=False,
             num_pyramid_levels=3)
    )
    result = pipe.process(p, out)
    assert result.success, result.error_message
    # ny = 4 divides space=4 -> the sharded path ran
    lo = pipe.tiling_module._layouts[list(pipe.tiling_module._layouts)[0]]
    assert lo.ny % 4 == 0
    with Image.open(out) as im:
        assert im.size == (320, 320)
    # output quality sanity: downsample-consistent with the input
    from srs_tpu.ops.resize import resize_bicubic
    from srs_tpu.qa.metrics import psnr
    import jax.numpy as jnp

    with Image.open(out) as im:
        arr = np.asarray(im, dtype=np.float32)
    small = np.asarray(resize_bicubic(jnp.asarray(arr), 160, 160))
    assert float(psnr(jnp.asarray(img.astype(np.float32)), jnp.asarray(small))) > 30


def test_16bit_tiff_output(input_png, tmp_path):
    import cv2

    out = str(tmp_path / "deep.tiff")
    pipe = SuperResolutionPipeline(_cfg(bit_depth=16, enable_qa=False))
    result = pipe.process(input_png, out)
    assert result.success, result.error_message
    back = cv2.imread(out, cv2.IMREAD_UNCHANGED)
    assert back is not None and back.dtype == np.uint16
    assert back.shape[:2] == (240, 320)
    # 16-bit values span the full range (not 8-bit scaled into 16)
    assert back.max() > 255


@pytest.mark.slow
def test_zssr_provider(input_png, tmp_path):
    # pipeline-level zssr e2e compiles the training backward pass on CPU
    # (~3 min); the algorithm is guarded by the default-run
    # test_zssr_improves_or_matches_bicubic and provider dispatch by
    # test_sr_module_providers
    out = str(tmp_path / "zssr.png")
    # quality_model=espcn keeps the zssr prior small: the default edsr_l
    # prior compiles a 16-block backward pass on CPU for no extra coverage
    pipe = SuperResolutionPipeline(
        _cfg(provider="zssr", zssr_steps=8, ibp_steps=2, quality_model="espcn")
    )
    result = pipe.process(input_png, out)
    assert result.success, result.error_message
    assert result.quality_report["psnr"] > 28


def test_failure_ladder_degrades_to_fallback(input_png, tmp_path):
    # A provider that hard-fails on device compute must route through
    # scheduler.handle_failure: retries first, then the degradation ladder
    # (tile 256/16, fallback engine, scale x0.7) completes the job.
    out = str(tmp_path / "deg.png")
    # espcn quality tier: the ladder under test is the scheduler's, not the
    # net's — the default edsr_l only adds CPU compile time here
    pipe = SuperResolutionPipeline(
        _cfg(provider="quality", quality_model="espcn", enable_qa=False)
    )
    pipe._ensure_engine()
    real = pipe.sr_module.upscale_tiles

    def flaky(tiles, scale, provider="quality", steps=0, **kw):
        if provider != "fast" and provider != "bicubic":
            raise RuntimeError("injected device failure (simulated OOM)")
        return real(tiles, scale, provider=provider, steps=steps, **kw)

    pipe.sr_module.upscale_tiles = flaky
    result = pipe.process(input_png, out)
    assert result.success, result.error_message
    stats = pipe.scheduler.get_statistics()
    assert stats["counters"]["degraded"] >= 1
    assert stats["counters"]["retried"] >= 1
    with Image.open(out) as im:
        assert im.size == (320, 240)  # degraded net scale still hits target
    # A degraded run must SAY so (round-5 lesson: two bench rows measured
    # the bicubic fallback while labeled ensemble/fusion).
    info = pipe.last_run_info
    assert info["sr_attempts"] > 1
    assert info["sr_degradations"] >= 1
    assert info["provider"] != "quality"


def test_failure_ladder_transient_retry(input_png, tmp_path):
    # A transient failure (fails twice, then works) must succeed WITHOUT
    # degradation — plain retry parity (reference agent_scheduler:752-829).
    out = str(tmp_path / "transient.png")
    pipe = SuperResolutionPipeline(
        _cfg(provider="quality", quality_model="espcn", enable_qa=False)
    )
    pipe._ensure_engine()
    real = pipe.sr_module.upscale_tiles
    calls = {"n": 0}

    def transient(tiles, scale, provider="quality", steps=0, **kw):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RuntimeError("transient failure")
        return real(tiles, scale, provider=provider, steps=steps, **kw)

    pipe.sr_module.upscale_tiles = transient
    result = pipe.process(input_png, out)
    assert result.success, result.error_message
    stats = pipe.scheduler.get_statistics()
    assert stats["counters"]["retried"] >= 1
    assert stats["counters"]["degraded"] == 0


def test_checkpoint_resume_after_kill(input_png, tmp_path):
    # Kill-and-rerun: first run checkpoints the upscaled tiles after SR,
    # then dies in blending; the rerun completes from checkpoint with ZERO
    # upscale calls (reference probe: main.py:299-304).
    from srs_tpu.tiling.cache import TileStore

    out = str(tmp_path / "ck.png")

    def make_pipe():
        p = SuperResolutionPipeline(
            _cfg(provider="fast", enable_checkpoint=True, enable_qa=False)
        )
        p._ensure_engine()
        p.tiling_module.store = TileStore(str(tmp_path / "store"))
        calls = {"n": 0}
        real = p.sr_module.upscale_tiles

        def counting(tiles, scale, provider="quality", steps=0, **kw):
            calls["n"] += 1
            return real(tiles, scale, provider=provider, steps=steps, **kw)

        p.sr_module.upscale_tiles = counting
        return p, calls

    pipe, calls = make_pipe()
    pipe._blend = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("killed"))
    result = pipe.process(input_png, out)
    assert not result.success
    assert calls["n"] > 0

    pipe2, calls2 = make_pipe()
    result2 = pipe2.process(input_png, out)
    assert result2.success, result2.error_message
    assert calls2["n"] == 0  # every tile came from the checkpoint
    with Image.open(out) as im:
        assert im.size == (320, 240)


def test_checkpoint_partial_resume(input_png, tmp_path):
    # Only some tiles checkpointed -> the rerun upscales just the missing
    # subset and the output matches a from-scratch run to quantization.
    from srs_tpu.tiling.cache import TileStore

    out = str(tmp_path / "pr.png")
    pipe = SuperResolutionPipeline(
        _cfg(provider="fast", enable_checkpoint=True, enable_qa=False)
    )
    pipe._ensure_engine()
    pipe.tiling_module.store = TileStore(str(tmp_path / "store2"))
    pipe._blend_orig = pipe._blend
    pipe._blend = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("killed"))
    pipe.process(input_png, out)

    # drop some checkpointed tiles to force a partial resume
    store = TileStore(str(tmp_path / "store2"))
    key = [d for d in __import__("os").listdir(str(tmp_path / "store2"))][0]
    blocks = sorted(store.list_blocks(key))
    assert len(blocks) >= 2
    import os as _os
    _os.remove(_os.path.join(str(tmp_path / "store2"), key, blocks[0] + ".npz"))

    pipe2 = SuperResolutionPipeline(
        _cfg(provider="fast", enable_checkpoint=True, enable_qa=False)
    )
    pipe2._ensure_engine()
    pipe2.tiling_module.store = TileStore(str(tmp_path / "store2"))
    result = pipe2.process(input_png, out)
    assert result.success, result.error_message

    ref = SuperResolutionPipeline(_cfg(provider="fast", enable_qa=False)).process(
        input_png, str(tmp_path / "ref.png")
    )
    assert ref.success
    a = np.asarray(Image.open(out), np.float32)
    b = np.asarray(Image.open(str(tmp_path / "ref.png")), np.float32)
    assert np.abs(a - b).max() <= 2.0  # uint8 store quantization only


def test_quality_model_selectable(input_png, tmp_path):
    """PipelineConfig.quality_model routes the quality tier to a different
    registry net (here rcan — untrained falls back to the bicubic floor)."""
    out = str(tmp_path / "rcan.png")
    pipe = SuperResolutionPipeline(_cfg(quality_model="rcan", enable_qa=False))
    result = pipe.process(input_png, out)
    assert result.success, result.error_message
    assert pipe.sr_module.config.quality_model == "rcan"


def test_staged_multipass_matches_traced_ensemble(tmp_path):
    """The dispatch-staged multi-pass path (_staged_multipass) must equal
    the fully-traced upscale_tiles semantics. The traced variant OOMed HBM
    and killed the remote compile helper at print sizes (round 5), so the
    pipeline stages one single-net program per (member, scale) instead —
    same math, different execution shape."""
    import jax.numpy as jnp

    cfg = _cfg(provider="quality", quality_model="espcn",
               self_ensemble=True, per_scale_selection=False)
    pipe = SuperResolutionPipeline(cfg)
    pipe._ensure_engine()
    # staged path requires the non-mesh branch
    assert getattr(pipe, "dispatcher", None) is None
    calls = []
    orig = pipe._staged_multipass
    pipe._staged_multipass = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    r = np.random.default_rng(11)
    tiles = jnp.asarray(
        r.uniform(0, 255, (3, 32, 32, 3)).astype(np.float32))
    staged = pipe._upscale_batch(tiles, [2])
    assert calls, "multi-pass batch must take the staged path"
    traced = pipe.sr_module.upscale_tiles(
        tiles, 2, provider="quality", steps=cfg.ibp_steps)
    np.testing.assert_allclose(
        np.asarray(staged), np.asarray(traced), atol=1e-3)


def test_staged_multipass_fusion_matches_traced(tmp_path):
    """Fusion with a '+' member: staged == traced member blend."""
    import jax.numpy as jnp

    cfg = _cfg(provider="fusion", per_scale_selection=False)
    pipe = SuperResolutionPipeline(cfg)
    pipe._ensure_engine()
    # Inject a resolved fusion mix (espcn is packaged/trained at x2).
    pipe.sr_module._fusion_cache[2] = [("espcn+", 0.7), ("bicubic", 0.3)]
    calls = []
    orig = pipe._staged_multipass
    pipe._staged_multipass = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    r = np.random.default_rng(12)
    tiles = jnp.asarray(
        r.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32))
    staged = pipe._upscale_batch(tiles, [2])
    assert calls, "fusion batch must take the staged path"
    traced = pipe.sr_module.upscale_tiles(
        tiles, 2, provider="fusion", steps=cfg.ibp_steps)
    np.testing.assert_allclose(
        np.asarray(staged), np.asarray(traced), atol=1e-3)
