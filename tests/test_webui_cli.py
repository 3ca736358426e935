"""WebUI session/estimator logic and CLI surface tests (headless —
streamlit not required)."""

import json

import numpy as np
import pytest
from PIL import Image

from srs_tpu.cli import build_parser, main
from srs_tpu.webui import estimator, session
from srs_tpu.webui.pages.upload_page import crop_presets, extract_image_info


def test_session_state_roundtrip():
    session.reset_session_state()
    session.initialize_session_state()
    assert session.get_state("tile_size") == 1024
    session.set_state("tile_size", 2048)
    assert session.get_state("tile_size") == 2048
    summary = session.get_config_summary()
    assert summary["tile_size"] == 2048
    session.reset_session_state()
    assert session.get_state("tile_size") == 1024


def test_estimator_parity_shapes():
    est = estimator.calculate_estimates(1280, 720, 100_000_000, 1024, 0.2)
    assert est["scale_factor"] == pytest.approx(np.sqrt(100e6 / (1280 * 720)))
    assert est["num_tiles"] == est["tiles_x"] * est["tiles_y"]
    assert est["estimated_seconds"] > 0
    # more chips -> faster
    est8 = estimator.calculate_estimates(1280, 720, 100_000_000, 1024, 0.2, num_chips=8)
    assert est8["estimated_seconds"] < est["estimated_seconds"]


def test_upload_helpers():
    presets = crop_presets(1280, 720)
    assert presets["full"] == (0, 0, 1280, 720)
    x, y, w, h = presets["1:1"]
    assert w == h == 720
    img = Image.new("RGB", (100, 50))
    info = extract_image_info(img, "a.png", 1234)
    assert info["width"] == 100 and info["megapixels"] == 0.01


def test_cli_parser():
    p = build_parser()
    args = p.parse_args(["process", "in.png", "out.tiff", "--target", "150MP",
                         "--provider", "fast", "--no-qa"])
    assert args.target == "150MP" and args.provider == "fast" and args.no_qa
    with pytest.raises(SystemExit):
        p.parse_args(["process", "in.png", "out.tiff", "--provider", "remote"])


def test_cli_info(capsys):
    assert main(["info"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert "version" in out and "devices" in out


def test_cli_process_small(tmp_path, capsys):
    img = (np.random.default_rng(0).random((60, 80, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "in.png")
    Image.fromarray(img).save(p)
    rc = main(["process", p, str(tmp_path / "out.png"), "--target", "160x120",
               "--block-size", "64", "--provider", "bicubic", "--no-qa", "--steps", "0"])
    assert rc == 0
    assert (tmp_path / "out.png").exists()
    rc2 = main(["process", str(tmp_path / "none.png"), str(tmp_path / "o.png"),
                "--target", "160x120", "--no-qa"])
    assert rc2 == 1


def test_cli_new_flags():
    p = build_parser()
    args = p.parse_args([
        "process", "in.png", "out.tiff", "--provider", "zssr",
        "--blend", "multi_band", "--mesh", "data=4,space=2",
        "--bit-depth", "16", "--seam-repair", "--color-correction",
        "--checkpoint", "--zssr-steps", "60",
    ])
    assert args.provider == "zssr" and args.blend == "multi_band"
    assert args.mesh == "data=4,space=2" and args.bit_depth == 16
    assert args.seam_repair and args.color_correction and args.checkpoint
    assert args.zssr_steps == 60
    p.parse_args(["process", "i", "o", "--blend", "poisson"])  # accepted
    args = p.parse_args(["train", "--synthetic", "--corpus-n", "8"])
    assert args.synthetic and args.corpus_n == 8
    args = p.parse_args(["generate", "a weave pattern", "o.png",
                         "--size", "1K", "--steps", "8", "--category", "fashion"])
    assert args.prompt == "a weave pattern" and args.size == "1K"
    assert args.steps == 8 and args.category == "fashion"


def test_pipeline_cancel(tmp_path):
    # cancel() before a stage boundary aborts with a failed result and a
    # "cancelled" error message (the WebUI Cancel button path).
    from srs_tpu.pipeline import PipelineConfig, SuperResolutionPipeline

    img = (np.random.default_rng(0).random((60, 80, 3)) * 255).astype(np.uint8)
    src = str(tmp_path / "in.png")
    Image.fromarray(img).save(src)
    pipe = SuperResolutionPipeline(PipelineConfig(
        block_size=64, target_resolution="160x120", provider="bicubic",
        enable_qa=False))
    pipe.cancel()
    # process() clears stale cancels at entry; cancel mid-run via hook:
    result = pipe.process(src, str(tmp_path / "o.png"))
    assert result.success  # stale cancel must NOT kill a fresh run

    pipe2 = SuperResolutionPipeline(PipelineConfig(
        block_size=64, target_resolution="160x120", provider="bicubic",
        enable_qa=False))
    orig = pipe2._upscale_batch

    def cancel_during_sr(*a, **k):
        pipe2.cancel()
        return orig(*a, **k)

    pipe2._upscale_batch = cancel_during_sr
    result = pipe2.process(src, str(tmp_path / "o2.png"))
    assert not result.success
    assert "cancelled" in result.error_message


def test_result_export_reencodes(tmp_path):
    from srs_tpu.webui.pages.result_page import build_export

    img = (np.random.default_rng(1).random((40, 60, 3)) * 255).astype(np.uint8)
    src = str(tmp_path / "res.png")
    Image.fromarray(img).save(src)

    data, name = build_export(src, "jpeg", "sRGB", 8, quality=80)
    assert name.endswith(".jpg")
    import io as _io
    with Image.open(_io.BytesIO(data)) as im:
        assert im.format == "JPEG" and im.size == (60, 40)

    data, name = build_export(src, "tiff", "AdobeRGB", 16)
    assert name.endswith("_adobergb.tiff")
    with open(tmp_path / "x.tiff", "wb") as f:
        f.write(data)
    # AdobeRGB encode must change the pixels (gamma + primaries)
    data_srgb, _ = build_export(src, "png", "sRGB", 8)
    with Image.open(_io.BytesIO(data_srgb)) as im:
        assert np.asarray(im).shape == (40, 60, 3)

    from srs_tpu.ops.colorspace import convert_profile
    conv = convert_profile(img.astype(np.float32), "AdobeRGB")
    assert not np.allclose(conv, img, atol=1.0)
    # gray axis is invariant under primary conversion (same white point path)
    gray = np.full((4, 4, 3), 128.0, np.float32)
    cg = convert_profile(gray, "AdobeRGB")
    assert np.allclose(cg, cg[..., :1], atol=0.6)  # stays neutral


def test_cli_warmup_small(capsys):
    from srs_tpu.cli import main

    # shapes shared with test_pipeline's _cfg (120x160 -> 320x240, block 64,
    # QA on): in the full suite every program incl. QA is already jit-cached
    rc = main(["warmup", "--source", "160x120", "--target", "320x240",
               "--provider", "bicubic", "--block-size", "64"])
    assert rc == 0
    assert "warmed" in capsys.readouterr().out


def test_cli_process_with_profile(tmp_path):
    from srs_tpu.cli import main

    img = (np.random.default_rng(0).random((60, 80, 3)) * 255).astype(np.uint8)
    src = str(tmp_path / "in.png")
    Image.fromarray(img).save(src)
    trace_dir = str(tmp_path / "trace")
    # same shapes as test_cli_process_small: only the profiler is new work
    rc = main(["process", src, str(tmp_path / "o.png"), "--target", "160x120",
               "--provider", "bicubic", "--block-size", "64", "--no-qa",
               "--profile", trace_dir])
    assert rc == 0
    import os as _os

    assert _os.path.isdir(trace_dir) and _os.listdir(trace_dir)
