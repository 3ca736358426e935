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
