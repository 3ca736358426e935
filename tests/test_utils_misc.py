"""Profiling utils, generative module, config tree tests."""

import json
import time

import numpy as np
import pytest

from srs_tpu.config import RESOLUTION_PRESETS, SystemConfig
from srs_tpu.models.generate import ARKImageConfig, ARKImageGenerator, generate_image
from srs_tpu.utils.profiling import StageTimer


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert rep["stages"][0]["name"] == "a"
    assert rep["stages"][0]["calls"] == 2
    assert rep["total_s"] >= 0.01
    json.loads(str(t))  # str is valid json


def test_generate_deterministic(monkeypatch):
    # procedural backend: full-size learned generation (diffusion + SR
    # ladder to 1K) is the TPU path, covered by test_generative.py
    monkeypatch.setenv("SRS_ARK_PROCEDURAL", "1")
    r1 = generate_image("studio shot of a red bottle", size="1K", seed=None)
    r2 = generate_image("studio shot of a red bottle", size="1K")
    assert r1.seed == r2.seed
    a1 = np.asarray(r1.image)
    np.testing.assert_array_equal(a1, np.asarray(r2.image))
    assert a1.shape == (1024, 1024, 3)
    r3 = generate_image("different prompt", size="1K")
    assert r3.seed != r1.seed


def test_generate_watermark_and_config(monkeypatch):
    monkeypatch.setenv("SRS_ARK_PROCEDURAL", "1")
    gen = ARKImageGenerator(api_key="ignored", config=ARKImageConfig(size="1K", watermark=True))
    r = gen.generate("x")
    assert r.size == (1024, 1024)
    base = ARKImageGenerator().generate("x", ARKImageConfig(size="1K", watermark=False))
    assert not np.array_equal(
        np.asarray(r.image)[-10:, -10:], np.asarray(base.image)[-10:, -10:]
    )


def test_system_config_env_overrides(monkeypatch):
    monkeypatch.setenv("BLOCK_SIZE", "1024")
    monkeypatch.setenv("OVERLAP_RATIO", "0.25")
    monkeypatch.setenv("TARGET_RESOLUTION", "150MP")
    monkeypatch.setenv("SRS_PROVIDER", "fast")
    monkeypatch.setenv("SRS_MESH", "data=4,space=2")
    cfg = SystemConfig.from_env()
    assert cfg.tiling.block_size == 1024
    assert cfg.tiling.overlap_ratio == 0.25
    assert cfg.super_resolution.target_resolution == "150MP"
    assert cfg.model.default_provider == "fast"
    assert cfg.parallel.mesh_shape == {"data": 4, "space": 2}
    d = cfg.to_dict()
    assert d["tiling"]["block_size"] == 1024


def test_config_validation_and_presets():
    from srs_tpu.config import TilingConfig

    with pytest.raises(ValueError):
        TilingConfig(overlap_ratio=0.5)
    assert RESOLUTION_PRESETS["200MP"] == (17320, 11547)
    cfg = SystemConfig()
    assert cfg.super_resolution.target_size() == RESOLUTION_PRESETS["100MP"]


def test_multipass_ladder_flops_counts_passes():
    """The ensemble/fusion cost rows' MFU denominator: an 8-pass dihedral
    member counts 8x the single-pass conv FLOPs, members sum."""
    from srs_tpu.utils.flops import ladder_flops, multipass_ladder_flops

    f1 = ladder_flops("espcn", [2], 64, 4)
    assert f1 > 0
    f8 = multipass_ladder_flops([[["espcn", 8]]], [2], 64, 4)
    assert abs(f8 - 8 * f1) < 1e-3
    # mixed member list at one step: sum of per-member pass counts
    fm = multipass_ladder_flops([[["espcn", 8], ["espcn", 1]]], [2], 64, 4)
    assert abs(fm - 9 * f1) < 1e-3
    # two-step ladder: step 2 runs at step-1 output resolution
    f2 = multipass_ladder_flops([[["espcn", 1]], [["espcn", 1]]], [2, 2], 64, 4)
    assert abs(f2 - (f1 + ladder_flops("espcn", [2], 128, 4))) < 1e-3
