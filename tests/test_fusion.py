"""Fusion quality mode (models/fusion.py + sr_module provider="fusion").

The TPU-native answer to the reference's one-provider-per-request routing
(super_resolution_module.py:1031-1082): run several cheap on-device nets
on the same tile batch and combine with offline-fitted affine weights.
"""

import json
import os

import numpy as np
import pytest


def test_fit_affine_recovers_known_mixture():
    from srs_tpu.models.fusion import fit_affine_weights

    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 8, 8, 3)) * 40 + 128
    b = rng.normal(size=(4, 8, 8, 3)) * 40 + 128
    target = 0.7 * a + 0.3 * b
    w = fit_affine_weights([a, b], target)
    assert abs(float(np.sum(w)) - 1.0) < 1e-9
    np.testing.assert_allclose(w, [0.7, 0.3], atol=1e-6)


def test_fit_affine_single_member_is_identity_weight():
    from srs_tpu.models.fusion import fit_affine_weights

    w = fit_affine_weights([np.ones((4, 4))], np.zeros((4, 4)))
    np.testing.assert_allclose(w, [1.0])


def test_save_load_roundtrip(tmp_path):
    from srs_tpu.models.fusion import load_fusion, save_fusion

    p = save_fusion(
        {2: (["edsr_l", "bicubic"], [0.8, 0.2], {"fitted_on": "unit"})},
        out_dir=str(tmp_path),
    )
    assert os.path.isfile(p)
    members, weights = load_fusion(2, str(tmp_path))
    assert members == ["edsr_l", "bicubic"]
    np.testing.assert_allclose(weights, [0.8, 0.2])
    assert load_fusion(3, str(tmp_path)) is None


def _module_with_fusion(tmp_path, members, weights):
    from srs_tpu.config import ModelConfig
    from srs_tpu.models.fusion import save_fusion
    from srs_tpu.models.sr_module import SuperResolutionModule

    save_fusion({2: (members, weights, {})}, out_dir=str(tmp_path))
    cfg = ModelConfig(checkpoint_dir=str(tmp_path))
    return SuperResolutionModule(config=cfg)


def test_upscale_tiles_fusion_matches_manual_blend(tmp_path):
    """provider="fusion" == the explicit weighted member combination."""
    import jax.numpy as jnp

    from srs_tpu.models.registry import build_model, is_pretrained
    from srs_tpu.ops.resize import resize_bicubic_up

    if not (is_pretrained("edsr_l", 2) and is_pretrained("espcn", 2)):
        pytest.skip("packaged checkpoints unavailable")
    weights = [0.6, 0.3, 0.1]
    mod = _module_with_fusion(tmp_path, ["edsr_l", "espcn", "bicubic"], weights)
    rng = np.random.default_rng(1)
    tiles = jnp.asarray(rng.uniform(0, 255, (2, 16, 16, 3)), jnp.float32)

    out = np.asarray(mod.upscale_tiles(tiles, 2, provider="fusion"))

    expect = None
    for name, w in zip(["edsr_l", "espcn", "bicubic"], weights):
        if name == "bicubic":
            y = resize_bicubic_up(tiles, 2)
        else:
            module, params = build_model(name, 2, str(tmp_path))
            y = module.apply(params, tiles)
        expect = y * w if expect is None else expect + y * w
    expect = np.clip(np.asarray(expect), 0, 255)
    np.testing.assert_allclose(out, expect, atol=1e-3)


def test_fusion_falls_back_to_quality_when_underpopulated(tmp_path):
    """<2 trained members -> plain quality-tier behavior, not a crash."""
    import jax.numpy as jnp

    mod = _module_with_fusion(tmp_path, ["edsr_l", "bicubic"], [0.9, 0.1])
    rng = np.random.default_rng(2)
    tiles = jnp.asarray(rng.uniform(0, 255, (1, 16, 16, 3)), jnp.float32)
    out_f = np.asarray(mod.upscale_tiles(tiles, 2, provider="fusion"))
    out_q = np.asarray(mod.upscale_tiles(tiles, 2, provider="quality"))
    np.testing.assert_allclose(out_f, out_q, atol=1e-5)


def test_fusion_routed_model_overrides_blend(tmp_path):
    """The degradation router's per-input model override (a damaged input
    routed to the robust net) must bypass the clean-photo blend."""
    import jax.numpy as jnp

    from srs_tpu.models.registry import is_pretrained

    if not is_pretrained("edsr_l_robust", 2):
        pytest.skip("packaged checkpoints unavailable")
    mod = _module_with_fusion(
        tmp_path, ["edsr_l", "espcn", "bicubic"], [0.6, 0.3, 0.1]
    )
    rng = np.random.default_rng(3)
    tiles = jnp.asarray(rng.uniform(0, 255, (1, 16, 16, 3)), jnp.float32)
    out_routed = np.asarray(
        mod.upscale_tiles(tiles, 2, provider="fusion", model="edsr_l_robust")
    )
    out_robust = np.asarray(
        mod.upscale_tiles(tiles, 2, provider="quality", model="edsr_l_robust")
    )
    np.testing.assert_allclose(out_routed, out_robust, atol=1e-5)
