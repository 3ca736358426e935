"""Prompt-conditioned polish (models/conditioning.py): the path by which
a prompt category changes output pixels (reference analog: prompt-steered
diffusion, super_resolution_module.py:102-222 used at :625-640)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srs_tpu.models.conditioning import (CATEGORY_CONDITIONING, COND_DIM,
                                         CondPolish, build_cond_polish,
                                         cond_vector, degrade_conditioned,
                                         jpeg_blockiness)


@pytest.fixture(scope="module")
def img64():
    rng = np.random.default_rng(7)
    x = rng.random((64, 64, 3), dtype=np.float32) * 255
    # mild smoothing: natural-ish spectrum instead of white noise
    import cv2

    return cv2.GaussianBlur(x, (0, 0), 1.5)


def test_jpeg_model_identity_and_monotone(img64):
    x = jnp.asarray(img64)
    out0 = np.asarray(jpeg_blockiness(x, jnp.float32(0.0)))
    np.testing.assert_allclose(out0, img64, atol=1e-3)
    mses = [
        float(((np.asarray(jpeg_blockiness(x, jnp.float32(s))) - img64) ** 2).mean())
        for s in (0.3, 1.0, 2.5)
    ]
    assert mses[0] < mses[1] < mses[2]
    assert mses[0] > 0.01  # actually does something


def test_degrade_conditioned_reports_what_it_applied(img64):
    hr = jnp.asarray(np.stack([img64] * 8))
    dist, c = degrade_conditioned(hr, jax.random.PRNGKey(3))
    assert dist.shape == hr.shape and c.shape == (8, COND_DIM)
    d = np.asarray(dist)
    cv = np.asarray(c)
    for i in range(8):
        err = float(np.abs(d[i] - img64).mean())
        if np.all(cv[i] == 0):  # c = 0 must mean untouched
            assert err < 1e-3
        else:
            assert err > 0.05


def test_identity_at_init_and_category_vectors(img64):
    module, params, trained = build_cond_polish(checkpoint_dir="/nonexistent")
    x = jnp.asarray(img64)
    if not trained:
        out = np.asarray(module.apply(params, x, cond_vector("3c")))
        np.testing.assert_allclose(out, img64, atol=1e-4)
    # every template category has a vector; unknown falls back to general
    from srs_tpu.models.prompts import PromptTemplateManager

    for cat in PromptTemplateManager.list_categories():
        assert cat in CATEGORY_CONDITIONING
    np.testing.assert_allclose(
        np.asarray(cond_vector("nope")), np.asarray(cond_vector("general"))
    )


def test_conditioning_changes_output_when_trained(img64):
    # hand-perturb the zero residual so the net is "trained": different
    # categories must then produce different pixels through FiLM
    module = CondPolish()
    params = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((COND_DIM,), jnp.float32),
    )
    import flax

    p = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else dict(params)
    kern = p["params"]["conv_out"]["kernel"]
    p["params"]["conv_out"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(1), kern.shape, kern.dtype) * 0.05
    )
    x = jnp.asarray(img64)
    out_food = np.asarray(module.apply(p, x, cond_vector("food")))
    out_3c = np.asarray(module.apply(p, x, cond_vector("3c")))
    assert np.abs(out_food - out_3c).max() > 0.01
    # and zero conditioning differs from both (FiLM beta path)
    out_zero = np.asarray(module.apply(p, x, jnp.zeros((COND_DIM,))))
    assert np.abs(out_zero - out_3c).max() > 0.01


def test_trained_conditioning_restores_matching_distortion(img64):
    """With the packaged checkpoint, the conditioning vector must steer
    restoration: polishing a noisy image with its true c beats both the
    unpolished input and blind zero conditioning (skipped until the
    round-3e fleet packages cond_polish_x1)."""
    module, params, trained = build_cond_polish()
    if not trained:
        pytest.skip("no packaged cond_polish checkpoint")
    rng = np.random.default_rng(5)
    clean = jnp.asarray(img64)
    noisy = jnp.asarray(
        np.clip(img64 + rng.normal(0, 15, img64.shape), 0, 255).astype(np.float32)
    )

    def psnr(a, b):
        mse = float(jnp.mean((jnp.clip(a, 0, 255) - b) ** 2))
        return 10 * np.log10(255.0**2 / max(mse, 1e-12))

    c_true = jnp.asarray([15.0 / 25.0, 0.0, 0.0], jnp.float32)
    restored = module.apply(params, noisy, c_true)
    blind = module.apply(params, noisy, jnp.zeros((COND_DIM,)))
    p_in, p_res, p_blind = psnr(noisy, clean), psnr(restored, clean), psnr(blind, clean)
    assert p_res > p_in + 1.0, (p_in, p_res)
    assert p_res > p_blind, (p_blind, p_res)
    # clean passthrough: zero conditioning must not damage a clean image
    p_clean = psnr(module.apply(params, clean, jnp.zeros((COND_DIM,))), clean)
    assert p_clean > 45.0, p_clean


def test_pipeline_prompt_steers_output_when_trained(img64, tmp_path):
    """process(prompt=<category>) must change the pixels once the
    conditioned polish is packaged (reference: prompt feeds the diffusion
    provider, main.py:299-340). Skipped until round-3e packages it."""
    if not build_cond_polish()[2]:
        pytest.skip("no packaged cond_polish checkpoint")
    import cv2

    from srs_tpu.pipeline import PipelineConfig, SuperResolutionPipeline

    inp = str(tmp_path / "in.png")
    cv2.imwrite(inp, cv2.cvtColor(img64.astype(np.uint8), cv2.COLOR_RGB2BGR))
    cfg = PipelineConfig(
        block_size=64, target_resolution="128x128", provider="fast",
        enable_qa=False,
    )
    pipe = SuperResolutionPipeline(cfg)
    out_a = str(tmp_path / "plain.png")
    out_b = str(tmp_path / "cond.png")
    assert pipe.process(inp, out_a).success
    assert pipe.process(inp, out_b, prompt="3c").success
    a = cv2.imread(out_a).astype(np.float32)
    b = cv2.imread(out_b).astype(np.float32)
    assert np.abs(a - b).max() > 0.5, "prompt category did not change pixels"


def test_upscale_tiles_category_is_noop_when_untrained(img64):
    from srs_tpu.config import ModelConfig
    from srs_tpu.models.sr_module import SuperResolutionModule

    sr = SuperResolutionModule(config=ModelConfig(checkpoint_dir="/nonexistent"))
    tiles = jnp.asarray(np.stack([img64[:32, :32]]))
    base = np.asarray(sr.upscale_tiles(tiles, 2, provider="bicubic"))
    cond = np.asarray(
        sr.upscale_tiles(tiles, 2, provider="bicubic", category="food")
    )
    if not build_cond_polish("/nonexistent")[2]:
        np.testing.assert_allclose(base, cond, atol=1e-5)
