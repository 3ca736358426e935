"""ARK learned generator (models/generative.py + generate.py wiring):
class mapping, diffusion math, tiny-train round-trip, packaged sampling.
(Reference analog: ark_api_module.py:17-96 — remote text-to-image.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srs_tpu.models.generative import (
    ARK_CLASSES,
    CondUNet,
    alpha_bar,
    build_ark,
    class_for_prompt,
    clear_ark_cache,
    is_ark_trained,
    render_class,
    sample_ark,
    train_ark,
)


def test_class_for_prompt_mapping():
    assert ARK_CLASSES[class_for_prompt("a text poster for a sale")] == "document"
    assert ARK_CLASSES[class_for_prompt("herringbone weave pattern")] == "pattern"
    assert ARK_CLASSES[class_for_prompt("", "jewelry")] == "shaded"
    assert ARK_CLASSES[class_for_prompt("food")] == "photo"  # category name as prompt
    assert ARK_CLASSES[class_for_prompt("anything else at all")] == "scene"
    # keyword beats category
    assert ARK_CLASSES[class_for_prompt("marble texture closeup", "beauty")] == "texture"


def test_alpha_bar_schedule():
    t = jnp.linspace(0.0, 1.0, 11)
    ab = np.asarray(alpha_bar(t))
    assert ab[0] > 0.99 and ab[-1] < 0.01
    assert np.all(np.diff(ab) < 0)  # strictly decreasing


def test_render_class_deterministic_distinct():
    a = render_class(3, 1, 48)  # document
    b = render_class(3, 1, 48)
    c = render_class(3, 4, 48)  # texture
    np.testing.assert_array_equal(a, b)
    assert a.shape == (48, 48, 3) and a.dtype == np.float32
    assert float(np.abs(a - c).mean()) > 1.0
    assert 0.0 <= a.min() and a.max() <= 255.0


def test_sampler_shape_and_determinism_tiny():
    # zero params via eval_shape: a real `init` is ~15 s of eager-op CPU
    # compiles and the sampler's determinism/range/shape contract doesn't
    # depend on param values (trained-model behavior = slow test below;
    # checkpoint save/restore also slow — orbax costs ~25 s of per-array
    # tensorstore overhead on this 1-core box)
    m = CondUNet(base=8, depth=1)
    shapes = jax.eval_shape(
        lambda: m.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
            jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
        )
    )
    p = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    s1 = sample_ark(m, p, 2, jax.random.PRNGKey(7), size=32, steps=3)
    s2 = sample_ark(m, p, 2, jax.random.PRNGKey(7), size=32, steps=3)
    s3 = sample_ark(m, p, 2, jax.random.PRNGKey(8), size=32, steps=3)
    assert s1.shape == (1, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert float(jnp.abs(s1 - s3).mean()) > 0.1  # seed changes the sample
    assert 0.0 <= float(s1.min()) and float(s1.max()) <= 255.0


@pytest.mark.slow
def test_train_ark_tiny_and_checkpoint_roundtrip(tmp_path):
    # the optimizer-step scan is a ~30 s CPU compile; the trainer itself is
    # exercised for real on TPU (scripts/train_ark.py)
    # 8 imgs/class at 32 px, 4 steps: the full train->save->build_ark path
    x = np.stack([render_class(i, c, 32) for c in range(8) for i in range(2)])
    y = np.asarray([c for c in range(8) for _ in range(2)], np.int32)
    _, ema, loss = train_ark(
        steps=4, size=32, base=8, depth=1, batch=4, scan_chunk=2,
        corpus=(x.astype(np.float32), y), checkpoint_dir=str(tmp_path),
    )
    assert np.isfinite(loss)
    clear_ark_cache()
    try:
        # the sidecar records the trained geometry, and build_ark's
        # meta-defaulted construction matches the explicit one
        from srs_tpu.models.generative import ark_meta

        meta = ark_meta(str(tmp_path))
        assert meta == {"size": 32, "base": 8, "depth": 1}
        module, params, trained = build_ark(checkpoint_dir=str(tmp_path))
        assert trained and module.base == 8 and module.depth == 1
        k0 = jax.tree_util.tree_leaves(params)[0]
        e0 = jax.tree_util.tree_leaves(ema)[0]
        np.testing.assert_allclose(np.asarray(k0), np.asarray(e0))
        # warm-start re-train from the saved checkpoint converges the
        # same tree shapes (init_from path)
        clear_ark_cache()
        _, ema2, loss2 = train_ark(
            steps=2, size=32, base=8, depth=1, batch=4, scan_chunk=2,
            corpus=(x.astype(np.float32), y), init_from=str(tmp_path),
        )
        assert np.isfinite(loss2)
    finally:
        clear_ark_cache()


def test_refine_ark_tiny_shape_and_fidelity():
    """SDEdit tile refinement: output keeps the input's shape and (at a
    shallow t0 with an untrained net) stays correlated with the input —
    the renoise/denoise round trip must not destroy global structure."""
    import jax

    from srs_tpu.models.generative import CondUNet, refine_ark

    m = CondUNet(base=8, depth=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), jnp.zeros((1,), jnp.int32))
    # smooth high-contrast image (what an SR upscale looks like). NB the
    # untrained net's zero-init head predicts v=0, so the injected noise
    # is NOT removed — the bound below is the t0=0.08 noise floor
    # (sqrt(1-alpha_bar) ~ 0.2 in [-1,1] units), not trained behavior.
    yy, xx = np.mgrid[0:40, 0:56].astype(np.float32)
    img = jnp.asarray(np.clip(np.stack([yy * 6, xx * 4, yy * 3 + xx * 2], -1), 0, 255))
    out = refine_ark(m, p, img, cls=2, key=jax.random.PRNGKey(1),
                     t0=0.08, steps=3, tile=16, chunk=8)
    assert out.shape == img.shape
    a = np.asarray(img, np.float64).ravel()
    b = np.asarray(out, np.float64).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.85, f"refinement destroyed structure (corr {corr:.3f})"
    assert float(np.abs(b - a).mean()) > 1e-3  # and it did change pixels
    # determinism: same key -> same refinement
    out2 = refine_ark(m, p, img, cls=2, key=jax.random.PRNGKey(1),
                      t0=0.08, steps=3, tile=16, chunk=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


@pytest.mark.slow
def test_generate_learned_when_packaged(monkeypatch):
    """With the packaged ark_gen checkpoint the API serves the diffusion
    backend: deterministic, prompt-class steered, SR-ladder upscaled.
    Slow-marked: the full-size UNet apply is a ~20 s CPU compile; the
    sampler/loader mechanics have default-run tiny guards above, and the
    real model is exercised on TPU (scripts/train_ark.py + docs/GUIDE)."""
    monkeypatch.delenv("SRS_ARK_PROCEDURAL", raising=False)
    if not is_ark_trained():
        pytest.skip("no packaged ark_gen checkpoint")
    from srs_tpu.models.generate import ARKImageConfig, ARKImageGenerator

    from srs_tpu.models.generative import ark_meta

    gen = ARKImageGenerator()
    # fast SR tier: the espcn x2 tail compiles in seconds on CPU where the
    # default edsr_l costs ~30 s for identical coverage of the wiring.
    # Target = 2x the checkpoint's native base so the SR ladder is
    # exercised whatever resolution the packaged model was trained at.
    native = ark_meta()["size"]
    tgt = f"{2 * native}x{2 * native}"
    extra = {"steps": 4, "sr_provider": "fast"}
    cfg = ARKImageConfig(size=tgt, extra=extra)
    r1 = gen.generate("product shot of a watch", cfg)
    assert r1.metadata["model"] == "ark_gen-ddim"
    assert np.asarray(r1.image).shape == (2 * native, 2 * native, 3)
    assert r1.metadata["sr_ladder"] and int(np.prod(r1.metadata["sr_ladder"])) == 2
    r2 = gen.generate("product shot of a watch", cfg)
    np.testing.assert_array_equal(np.asarray(r1.image), np.asarray(r2.image))
    # a different class changes the pixels (same seed forced)
    cfg3 = ARKImageConfig(size=tgt, seed=r1.seed, extra=dict(extra))
    r3 = gen.generate("a text poster page", cfg3)
    assert r3.metadata["class"] != r1.metadata["class"]
    assert float(np.abs(np.asarray(r3.image, np.float32)
                        - np.asarray(r1.image, np.float32)).mean()) > 1.0
