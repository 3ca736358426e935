"""Real-photograph holdout: the generalization oracle.

grace_hopper.jpg (the only standalone real photograph in this
environment) must NEVER enter training or QA fitting — it is the held-out
probe for the natural-image capability the reference gets from its
photo-trained remote providers (super_resolution_module.py:561-711).
These tests enforce the holdout and regression-guard the packaged nets'
uplift on real content (round-2 verdict: corpus-only nets scored +1.2 dB
here vs +5.7 claimed on procedural renders)."""

import os

import numpy as np
import pytest


def _photo():
    import matplotlib
    from PIL import Image

    p = os.path.join(os.path.dirname(os.path.abspath(matplotlib.__file__)),
                     "mpl-data", "sample_data", "grace_hopper.jpg")
    img = np.asarray(Image.open(p).convert("RGB"), np.float32)
    h, w = img.shape[:2]
    return img[: h - h % 4, : w - w % 4]


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def test_grace_hopper_not_in_training_sources():
    # 1. not a photo_data source
    from srs_tpu.models.photo_data import photo_paths

    assert all("grace_hopper" not in p for p in photo_paths())
    # 2. never referenced anywhere in the package source (training, QA
    # fitting, corpus) — only scripts/ (eval) and tests/ may load it
    pkg_root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "srs_tpu")
    hits = []
    for root, _, files in os.walk(pkg_root):
        for f in files:
            if f.endswith(".py"):
                path = os.path.join(root, f)
                with open(path, encoding="utf-8") as fh:
                    if "grace_hopper" in fh.read():
                        hits.append(path)
    assert not hits, f"holdout photo referenced inside the package: {hits}"


def test_eval_holdout_sources_disjoint_from_training_pool():
    """Round 4: the 3 EVAL_HOLDOUT_SOURCES (flower + both wood textures)
    must never appear in the training pool accessors that feed corpora and
    QA fitting — they are the multi-image eval panel (VERDICT r3 #2)."""
    from srs_tpu.models.photo_data import (EVAL_HOLDOUT_SOURCES,
                                           eval_photo_paths, photo_paths)

    train, evalp = set(photo_paths()), set(eval_photo_paths())
    assert len(EVAL_HOLDOUT_SOURCES) >= 3
    assert evalp, "eval panel sources missing from this install"
    assert not (train & evalp), f"eval images leak into training: {train & evalp}"
    for frag in ("flower.jpg", "wood1.png", "darkwood.png"):
        assert all(frag not in p for p in train), f"{frag} in training pool"
        assert any(frag in p for p in evalp), f"{frag} missing from eval panel"
    # round 5: the texture-tier accessor is a SUBSET of the training pool
    # (so the holdout guarantee above covers the tex corpus mix too)
    from srs_tpu.models.photo_data import texture_paths

    tex = set(texture_paths())
    assert tex <= train, f"texture sources outside the training pool: {tex - train}"
    assert not (tex & evalp)


def test_eval_panel_loads_four_common_shape_images():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "photo_eval", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "photo_eval.py"))
    pe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pe)
    panel = pe.load_panel()
    names = [t for t, _ in panel]
    assert names == ["portrait", "flower", "wood", "darkwood"]
    for _, hr in panel:
        assert hr.shape == (pe.PANEL_H, pe.PANEL_W, 3)
        assert pe.PANEL_H % 12 == 0 and pe.PANEL_W % 12 == 0


@pytest.mark.parametrize("name,min_delta", [("espcn", 0.8), ("edsr_l", 0.8)])
def test_packaged_nets_beat_bicubic_on_real_photo(name, min_delta):
    """Packaged x2 nets must add real detail on a real photograph, not
    just on the procedural corpus. Run at half resolution (CPU suite);
    the full-size panel is scripts/photo_eval.py."""
    import cv2
    import jax.numpy as jnp

    from srs_tpu.models.registry import (build_model, clear_param_cache,
                                         is_pretrained)
    from srs_tpu.ops.resize import resize_bicubic_up

    clear_param_cache()
    try:
        if not is_pretrained(name, 2):
            pytest.skip(f"no packaged {name}_x2 checkpoint")
        hr = _photo()
        hr = cv2.resize(hr, (hr.shape[1] // 2, hr.shape[0] // 2),
                        interpolation=cv2.INTER_AREA)
        lr = cv2.resize(hr, (hr.shape[1] // 2, hr.shape[0] // 2),
                        interpolation=cv2.INTER_AREA)
        lr_b = jnp.asarray(lr, jnp.float32)[None]
        base = _psnr(np.clip(np.asarray(resize_bicubic_up(lr_b, 2))[0], 0, 255), hr)
        module, params = build_model(name, 2)
        out = np.clip(np.asarray(module.apply(params, lr_b))[0], 0, 255)
        delta = _psnr(out, hr) - base
        assert delta >= min_delta, (
            f"{name}_x2 adds only {delta:+.2f} dB over bicubic on the real "
            f"photo (needs >= {min_delta})"
        )
    finally:
        clear_param_cache()


def test_robust_net_not_below_bicubic_on_clean_photo():
    """The degradation-robust tier must never cost quality on clean real
    input (round-2: -1.3 dB; fixed by the 30% clean-passthrough training
    fraction)."""
    import cv2
    import jax.numpy as jnp

    from srs_tpu.models.registry import (build_model, clear_param_cache,
                                         is_pretrained)
    from srs_tpu.ops.resize import resize_bicubic_up

    clear_param_cache()
    try:
        if not is_pretrained("edsr_l_robust", 2):
            pytest.skip("no packaged edsr_l_robust_x2 checkpoint")
        hr = _photo()
        hr = cv2.resize(hr, (hr.shape[1] // 2, hr.shape[0] // 2),
                        interpolation=cv2.INTER_AREA)
        lr = cv2.resize(hr, (hr.shape[1] // 2, hr.shape[0] // 2),
                        interpolation=cv2.INTER_AREA)
        lr_b = jnp.asarray(lr, jnp.float32)[None]
        base = _psnr(np.clip(np.asarray(resize_bicubic_up(lr_b, 2))[0], 0, 255), hr)
        module, params = build_model("edsr_l_robust", 2)
        out = np.clip(np.asarray(module.apply(params, lr_b))[0], 0, 255)
        assert _psnr(out, hr) >= base - 0.1
    finally:
        clear_param_cache()
