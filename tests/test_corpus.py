"""Corpus family mixes (models/corpus.py render_any/make_corpus).

The training distribution is the round-3 quality lever (reference analog:
the photo-trained remote providers, super_resolution_module.py:561-711);
these tests pin the mix contract: determinism per seed, the v4 JPEG
round-trip actually changing HR statistics, and the photo-only fine-tune
mix staying inside the bundled-photo sources.
"""

import numpy as np
import pytest


@pytest.mark.parametrize("mix", ["proc", "v3", "v4", "photo", "p70", "tex"])
def test_mix_deterministic_and_bounded(mix):
    from srs_tpu.models.corpus import make_corpus

    a = make_corpus(3, 96, seed=11, mix=mix)
    b = make_corpus(3, 96, seed=11, mix=mix)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (3, 96, 96, 3) and a.dtype == np.float32
    assert float(a.min()) >= 0.0 and float(a.max()) <= 255.0


def test_unknown_mix_raises():
    from srs_tpu.models.corpus import render_any

    with pytest.raises(ValueError):
        render_any(0, 64, mix="nope")


def test_p70_replay_arm_is_clean_procedural():
    """p70's non-photo arm must be the UNMODIFIED eval-panel distribution
    (render_image, no JPEG round-trip) — that's the whole point of the
    rehearsal mix (photo-only fine-tunes forget the procedural panel)."""
    from srs_tpu.models.corpus import render_any, render_image

    replayed = 0
    for seed in range(24):
        rng = np.random.default_rng(seed ^ 0x5F375A86)
        if rng.random() >= 0.70:  # replay arm for this seed
            np.testing.assert_array_equal(
                render_any(seed, 96, mix="p70"), render_image(seed, 96)
            )
            replayed += 1
    assert replayed >= 3


def test_tex_mix_stays_inside_texture_sources():
    """The tex mix's photo arm must draw ONLY from TEXTURE_SOURCES (never
    the held-out wood captures — tests/test_photo_holdout.py guards the
    source lists; here we pin the mosaic's provenance) and its replay arm
    must be the clean procedural distribution."""
    from srs_tpu.models.corpus import render_any, render_image
    from srs_tpu.models.photo_data import texture_mosaic, texture_paths

    if not texture_paths():
        pytest.skip("no texture sources installed")
    mosaics = replays = 0
    for seed in range(16):
        img = render_any(seed, 96, mix="tex")
        rng = np.random.default_rng(seed ^ 0x5F375A86)
        if rng.random() < 0.90:
            np.testing.assert_array_equal(img, texture_mosaic(seed, 96))
            mosaics += 1
        else:
            np.testing.assert_array_equal(img, render_image(seed, 96))
            replays += 1
    assert mosaics >= 10


def test_v4_jpeg_roundtrip_alters_some_images():
    """v4 = v3 families + JPEG'd HRs (and a larger photo share): over a
    pool of seeds the two mixes must diverge."""
    from srs_tpu.models.corpus import render_any

    diffs = 0
    for seed in range(8):
        a = render_any(seed, 96, mix="v3")
        b = render_any(seed, 96, mix="v4")
        if a.shape == b.shape and np.any(a != b):
            diffs += 1
    assert diffs >= 2
