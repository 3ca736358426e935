"""Corpus family mixes (models/corpus.py render_any/make_corpus).

The training distribution is the round-3 quality lever (reference analog:
the photo-trained remote providers, super_resolution_module.py:561-711);
these tests pin the mix contract: determinism per seed, the v4 JPEG
round-trip actually changing HR statistics, and the photo-only fine-tune
mix staying inside the bundled-photo sources.
"""

import numpy as np
import pytest


@pytest.mark.parametrize("mix", ["proc", "v3", "v4", "photo"])
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
