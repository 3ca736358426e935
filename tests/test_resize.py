"""Golden tests: bicubic resize vs cv2.resize(INTER_CUBIC)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from srs_tpu.ops.resize import resize_bicubic, resize_bicubic_up

ULP = 5e-7


@pytest.mark.parametrize("shape,s", [((32, 48, 3), 2), ((17, 23, 3), 4), ((64, 64, 1), 3)])
def test_upscale_matches_cv2(rng, shape, s):
    x = rng.random(shape, dtype=np.float32)
    ref = cv2.resize(x, (shape[1] * s, shape[0] * s), interpolation=cv2.INTER_CUBIC)
    if ref.ndim == 2:
        ref = ref[..., None]
    got = np.asarray(resize_bicubic_up(jnp.asarray(x), s))
    np.testing.assert_allclose(got, ref, atol=ULP, rtol=0)
    got2 = np.asarray(resize_bicubic(jnp.asarray(x), shape[0] * s, shape[1] * s))
    np.testing.assert_allclose(got2, ref, atol=ULP, rtol=0)


@pytest.mark.parametrize(
    "shape,dst", [((64, 64, 3), (32, 32)), ((100, 150, 3), (33, 47)), ((256, 128, 3), (100, 90))]
)
def test_downscale_matches_cv2(rng, shape, dst):
    x = rng.random(shape, dtype=np.float32)
    ref = cv2.resize(x, (dst[1], dst[0]), interpolation=cv2.INTER_CUBIC)
    got = np.asarray(resize_bicubic(jnp.asarray(x), *dst))
    np.testing.assert_allclose(got, ref, atol=ULP, rtol=0)


def test_identity_and_batch(rng):
    x = rng.random((4, 16, 16, 3), dtype=np.float32)
    assert np.asarray(resize_bicubic_up(jnp.asarray(x), 1)).shape == x.shape
    up = np.asarray(resize_bicubic_up(jnp.asarray(x), 2))
    assert up.shape == (4, 32, 32, 3)
    for i in range(4):
        ref = cv2.resize(x[i], (32, 32), interpolation=cv2.INTER_CUBIC)
        np.testing.assert_allclose(up[i], ref, atol=ULP, rtol=0)


def test_banded_resize_matches_cv2(rng):
    from srs_tpu.ops.resize import resize_bicubic_banded

    x = rng.random((600, 500, 3), dtype=np.float32) * 255
    ref = cv2.resize(x, (407, 433), interpolation=cv2.INTER_CUBIC)
    got = resize_bicubic_banded(jnp.asarray(x), 433, 407, bands=5)
    np.testing.assert_allclose(got, ref, atol=2e-4)
    # crop + uint8 fused
    xp = np.pad(x, ((0, 40), (0, 24), (0, 0)))
    got2 = resize_bicubic_banded(
        jnp.asarray(xp), 433, 407, bands=5, crop_h=600, crop_w=500, to_uint8=True
    )
    ref2 = np.clip(np.round(ref), 0, 255).astype(np.uint8)
    assert np.abs(got2.astype(int) - ref2.astype(int)).max() <= 1
    # upscale direction + bands > rows edge case
    ref3 = cv2.resize(x[:100, :100], (260, 240), interpolation=cv2.INTER_CUBIC)
    got3 = resize_bicubic_banded(jnp.asarray(x[:100, :100]), 240, 260, bands=4)
    np.testing.assert_allclose(got3, ref3, atol=2e-4)
