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
