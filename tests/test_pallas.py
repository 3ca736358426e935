"""Pallas kernel tests (interpret mode on CPU; cv2 is the oracle)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from srs_tpu.ops.pallas.pyramid_pallas import pyr_down_fused, pyr_down_pallas

ULP = 5e-7


@pytest.mark.parametrize("shape", [(4, 64, 128), (2, 63, 129), (1, 32, 256)])
def test_pyr_down_pallas_matches_cv2(rng, shape):
    x = rng.random(shape, dtype=np.float32)
    got = np.asarray(pyr_down_pallas(jnp.asarray(x), interpret=True))
    ref = np.stack([cv2.pyrDown(p) for p in x])
    np.testing.assert_allclose(got, ref, atol=ULP, rtol=0)


def test_pyr_down_fused_channels(rng):
    img = rng.random((2, 63, 129, 3), dtype=np.float32)
    got = np.asarray(pyr_down_fused(jnp.asarray(img), interpret=True))
    ref = np.stack([cv2.pyrDown(p) for p in img])
    np.testing.assert_allclose(got, ref, atol=ULP, rtol=0)


def test_pyr_down_fused_large_falls_back(rng):
    # plane over the VMEM budget routes through the XLA path
    img = rng.random((1, 2048, 2048, 1), dtype=np.float32)
    got = np.asarray(pyr_down_fused(jnp.asarray(img)))
    assert got.shape == (1, 1024, 1024, 1)
    np.testing.assert_allclose(got[0, ..., 0], cv2.pyrDown(img[0, ..., 0]), atol=ULP)
