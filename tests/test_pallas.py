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


def test_pyr_down_dispatch_flag(rng, monkeypatch):
    """pyr_down routes through the Pallas kernel when the flag is on AND
    the backend is TPU; the XLA path otherwise."""
    from srs_tpu.ops import pyramid as P

    calls = []
    monkeypatch.setattr(
        "srs_tpu.ops.pallas.pyramid_pallas.pyr_down_fused",
        lambda x: calls.append(1) or P._pyr_down_xla(x),
    )
    img = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    try:
        P.set_pallas_pyrdown(True)
        _ = P.pyr_down(img)
        assert not calls  # CPU backend: flag alone must not engage it
        monkeypatch.setattr(P.jax, "default_backend", lambda: "tpu")
        _ = P.pyr_down(img)
        assert calls  # TPU backend + flag: kernel path taken
    finally:
        P.set_pallas_pyrdown(False)


def test_pyr_up_fused_matches_cv2(rng):
    """MXU interpolation-matmul pyrUp: 1-2 ulp vs cv2, even + odd dst."""
    from srs_tpu.ops.pallas.pyramid_pallas import pyr_up_fused

    for (h, w), dst in [((64, 48), None), ((64, 48), (127, 95)), ((33, 57), (65, 113))]:
        img = rng.random((1, h, w, 3), dtype=np.float32) * 255
        got = np.asarray(pyr_up_fused(jnp.asarray(img), dst_hw=dst, interpret=True))
        dh, dw = dst if dst else (2 * h, 2 * w)
        ref = np.stack(
            [cv2.pyrUp(img[0, ..., c], dstsize=(dw, dh)) for c in range(3)], -1
        )[None]
        np.testing.assert_allclose(got, ref, atol=5e-5)


def test_pyr_up_fused_large_falls_back(rng):
    from srs_tpu.ops.pallas.pyramid_pallas import pyr_up_fused

    img = rng.random((1, 1024, 1024, 1), dtype=np.float32) * 255
    got = np.asarray(pyr_up_fused(jnp.asarray(img)))
    assert got.shape == (1, 2048, 2048, 1)
    np.testing.assert_allclose(got[0, ..., 0], cv2.pyrUp(img[0, ..., 0]), atol=1e-4)


def test_pyr_up_dispatch_flag(rng, monkeypatch):
    from srs_tpu.ops import pyramid as P

    calls = []
    monkeypatch.setattr(
        "srs_tpu.ops.pallas.pyramid_pallas.pyr_up_fused",
        lambda x, dst_hw=None: calls.append(1) or P._pyr_up_xla(x, dst_hw),
    )
    img = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    try:
        P.set_pallas_pyrdown(True)
        _ = P.pyr_up(img)
        assert not calls  # CPU backend: flag alone must not engage it
        monkeypatch.setattr(P.jax, "default_backend", lambda: "tpu")
        _ = P.pyr_up(img)
        assert calls
    finally:
        P.set_pallas_pyrdown(False)
