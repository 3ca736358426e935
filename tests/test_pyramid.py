"""Golden tests: pyramid kernels vs OpenCV (bit-level parity target).

This is the parity harness demanded by BASELINE.md ("bit-level
Laplacian-pyramid-blend parity vs CPU reference"); cv2 is the oracle.
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from srs_tpu.ops import pyramid as P

ULP = 5e-7  # a few float32 ulps at magnitude ~1


@pytest.mark.parametrize(
    "shape", [(64, 64, 3), (65, 63, 3), (7, 9, 1), (33, 2, 3), (256, 192, 3)]
)
def test_pyr_down_matches_cv2(rng, shape):
    x = rng.random(shape, dtype=np.float32)
    ref = cv2.pyrDown(x)
    if ref.ndim == 2:
        ref = ref[..., None]
    got = np.asarray(P.pyr_down(jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=ULP, rtol=0)


@pytest.mark.parametrize("shape", [(32, 32, 3), (17, 23, 3), (5, 6, 1), (31, 2, 3)])
def test_pyr_up_matches_cv2(rng, shape):
    x = rng.random(shape, dtype=np.float32)
    ref = cv2.pyrUp(x)
    if ref.ndim == 2:
        ref = ref[..., None]
    got = np.asarray(P.pyr_up(jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=ULP, rtol=0)


@pytest.mark.parametrize(
    "sshape,dst",
    [((9, 7, 3), (17, 13)), ((8, 7, 3), (16, 13)), ((9, 9, 3), (17, 18)), ((6, 8, 3), (11, 16))],
)
def test_pyr_up_odd_dst_matches_cv2(rng, sshape, dst):
    s = rng.random(sshape, dtype=np.float32)
    ref = cv2.pyrUp(s, dstsize=(dst[1], dst[0]))
    got = np.asarray(P.pyr_up(jnp.asarray(s), dst))
    np.testing.assert_allclose(got, ref, atol=ULP, rtol=0)


def test_laplacian_levels_match_cv2(rng):
    # 4 levels reach odd dstsize rounding by level 2 (123 -> 62 -> 31 -> 16);
    # deeper levels only add CPU compiles
    x = rng.random((123, 97, 3), dtype=np.float32)
    jl = P.build_laplacian_pyramid(jnp.asarray(x), 4)
    g = [x]
    for _ in range(len(jl) - 1):
        g.append(cv2.pyrDown(g[-1]))
    for i in range(len(jl) - 1):
        ref = g[i] - cv2.pyrUp(g[i + 1], dstsize=(g[i].shape[1], g[i].shape[0]))
        np.testing.assert_allclose(np.asarray(jl[i]), ref, atol=ULP, rtol=0)
    np.testing.assert_allclose(np.asarray(jl[-1]), g[-1], atol=ULP, rtol=0)


def test_laplacian_collapse_roundtrip(rng):
    x = rng.random((100, 120, 3), dtype=np.float32)
    lap = P.build_laplacian_pyramid(jnp.asarray(x), 4)
    rec = np.asarray(P.collapse_laplacian_pyramid(lap))
    np.testing.assert_allclose(rec, x, atol=1e-6, rtol=0)


def test_gaussian_pyramid_stops_below_2px(rng):
    x = rng.random((16, 16, 3), dtype=np.float32)
    pyr = P.build_gaussian_pyramid(jnp.asarray(x), 10)
    assert min(pyr[-1].shape[:2]) >= 2
    # 16 -> 8 -> 4 -> 2, stop
    assert len(pyr) == 4


def test_batched_pyramid(rng):
    # leading batch dim is supported (tile batches)
    x = rng.random((4, 32, 32, 3), dtype=np.float32)
    d = np.asarray(P.pyr_down(jnp.asarray(x)))
    assert d.shape == (4, 16, 16, 3)
    for i in range(4):
        np.testing.assert_allclose(d[i], cv2.pyrDown(x[i]), atol=ULP, rtol=0)
