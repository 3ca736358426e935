"""Tile extract / merge round-trip tests.

Models the reference's split->merge assertions (tiling_module.py:1224-1358):
extraction geometry, padding modes, and the weighted merge reconstructing
the source exactly (partition-of-unity ramp weights).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srs_tpu.ops.tiles import extract_tiles, merge_tiles, pad_image, unpad_image
from srs_tpu.ops.weights import layout_weights, distance_weight_map, overlap_ramp_weight
from srs_tpu.tiling.geometry import compute_layout


def _roundtrip(rng, w, h, block, ratio, kind="ramp"):
    lo = compute_layout(w, h, block, ratio)
    img = rng.random((h, w, 3), dtype=np.float32)
    padded = pad_image(jnp.asarray(img), lo)
    assert padded.shape == (lo.padded_h, lo.padded_w, 3)
    tiles = extract_tiles(padded, lo)
    assert tiles.shape == (lo.num_tiles, lo.block, lo.block, 3)
    weights = layout_weights(lo, kind=kind)
    canvas = merge_tiles(tiles, weights, lo)
    out = np.asarray(unpad_image(canvas, lo))
    return img, out


@pytest.mark.parametrize("w,h,block,ratio", [(300, 200, 128, 0.2), (256, 256, 128, 0.25), (100, 80, 256, 0.2)])
def test_split_merge_identity_ramp(rng, w, h, block, ratio):
    img, out = _roundtrip(rng, w, h, block, ratio, kind="ramp")
    np.testing.assert_allclose(out, img, atol=1e-5, rtol=0)


def test_split_merge_identity_distance(rng):
    # distance weights are not a partition of unity but merge normalizes
    img, out = _roundtrip(rng, 300, 200, 128, 0.2, kind="distance")
    np.testing.assert_allclose(out, img, atol=1e-4, rtol=0)


def test_extract_tile_content(rng):
    lo = compute_layout(300, 200, 128, 0.2)
    img = rng.random((200, 300, 3), dtype=np.float32)
    padded = pad_image(jnp.asarray(img), lo)
    tiles = np.asarray(extract_tiles(padded, lo))
    p = np.asarray(padded)
    for t in [0, lo.num_tiles // 2, lo.num_tiles - 1]:
        y, x = lo.positions[t]
        np.testing.assert_array_equal(tiles[t], p[y : y + lo.block, x : x + lo.block])


def test_mirror_padding_semantics(rng):
    # mirror = REFLECT_101: edge pixel not repeated
    lo = compute_layout(5, 5, 8, 0.2)  # single tile, pads 5->8
    img = np.arange(25, dtype=np.float32).reshape(5, 5)[..., None].repeat(3, -1)
    padded = np.asarray(pad_image(jnp.asarray(img), lo, mode="mirror"))
    # row 5 should mirror row 3 (not row 4)
    np.testing.assert_array_equal(padded[5], np.pad(img, ((0,0),(0,3),(0,0)), mode="reflect")[3])


def test_replicate_padding(rng):
    lo = compute_layout(5, 5, 8, 0.2)
    img = rng.random((5, 5, 3), dtype=np.float32)
    padded = np.asarray(pad_image(jnp.asarray(img), lo, mode="replicate"))
    np.testing.assert_array_equal(padded[7], padded[4])


def test_weight_maps_match_reference_formulas():
    # cosine distance map formula (blending_module.py:553-554)
    w = distance_weight_map(64, 64, "cosine", feather_width=8)
    d = np.minimum.reduce(
        [
            np.arange(64, dtype=np.float32)[:, None] + np.zeros((1, 64), np.float32),
            (63 - np.arange(64, dtype=np.float32))[:, None] + np.zeros((1, 64), np.float32),
            np.arange(64, dtype=np.float32)[None, :] + np.zeros((64, 1), np.float32),
            (63 - np.arange(64, dtype=np.float32))[None, :] + np.zeros((64, 1), np.float32),
        ]
    )
    t = np.clip(d / 8, 0, 1)
    np.testing.assert_allclose(w, 0.5 * (1 - np.cos(np.pi * t)), atol=1e-6)
    # ramp weights: interior tile partition-of-unity along overlap with step
    ramp = overlap_ramp_weight(32, 32, 8, 8, 0, 0)
    assert ramp[0, 16] == 0.0 and ramp[16, 16] == 1.0


def test_merge_normalizes_weight_sum(rng):
    # two identical tiles fully overlapping -> output equals tile
    lo = compute_layout(8, 8, 8, 0.2)
    tile = rng.random((1, 8, 8, 3), dtype=np.float32)
    tiles = jnp.concatenate([jnp.asarray(tile)] * 2, axis=0)
    pos = jnp.zeros((2, 2), jnp.int32)
    w = jnp.ones((2, 8, 8), jnp.float32)
    canvas = merge_tiles(tiles, w, lo, positions=pos)
    np.testing.assert_allclose(np.asarray(canvas), tile[0], atol=1e-6)
