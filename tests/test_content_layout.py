"""Content-aware seam placement tests: crossovers avoid forbidden zones,
weights stay an exact partition of unity, reconstruction exact."""

import jax.numpy as jnp
import numpy as np

from srs_tpu.ops.tiles import extract_tiles, merge_tiles, pad_image, unpad_image
from srs_tpu.tiling.content_layout import (
    choose_crossovers,
    content_aware_weights,
    seam_cost,
)
from srs_tpu.tiling.geometry import compute_layout


def _layout():
    # 2x2 grid: block 256, ratio 0.3 -> step 160, overlap 96
    return compute_layout(416, 416, 256, 0.3, step_multiple=32)


def test_crossover_moves_off_forbidden_stripe():
    lo = _layout()
    zone = np.zeros((lo.padded_h, lo.padded_w), bool)
    nominal = lo.step + lo.overlap // 2  # 208
    zone[nominal - 10 : nominal + 10, :] = True
    rows = choose_crossovers(lo, zone, 0)
    assert len(rows) == 1
    assert seam_cost(zone, 0, rows[0]) < seam_cost(zone, 0, nominal)
    # clear zone keeps the nominal center
    rows_clear = choose_crossovers(lo, np.zeros_like(zone), 0)
    assert rows_clear[0] == nominal


def test_weights_partition_of_unity():
    lo = _layout()
    zone = np.zeros((lo.padded_h, lo.padded_w), bool)
    zone[190:230, :] = True
    w = content_aware_weights(lo, zone)
    # accumulate onto the canvas: must sum to exactly 1 everywhere
    total = np.zeros((lo.padded_h, lo.padded_w), np.float32)
    for t in range(lo.num_tiles):
        y, x = lo.positions[t]
        total[y : y + lo.block, x : x + lo.block] += w[t]
    np.testing.assert_allclose(total, 1.0, atol=1e-6)


def test_reconstruction_exact_with_content_weights(rng):
    lo = _layout()
    img = rng.random((lo.image_h, lo.image_w, 3), dtype=np.float32)
    zone = np.zeros((lo.padded_h, lo.padded_w), bool)
    zone[200:240, :] = True
    zone[:, 180:220] = True
    w = content_aware_weights(lo, zone)
    padded = pad_image(jnp.asarray(img), lo)
    tiles = extract_tiles(padded, lo)
    canvas = merge_tiles(tiles, jnp.asarray(w), lo)
    out = np.asarray(unpad_image(canvas, lo))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_weights_zero_beyond_crossover():
    # the seam weight must vanish past the crossover + feather
    lo = _layout()
    zone = np.zeros((lo.padded_h, lo.padded_w), bool)
    w = content_aware_weights(lo, zone, feather=16)
    tile0 = w[0]  # top-left: its bottom ramp ends at crossover + 8
    nominal = lo.step + lo.overlap // 2
    assert tile0[nominal + 12, 10] == 0.0
    assert tile0[nominal - 12, 10] == 1.0
