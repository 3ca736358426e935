"""Tile geometry tests.

Models the reference's embedded tiling asserts (tiling_module.py:1224-1358
`run_tests`): grid counts vs ceil formula, per-tile overlap metadata,
neighbor graph, plus the new static-full-block invariants.
"""

import math

import numpy as np
import pytest

from srs_tpu.tiling import geometry as G


def test_grid_counts_parity():
    # parity with reference formula: ceil((dim - overlap) / step)
    layout = G.compute_layout(4096, 4096, 1024, 0.2)
    overlap = int(1024 * 0.2)
    step = 1024 - overlap
    exp = math.ceil((4096 - overlap) / step)
    assert layout.nx == exp and layout.ny == exp
    assert layout.num_tiles == exp * exp


def test_padded_extent_covers_image():
    for w, h, b, r in [(1280, 720, 512, 0.2), (4096, 4096, 1024, 0.1), (333, 777, 256, 0.3)]:
        lo = G.compute_layout(w, h, b, r)
        assert lo.padded_w >= w and lo.padded_h >= h
        assert lo.padded_w == (lo.nx - 1) * lo.step + lo.block
        # last tile ends exactly at padded extent
        last = lo.positions[-1]
        assert last[0] + lo.block == lo.padded_h
        assert last[1] + lo.block == lo.padded_w


def test_single_tile_degenerate():
    lo = G.compute_layout(100, 80, 256, 0.2)
    assert lo.num_tiles == 1
    assert (lo.overlaps == 0).all()
    assert (lo.neighbors == -1).all()


def test_overlaps_zero_on_borders():
    lo = G.compute_layout(4096, 4096, 1024, 0.2)
    for t in range(lo.num_tiles):
        r, c = divmod(t, lo.nx)
        top, bottom, left, right = lo.overlaps[t]
        assert (top == 0) == (r == 0)
        assert (left == 0) == (c == 0)
        assert (bottom == 0) == (r == lo.ny - 1)
        assert (right == 0) == (c == lo.nx - 1)
        if top:
            assert top == lo.overlap


def test_neighbor_graph():
    lo = G.compute_layout(4096, 4096, 1024, 0.2)
    n = lo.neighbors
    # interior tile has 8 neighbors; corner has 3
    interior = lo.nx + 1  # row 1 col 1
    assert (n[interior] >= 0).sum() == 8
    assert (n[0] >= 0).sum() == 3
    # N neighbor of tile (1,1) is (0,1)
    assert n[interior][0] == 1


def test_reference_positions_parity():
    # against hand-computed reference semantics
    pos = G.reference_positions(2000, 1500, 1024, 0.2)
    overlap = int(1024 * 0.2)
    step = 1024 - overlap
    nx = math.ceil((2000 - overlap) / step)
    ny = math.ceil((1500 - overlap) / step)
    assert len(pos) == nx * ny
    x, y, w, h = pos[-1]
    assert x == (nx - 1) * step and y == (ny - 1) * step
    assert w == min(1024, 2000 - x) and h == min(1024, 1500 - y)


def test_overlap_for_tile_reference_edge_adjustment():
    # edge tile: reference clamps overlap to remaining pixels
    block, ratio = 1024, 0.2
    overlap = int(block * ratio)
    pos = G.reference_positions(2000, 1500, block, ratio)
    for (x, y, w, h) in pos:
        t, b, l, r = G.overlap_for_tile(x, y, w, h, 2000, 1500, block, ratio)
        assert t in (0, overlap)
        assert l in (0, overlap)
        assert b >= 0 and r >= 0


def test_scaled_layout():
    lo = G.compute_layout(1280, 720, 512, 0.2)
    s = lo.scaled(4)
    assert s.block == lo.block * 4
    assert s.padded_w == lo.padded_w * 4
    assert (s.positions == lo.positions * 4).all()
    assert (s.neighbors == lo.neighbors).all()


def test_invalid_overlap_raises():
    with pytest.raises(ValueError):
        G.compute_layout(100, 100, 8, 1.0)
