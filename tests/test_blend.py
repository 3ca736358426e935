"""Blend / seam / color tests.

Models the reference's example-as-tests (blending_module.py:1763-2298):
procedurally generated overlapping gradient tiles, fusion correctness by
construction, seam detection on a deliberately hard seam, repair, color
correction, and the full 7-step flow."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.fft import dct

from srs_tpu.blending import (
    BlendingModule,
    FusionMethod,
    PoissonMode,
    TileInfo,
    WeightType,
    compute_blend_quality,
    create_tile_grid,
)
from srs_tpu.ops import blend as B
from srs_tpu.ops.seam import Seam, windowed_ssim_map
from srs_tpu.ops.weights import layout_weights
from srs_tpu.tiling.geometry import compute_layout


def _make_grid_tiles(rng, block=64, overlap=16, n=2, noise=0.0):
    """2x2 overlapping tiles cut from one smooth gradient image."""
    step = block - overlap
    size = (n - 1) * step + block
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    base = np.stack(
        [
            127 + 100 * np.sin(xx / 17),
            127 + 100 * np.cos(yy / 23),
            127 + 100 * np.sin((xx + yy) / 29),
        ],
        -1,
    ).astype(np.float32)
    infos = []
    for r in range(n):
        for c in range(n):
            y, x = r * step, c * step
            img = base[y : y + block, x : x + block].copy()
            if noise:
                img = np.clip(img + rng.normal(0, noise, img.shape), 0, 255).astype(np.float32)
            infos.append(TileInfo(img, x, y, r, c))
    return base, infos


def test_laplacian_fusion_reconstructs_smooth_image(rng):
    base, infos = _make_grid_tiles(rng)
    bm = BlendingModule()
    out = bm.laplacian_fusion(infos, output_shape=base.shape[:2])
    assert out.shape == base.shape
    err = np.abs(out - base)
    # interior must be near-exact; borders feathered
    assert err[8:-8, 8:-8].max() < 2.0


def test_weighted_and_feather_fusion(rng):
    base, infos = _make_grid_tiles(rng)
    bm = BlendingModule()
    for fn in (bm.weighted_average_fusion, bm.feather_blend):
        out = fn(infos, output_shape=base.shape[:2])
        assert np.abs(out[8:-8, 8:-8] - base[8:-8, 8:-8]).max() < 2.0


def test_gradient_domain_fusion(rng):
    base, infos = _make_grid_tiles(rng)
    bm = BlendingModule()
    out = bm.gradient_domain_fusion(infos, output_shape=base.shape[:2])
    # spectral Poisson reconstruction: matches up to small numerical error
    assert np.abs(out[4:-4, 4:-4] - base[4:-4, 4:-4]).mean() < 2.0


def test_fusion_suppresses_brightness_seam(rng):
    # brighten one tile; fused seam must be smoother than naive paste
    base, infos = _make_grid_tiles(rng)
    infos[1].image = np.clip(infos[1].image + 30, 0, 255)
    bm = BlendingModule()
    fused = bm.laplacian_fusion(infos, output_shape=base.shape[:2])
    naive = base.copy()
    naive[infos[1].y : infos[1].y + 64, infos[1].x : infos[1].x + 64] = infos[1].image
    # horizontal jump across the seam column x=48 (tile boundary)
    def seam_jump(img):
        return np.abs(np.diff(img[:, 44:54, 0], axis=1)).max()

    assert seam_jump(fused) < seam_jump(naive)


def test_dct_matches_scipy(rng):
    # one even + one odd size covers both DCT padding paths; each size is
    # a fresh XLA compile, which dominates this test's wall time on CPU
    for n in (7, 8):
        x = rng.random((n, 5), dtype=np.float32)
        ref = dct(np.asarray(x, np.float64), type=2, axis=0)
        got = np.asarray(B._dct2(jnp.asarray(x), 0))
        np.testing.assert_allclose(got, ref, atol=2e-5)
        rt = np.asarray(B._idct2(B._dct2(jnp.asarray(x), 0), 0))
        np.testing.assert_allclose(rt, x, atol=1e-5)


def test_poisson_solver_inverts_laplacian(rng):
    u = rng.random((32, 40), dtype=np.float32)
    ux = np.diff(u, axis=1, append=u[:, -1:])
    uy = np.diff(u, axis=0, append=u[-1:])
    div = (
        ux - np.concatenate([np.zeros_like(ux[:, :1]), ux[:, :-1]], axis=1)
        + uy - np.concatenate([np.zeros_like(uy[:1]), uy[:-1]], axis=0)
    )
    sol = np.asarray(B.poisson_solve_neumann(jnp.asarray(div)))
    sol = sol - sol.mean() + u.mean()
    np.testing.assert_allclose(sol, u, atol=1e-4)


def _clone_fixture(rng):
    dst = np.full((64, 64, 3), 50.0, np.float32)
    src = np.full((64, 64, 3), 200.0, np.float32)
    src[20:40, 20:40] += rng.normal(0, 5, (20, 20, 3))
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1
    return dst, src, mask


def _check_clone(out):
    # boundary clamped to dst
    np.testing.assert_allclose(out[15, :, :], 50.0, atol=1e-3)
    # interior texture preserved (gradients), base level adapted to dst
    assert out[24:40, 24:40].std() > 1.0
    assert out[30, 30, 0] < 150  # level pulled toward dst


def test_seamless_clone_normal(rng):
    dst, src, mask = _clone_fixture(rng)
    _check_clone(BlendingModule().poisson_fusion(dst, src, mask, PoissonMode.NORMAL))


@pytest.mark.slow
def test_seamless_clone_mixed_monochrome(rng):
    # each mode is its own solver program (~2 s CPU compile apiece); NORMAL
    # guards the path in the default run
    dst, src, mask = _clone_fixture(rng)
    bm = BlendingModule()
    for mode in (PoissonMode.MIXED, PoissonMode.MONOCHROME):
        _check_clone(bm.poisson_fusion(dst, src, mask, mode))


def test_seam_detection_on_constructed_seam(rng):
    base, infos = _make_grid_tiles(rng)
    bm = BlendingModule()
    fused = bm.laplacian_fusion(infos, output_shape=base.shape[:2])
    clean_seams = bm.detect_seams(fused, infos)
    # corrupt a region -> seams appear there
    corrupted = fused.copy()
    corrupted[40:56, 40:56] = 255 - corrupted[40:56, 40:56]
    seams = bm.detect_seams(corrupted, infos)
    assert len(seams) > len(clean_seams)
    assert any(abs(s.x - 40) < 24 and abs(s.y - 40) < 24 for s in seams)


def test_seam_severity_and_repair(rng):
    base, infos = _make_grid_tiles(rng)
    bm = BlendingModule()
    fused = bm.laplacian_fusion(infos, output_shape=base.shape[:2])
    s_high = Seam(10, 10, 16, 16, 0.5)
    s_med = Seam(40, 40, 16, 16, 0.9)
    assert s_high.severity == "high" and s_high.repair_method == "poisson_refinement"
    assert s_med.severity == "medium" and s_med.repair_method == "increase_blend_width"
    corrupted = np.asarray(fused).copy()
    corrupted[8:24, 8:24] += rng.normal(0, 60, (16, 16, 3)).astype(np.float32)
    corrupted = np.clip(corrupted, 0, 255)
    repaired = bm.repair_seams(corrupted, [s_high], infos)
    err_before = np.abs(corrupted[8:24, 8:24] - base[8:24, 8:24]).mean()
    err_after = np.abs(repaired[8:24, 8:24] - base[8:24, 8:24]).mean()
    assert err_after < err_before


def test_windowed_ssim_map_shape(rng):
    a = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32) * 255)
    m = np.asarray(windowed_ssim_map(a, a))
    assert m.shape == (2, 7, 7)
    np.testing.assert_allclose(m, 1.0, atol=1e-4)


def test_color_correction_methods(rng):
    ref = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    shifted = np.clip(ref * 0.8 + 30, 0, 255).astype(np.float32)
    bm = BlendingModule()
    for method in ("histogram", "mean_std"):
        out = bm.color_correction(shifted, ref, method=method, local_filter=False)
        assert abs(out.mean() - ref.mean()) < abs(shifted.mean() - ref.mean())
    out = bm.color_correction(shifted, ref, method="none")
    np.testing.assert_allclose(out, shifted)


def test_histogram_matching_oracle():
    # independent numpy oracle of the reference LUT rule; private rng —
    # the tie-break tolerance below is sensitive to the exact draw, so it
    # must not float with the shared session stream
    from srs_tpu.ops.color import histogram_matching

    r = np.random.default_rng(1234)
    src = (r.random((48, 48)) * 255).astype(np.float32)
    ref = (r.random((48, 48)) * 127 + 64).astype(np.float32)
    src_hist, _ = np.histogram(src.astype(np.uint8).flatten(), 256, [0, 256])
    ref_hist, _ = np.histogram(ref.astype(np.uint8).flatten(), 256, [0, 256])
    scdf = src_hist.cumsum() / src_hist.sum() * 255
    rcdf = ref_hist.cumsum() / ref_hist.sum() * 255
    lut = np.array([np.argmin(np.abs(rcdf - scdf[i])) for i in range(256)])
    expected = lut[src.astype(np.uint8)]
    got = np.asarray(histogram_matching(jnp.asarray(src), jnp.asarray(ref)))
    # identical up to float32-vs-float64 argmin tie-breaks on equal CDF runs
    assert np.mean(got == expected) > 0.98
    assert np.abs(got - expected).max() <= 3


def test_guided_filter_edge_preserving(rng):
    from srs_tpu.ops.color import guided_filter

    edge = np.zeros((64, 64), np.float32)
    edge[:, 32:] = 200.0
    noisy = edge + rng.normal(0, 10, edge.shape).astype(np.float32)
    out = np.asarray(guided_filter(jnp.asarray(noisy), jnp.asarray(noisy), radius=8, eps=100.0))
    # noise suppressed on flats, edge preserved
    assert out[:, :16].std() < noisy[:, :16].std()
    assert abs(out[:, 40:].mean() - 200) < 15


def test_create_tile_grid_and_quality(rng):
    base, infos = _make_grid_tiles(rng)
    imgs = [i.image for i in infos]
    tile_infos, regions = create_tile_grid(imgs, (2, 2), overlap=16)
    assert len(tile_infos) == 4
    assert len(regions) == 4  # 2 horizontal + 2 vertical adjacencies
    assert {r.direction for r in regions} == {"horizontal", "vertical"}
    bm = BlendingModule()
    fused = bm.laplacian_fusion(infos, output_shape=base.shape[:2])
    q = compute_blend_quality(fused, imgs, [(i.y, i.x) for i in infos])
    assert q["mean_ssim"] > 0.9
    assert q["min_ssim"] <= q["mean_ssim"]
    assert "gradient_discontinuity" in q


def test_visualize_seams():
    img = np.zeros((64, 64, 3), np.float32)
    bm = BlendingModule()
    out = bm.visualize_seams(img, [Seam(10, 10, 16, 16, 0.5)])
    assert tuple(out[10, 12]) == (255, 0, 0)  # high severity -> red


def test_profile_blend_matches_dense(rng):
    """HBM-lean separable-profile path == dense canvas path."""
    from srs_tpu.ops import blend as B2
    from srs_tpu.ops.tiles import extract_tiles, pad_image
    from srs_tpu.ops.weights import layout_weight_profiles, layout_weights
    from srs_tpu.tiling.geometry import compute_layout

    # levels=3 / block 64: the separable-profile == dense-weight identity
    # is per-level; level 4+ only adds CPU compile time
    lo = compute_layout(200, 150, 64, 0.25, step_multiple=16)
    img = rng.random((150, 200, 3), dtype=np.float32) * 255
    tiles = extract_tiles(pad_image(jnp.asarray(img), lo), lo)
    dense = B2.laplacian_fusion_tiles(
        tiles, layout_weights(lo, kind="ramp"), lo, levels=3
    )
    prof = B2.laplacian_fusion_tiles(
        jnp.array(tiles), None, lo, levels=3,
        weight_profiles=layout_weight_profiles(lo),
    )
    np.testing.assert_allclose(np.asarray(prof), np.asarray(dense), atol=2e-4)


def test_multigrid_clone_converges_where_jacobi_stalls(rng):
    """Large-mask Poisson editing: fixed-sweep Jacobi cannot propagate the
    boundary offset to the interior; multigrid V-cycles can."""
    from srs_tpu.ops.blend import seamless_clone, seamless_clone_multigrid

    dst = np.full((128, 128, 3), 40.0, np.float32)
    yy, xx = np.mgrid[0:128, 0:128].astype(np.float32)
    src = (180 + 30 * np.sin(xx / 7))[..., None].repeat(3, -1).astype(np.float32)
    mask = np.zeros((128, 128), np.float32)
    mask[8:120, 8:120] = 1
    uj = np.asarray(seamless_clone(jnp.asarray(dst), jnp.asarray(src), jnp.asarray(mask), iters=100))
    um = np.asarray(seamless_clone_multigrid(jnp.asarray(dst), jnp.asarray(src), jnp.asarray(mask)))
    # boundary respected by both
    np.testing.assert_allclose(um[5, :, 0], 40.0, atol=1e-3)
    # interior level: multigrid must pull the center toward dst's level
    center_shift_j = src[64, 64, 0] - uj[64, 64, 0]
    center_shift_m = src[64, 64, 0] - um[64, 64, 0]
    assert center_shift_m > center_shift_j + 30
    # texture (gradients) preserved
    assert abs(um[40:80, 40:80, 0].std() - src[40:80, 40:80, 0].std()) < 3
