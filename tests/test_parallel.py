"""Mesh / sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from srs_tpu.ops.tiles import extract_tiles, merge_tiles, pad_image
from srs_tpu.ops.weights import layout_weights
from srs_tpu.parallel.dispatch import MeshTileDispatcher
from srs_tpu.parallel.halo import sharded_weighted_merge
from srs_tpu.parallel.mesh import make_mesh, spatial_sharding
from srs_tpu.tiling.geometry import compute_layout


def test_make_mesh_shapes(eight_devices):
    m = make_mesh()
    assert m.shape == {"data": 8}
    m2 = make_mesh({"data": 4, "space": 2})
    assert m2.shape == {"data": 4, "space": 2}
    m3 = make_mesh({"data": -1, "space": 2})
    assert m3.shape == {"data": 4, "space": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 16})
    with pytest.raises(ValueError):
        make_mesh({"data": -1, "space": -1})


def test_halo_merge_matches_single_device(rng):
    # canvas sharded over 8-way space axis; ny=8 tile rows
    mesh = make_mesh({"space": 8})
    block, ratio = 64, 0.25
    lo = compute_layout(300, 8 * 48 + 16, block, ratio)  # ny = 8
    assert lo.ny == 8, lo.ny
    img = rng.random((lo.image_h, lo.image_w, 3), dtype=np.float32)
    tiles = extract_tiles(pad_image(jnp.asarray(img), lo), lo)
    weights = jnp.asarray(layout_weights(lo, kind="ramp"))
    ref = np.asarray(merge_tiles(tiles, weights, lo))
    got = np.asarray(sharded_weighted_merge(tiles, weights, lo, mesh))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_halo_merge_requires_divisible_rows(rng):
    mesh = make_mesh({"space": 8})
    lo = compute_layout(100, 100, 64, 0.25)  # ny = 2
    tiles = jnp.zeros((lo.num_tiles, lo.block, lo.block, 3))
    w = jnp.ones((lo.num_tiles, lo.block, lo.block))
    with pytest.raises(ValueError):
        sharded_weighted_merge(tiles, w, lo, mesh)


def test_dispatcher_run_tiled(rng):
    disp = MeshTileDispatcher(make_mesh({"data": 8}))
    tiles = jnp.asarray(rng.random((12, 32, 32, 3), dtype=np.float32))  # 12 % 8 != 0
    out = disp.run_tiled(lambda x: x * 2.0, tiles, key="double")
    assert out.shape == tiles.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(tiles) * 2.0, atol=1e-6)


def test_dispatcher_merge_fallback(rng):
    disp = MeshTileDispatcher(make_mesh({"data": 8}))
    lo = compute_layout(200, 150, 64, 0.25)
    img = rng.random((150, 200, 3), dtype=np.float32)
    tiles = extract_tiles(pad_image(jnp.asarray(img), lo), lo)
    w = layout_weights(lo, kind="ramp")
    out = disp.merge(tiles, jnp.asarray(w), lo)
    ref = merge_tiles(tiles, w, lo)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_sharded_training_step(rng):
    """Full train step sharded dp x sp over the mesh — the dryrun core."""
    from srs_tpu.models.nets import ESPCN
    from srs_tpu.models.train import make_optimizer, train_step

    mesh = make_mesh({"data": 4, "space": 2})
    model = ESPCN(scale=2, features=8)
    lr_b = jnp.asarray(rng.random((8, 16, 16, 3), dtype=np.float32) * 255)
    hr_b = jnp.asarray(rng.random((8, 32, 32, 3), dtype=np.float32) * 255)
    params = model.init(jax.random.PRNGKey(0), lr_b[:1])
    tx = make_optimizer(1e-3)
    opt_state = tx.init(params)
    shard = spatial_sharding(mesh)
    lr_b = jax.device_put(lr_b, shard)
    hr_b = jax.device_put(hr_b, NamedSharding(mesh, P("data", "space", None, None)))
    params2, opt2, metrics = train_step(model.apply, params, opt_state, tx, lr_b, hr_b)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_sharded_laplacian_blend_small_parity(rng):
    """Default-run guard for the sharded blend: one small S=2 case (the
    exhaustive S/shape sweep is the `slow`-marked test below)."""
    from srs_tpu.ops import blend as B
    from srs_tpu.ops.weights import layout_weight_profiles
    from srs_tpu.parallel.halo import sharded_laplacian_blend

    # levels=2 still exercises the per-level spill ppermutes AND the
    # collapse halo exchange; deeper pyramids/meshes are the slow sweep
    mesh = make_mesh({"space": 2})
    lo = compute_layout(96, 2 * 48 + 16, 64, 0.25, step_multiple=16)
    assert lo.ny % 2 == 0
    img = rng.random((lo.image_h, lo.image_w, 3), dtype=np.float32) * 255
    tiles = extract_tiles(pad_image(jnp.asarray(img), lo), lo)
    prof = layout_weight_profiles(lo)
    ref = np.asarray(
        B.laplacian_fusion_tiles(
            jnp.array(tiles), None, lo, levels=2,
            weight_profiles=prof, clip_range=None,
        )
    )
    got = np.asarray(sharded_laplacian_blend(tiles, *prof, lo, mesh, levels=2))
    np.testing.assert_allclose(got, ref[: got.shape[0]], atol=2e-4)


@pytest.mark.slow
def test_sharded_laplacian_blend_matches_single_device(rng):
    """The full multi-chip blend (SURVEY config[4]): per-level spill
    ppermutes + collapse halo exchange == single-device canvas pyramid."""
    from srs_tpu.ops import blend as B
    from srs_tpu.ops.weights import layout_weight_profiles
    from srs_tpu.parallel.halo import sharded_laplacian_blend

    for S in (2, 8):
        mesh = make_mesh({"space": S})
        lo = compute_layout(300, 8 * 96 + 32, 128, 0.25, step_multiple=32)
        assert lo.ny % S == 0
        img = rng.random((lo.image_h, lo.image_w, 3), dtype=np.float32) * 255
        tiles = extract_tiles(pad_image(jnp.asarray(img), lo), lo)
        prof = layout_weight_profiles(lo)
        ref = np.asarray(
            B.laplacian_fusion_tiles(
                jnp.array(tiles), None, lo, levels=4,
                weight_profiles=prof, clip_range=None,
            )
        )
        got = np.asarray(sharded_laplacian_blend(tiles, *prof, lo, mesh, levels=4))
        np.testing.assert_allclose(got, ref[: got.shape[0]], atol=2e-4)


@pytest.mark.slow
def test_sharded_finalize_banded_matches_single_device(rng):
    """Deferred sharded blend + sharded banded finalize == single-device
    blend + banded finalize, without gathering the canvas (each stage's
    arrays stay row-sharded; the host sees only per-device bands)."""
    from srs_tpu.ops import blend as B
    from srs_tpu.ops.weights import layout_weight_profiles
    from srs_tpu.parallel.finalize import ShardedCanvas, sharded_finalize_banded
    from srs_tpu.parallel.halo import sharded_laplacian_blend

    S = 4
    mesh = make_mesh({"space": S})
    lo = compute_layout(300, 8 * 96 + 32, 128, 0.25, step_multiple=32)
    img = rng.random((lo.image_h, lo.image_w, 3), dtype=np.float32) * 255
    tiles = extract_tiles(pad_image(jnp.asarray(img), lo), lo)
    prof = layout_weight_profiles(lo)

    sc = sharded_laplacian_blend(
        jnp.array(tiles), *prof, lo, mesh, levels=4, collapse_last=False
    )
    assert isinstance(sc, ShardedCanvas)
    # the deferred pair stays row-sharded: every shard holds 1/S of the rows
    assert len({s.index[0].start for s in sc.lap0.addressable_shards}) == S
    assert sc.lap0.addressable_shards[0].data.shape[0] == sc.lap0.shape[0] // S

    lap0_ref, coarse_ref = B.laplacian_fusion_tiles(
        jnp.array(tiles), None, lo, levels=4,
        weight_profiles=prof, clip_range=None, collapse_last=False,
    )
    crop_h, crop_w = lo.image_h, lo.image_w
    for out_h, out_w, quant in (
        (lo.image_h * 2 + 7, lo.image_w * 2 + 3, True),   # upscale, uint8
        (lo.image_h // 2, lo.image_w // 2, False),        # downscale, float
    ):
        ref = B.blend_finalize_banded(
            jnp.array(lap0_ref), jnp.array(coarse_ref), out_h, out_w,
            bands=4, crop_h=crop_h, crop_w=crop_w, to_uint8=quant,
        )
        got = sharded_finalize_banded(
            sc, out_h, out_w, bands=8, crop_h=crop_h, crop_w=crop_w,
            to_uint8=quant,
        )
        assert got.shape == ref.shape and got.dtype == ref.dtype
        if quant:
            assert np.mean(np.abs(got.astype(np.int32) - ref.astype(np.int32)) > 1) < 1e-3
        else:
            np.testing.assert_allclose(got, ref, atol=5e-3)


@pytest.mark.slow
def test_sharded_finalize_iterator_row_order(rng):
    """Bands stream in global row order and reassemble exactly."""
    from srs_tpu.ops.weights import layout_weight_profiles
    from srs_tpu.parallel.finalize import sharded_finalize_banded
    from srs_tpu.parallel.halo import sharded_laplacian_blend

    mesh = make_mesh({"space": 8})
    lo = compute_layout(260, 8 * 96 + 32, 128, 0.25, step_multiple=32)
    img = rng.random((lo.image_h, lo.image_w, 3), dtype=np.float32) * 255
    tiles = extract_tiles(pad_image(jnp.asarray(img), lo), lo)
    prof = layout_weight_profiles(lo)
    sc = sharded_laplacian_blend(tiles, *prof, lo, mesh, levels=3, collapse_last=False)
    oh, ow = lo.image_h + 13, lo.image_w + 5
    full = sharded_finalize_banded(
        sc, oh, ow, bands=16, crop_h=lo.image_h, crop_w=lo.image_w, to_uint8=True
    )
    rows = list(
        sharded_finalize_banded(
            sc, oh, ow, bands=16, crop_h=lo.image_h, crop_w=lo.image_w,
            to_uint8=True, as_iterator=True,
        )
    )
    assert sum(r.shape[0] for r in rows) == oh
    np.testing.assert_array_equal(np.concatenate(rows, axis=0), full)


def test_sharded_laplacian_blend_validates_rows(rng):
    from srs_tpu.ops.weights import layout_weight_profiles
    from srs_tpu.parallel.halo import sharded_laplacian_blend

    mesh = make_mesh({"space": 8})
    lo = compute_layout(200, 200, 128, 0.25, step_multiple=32)  # ny=2
    tiles = jnp.zeros((lo.num_tiles, lo.block, lo.block, 3))
    prof = layout_weight_profiles(lo)
    with pytest.raises(ValueError):
        sharded_laplacian_blend(tiles, *prof, lo, mesh)
