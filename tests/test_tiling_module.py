"""TilingModule tests.

Models the reference's embedded suite (tiling_module.py:1224-1358
`run_tests`): split counts, metadata fields, neighbor graph, cache
round-trip, checkpoint restore into a FRESH module instance, streaming
load, merge with blending, cache stats, entropy/saliency."""

import numpy as np
import pytest
from PIL import Image

from srs_tpu.tiling.cache import LRUCache, TileStore
from srs_tpu.tiling.content import ContentAnalyzer
from srs_tpu.tiling.tiling import PaddingMode, Tile, TileStatus, TilingModule


@pytest.fixture()
def module(tmp_path):
    return TilingModule(
        block_size=128, overlap_ratio=0.2, cache_dir=str(tmp_path / "cache"),
        step_multiple=32,
    )


@pytest.fixture(scope="module")
def image():
    r = np.random.default_rng(3)
    yy, xx = np.mgrid[0:300, 0:400].astype(np.float32)
    img = np.stack(
        [127 + 90 * np.sin(xx / 23), 127 + 90 * np.cos(yy / 31), 127 + 90 * np.sin((xx - yy) / 17)],
        -1,
    )
    return np.clip(img + r.normal(0, 3, img.shape), 0, 255).astype(np.float32)


def test_split_image_metadata(module, image):
    tiles = module.split_image(image)
    lo = module._layouts[tiles[0].metadata.image_hash]
    assert len(tiles) == lo.num_tiles
    for t in tiles:
        m = t.metadata
        assert t.data.shape == (lo.block, lo.block, 3)
        assert m.input_w == lo.block and m.output_w == lo.block * module.output_scale
        assert len(m.neighbor_ids) == 8
        assert m.image_hash
        assert m.complexity_score > 0
        assert m.status == TileStatus.PENDING
    # block_ids unique
    assert len({t.metadata.block_id for t in tiles}) == len(tiles)


def test_effective_region(module, image):
    tiles = module.split_image(image)
    lo = module._layouts[tiles[0].metadata.image_hash]
    interior = [t for t in tiles if all(v > 0 for v in lo.overlaps[t.metadata.tile_index])]
    if interior:
        t = interior[0]
        eff = t.get_effective_region()
        assert eff.shape[0] == lo.block - 2 * lo.overlap


def test_cache_roundtrip(module, image):
    tiles = module.split_image(image)
    t = tiles[0]
    module.save_tile_cache(t)
    assert t.metadata.status == TileStatus.CACHED
    data = module.load_tile_cache(t.metadata.image_hash, t.metadata.block_id)
    np.testing.assert_array_equal(data, t.data)
    stats = module.get_cache_stats()
    assert stats["l2_files"] >= 1
    assert stats["l1"]["size"] >= 1


def test_checkpoint_restore_fresh_instance(module, image, tmp_path):
    tiles = module.split_image(image)
    h = tiles[0].metadata.image_hash
    for t in tiles:
        module.save_tile_cache(t)
    module.save_checkpoint(h)
    fresh = TilingModule(
        block_size=128, overlap_ratio=0.2, cache_dir=str(tmp_path / "cache"),
        step_multiple=32,
    )
    restored = fresh.restore_from_cache(h)
    assert restored is not None and len(restored) == len(tiles)
    for a, b in zip(sorted(tiles, key=lambda t: t.metadata.tile_index), restored):
        assert a.metadata.block_id == b.metadata.block_id
        np.testing.assert_array_equal(a.data, b.data)
    assert fresh.restore_from_cache("nonexistent") is None


def test_streaming_load(module, image, tmp_path):
    p = str(tmp_path / "img.png")
    Image.fromarray(image.astype(np.uint8)).save(p)
    full_tiles = module.split_image(p)
    lo = module._layouts[full_tiles[0].metadata.image_hash]
    data = module.load_tile_streaming(p, 0)
    assert data.shape == (lo.block, lo.block, 3)
    # interior region matches full-split tile 0 (both from the same png)
    np.testing.assert_allclose(
        data[:64, :64], full_tiles[0].data[:64, :64], atol=1.0
    )


def test_merge_reconstructs(module, image):
    tiles = module.split_image(image)
    out = module.merge_tiles(tiles, output_size=image.shape[:2], scale=1)
    np.testing.assert_allclose(out, image, atol=1e-3)


def test_merge_upscaled_tiles(module, image):
    from srs_tpu.ops.resize import resize_bicubic_up
    import jax.numpy as jnp

    tiles = module.split_image(image)
    for t in tiles:
        t.data = np.asarray(resize_bicubic_up(jnp.asarray(t.data)[None], 2))[0]
    out = module.merge_tiles(tiles, scale=2)
    assert out.shape == (image.shape[0] * 2, image.shape[1] * 2, 3)


def test_lru_cache_eviction():
    c = LRUCache(max_size=2)
    c.put("a", 1)
    c.put("b", 2)
    c.get("a")
    c.put("c", 3)  # evicts b (least recent)
    assert c.get("b") is None
    assert c.get("a") == 1 and c.get("c") == 3
    s = c.stats()
    assert s["size"] == 2 and s["hits"] == 3 and s["misses"] == 1


def test_tile_store(tmp_path):
    store = TileStore(str(tmp_path), l1_size=2)
    data = np.arange(12, dtype=np.float32).reshape(2, 2, 3)
    store.put("hash1", "blk1", data)
    np.testing.assert_array_equal(store.get("hash1", "blk1"), data)
    # L2 survives L1 eviction
    store.l1.clear()
    np.testing.assert_array_equal(store.get("hash1", "blk1"), data)
    assert store.has("hash1", "blk1")
    assert store.list_blocks("hash1") == ["blk1"]
    store.evict_image("hash1")
    assert not store.has("hash1", "blk1")


def test_content_analyzer_saliency_entropy(image):
    an = ContentAnalyzer()
    sal = an.compute_saliency_map(image)
    assert sal.shape == image.shape[:2]
    assert 0.0 <= sal.min() and sal.max() <= 1.0 + 1e-5
    ent = an.compute_local_entropy(image)
    assert ent.shape == image.shape[:2]
    # textured synthetic image: entropy should vary and exceed zero
    assert ent.max() > 0.1


def test_forbidden_zone_map(image):
    an = ContentAnalyzer(saliency_threshold=0.5)
    zone = an.create_forbidden_zone_map(image.astype(np.uint8))
    assert zone.shape == image.shape[:2]
    assert zone.dtype == bool
    ratio = an.forbidden_ratio(zone, 0, 0, 100, 100)
    assert 0.0 <= ratio <= 1.0


def test_padding_modes(module):
    for mode in PaddingMode:
        m = TilingModule(block_size=64, overlap_ratio=0.2, padding_mode=mode,
                         cache_dir=module.store.cache_dir)
        img = np.random.default_rng(0).random((50, 70, 3)).astype(np.float32) * 255
        lo, batch = m.split_to_batch(img)
        assert batch.shape == (lo.num_tiles, lo.block, lo.block, 3)


def test_image_hash_stability(module, image, tmp_path):
    h1 = module.compute_image_hash(image)
    h2 = module.compute_image_hash(image.copy())
    assert h1 == h2
    p = str(tmp_path / "x.png")
    Image.fromarray(image.astype(np.uint8)).save(p)
    assert module.compute_image_hash(p) == module.compute_image_hash(p)


def test_cache_thread_safety(tmp_path):
    """Concurrent put/get hammering (the reference guards its LRU and
    registry with locks, tiling_module.py:387-425; verify ours hold)."""
    import threading

    from srs_tpu.tiling.cache import LRUCache, TileStore

    cache = LRUCache(max_size=16)
    store = TileStore(str(tmp_path / "c"), l1_size=8)
    errors = []

    def worker(k):
        try:
            for i in range(200):
                cache.put(f"k{(k * 7 + i) % 32}", i)
                cache.get(f"k{i % 32}")
                if i % 50 == 0:
                    data = np.full((4, 4, 3), k, np.float32)
                    store.put("h", f"b{k}_{i}", data)
                    got = store.get("h", f"b{k}_{i}")
                    assert got is not None
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(k,)) for k in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(cache) <= 16
