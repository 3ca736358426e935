"""Native TIFF backend tests (builds the C++ library on first run)."""

import numpy as np
import pytest
from PIL import Image

from srs_tpu.io.image import load_image, save_image
from srs_tpu.io.native import available, content_hash, write_tiff

pytestmark = pytest.mark.skipif(not available(), reason="no C++ toolchain")


def test_tiff_8bit_roundtrip(tmp_path, rng):
    img = (rng.random((123, 77, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "a.tiff")
    n = write_tiff(p, img)
    assert n > 0
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, img)


def test_tiff_16bit_readable_by_cv2(tmp_path, rng):
    import cv2

    img = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    p = str(tmp_path / "b16.tiff")
    write_tiff(p, img, bit_depth=16)
    back = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    assert back.dtype == np.uint16
    # value mapping 255 -> 65535 (BGR from cv2)
    np.testing.assert_allclose(
        back[..., ::-1].astype(np.float64) / 257.0, img, atol=1.0
    )


def test_tiff_uncompressed_and_gray(tmp_path, rng):
    img = (rng.random((50, 60, 1)) * 255).astype(np.uint8)
    p = str(tmp_path / "g.tiff")
    write_tiff(p, img, compress=False)
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, img[..., 0])


def test_tiff_large_multistrip(tmp_path, rng):
    # > 1MB per strip boundary exercised
    img = (rng.random((1200, 900, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "big.tiff")
    write_tiff(p, img)
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, img)


def test_save_image_routes_tiff_through_native(tmp_path, rng):
    img = (rng.random((40, 30, 3)) * 255).astype(np.float32)
    p = str(tmp_path / "r.tiff")
    save_image(p, img)
    back = load_image(p)
    np.testing.assert_allclose(back, np.clip(img, 0, 255).astype(np.uint8), atol=0)


def test_content_hash_stability(rng):
    a = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    assert content_hash(a) == content_hash(a.copy())
    b = a.copy()
    b[0, 0, 0] ^= 1
    assert content_hash(a) != content_hash(b)
    assert len(content_hash(a)) == 16


def test_write_tiff_bad_input(tmp_path):
    with pytest.raises(IOError):
        write_tiff(str(tmp_path / "x.tiff"), np.zeros((4, 4, 5), np.uint8))


def test_tiff_two_and_four_channel(tmp_path, rng):
    # channels==2 packs BitsPerSample inline (TIFF <=4-byte rule) and both
    # LA/RGBA need the ExtraSamples tag for readers to accept them.
    for ch in (2, 4):
        img = (rng.random((33, 47, ch)) * 255).astype(np.uint8)
        p = str(tmp_path / f"c{ch}.tiff")
        write_tiff(p, img)
        back = np.asarray(Image.open(p))
        assert back.shape == img.shape
        assert (back == img).all()


def test_tiff_build_stamp_rebuilds_from_source(tmp_path):
    # The .so is never shipped; a content-hash stamp forces rebuild when
    # the stamp is missing or stale (fresh-clone safety).
    from srs_tpu.io import native

    assert not native._needs_build()  # just built by available()
    stamp = native._STAMP_PATH
    with open(stamp, encoding="utf-8") as f:
        good = f.read()
    try:
        with open(stamp, "w", encoding="utf-8") as f:
            f.write("0" * 64)
        assert native._needs_build()
    finally:
        with open(stamp, "w", encoding="utf-8") as f:
            f.write(good)
