"""Host-side image IO.

Load/save for the pipeline's entry and exit stages (reference:
main.py:289-295 cv2.imread + BGR->RGB on entry; :391-410 TIFF(lzw)/PNG/
JPEG save + QA report JSON on exit). Arrays are RGB float32 in [0, 255]
throughout the framework; conversion to uint8/uint16 happens only here.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

try:
    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None  # print-grade outputs exceed PIL's default
    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def load_image(path: str) -> np.ndarray:
    """RGB float32 (H, W, 3) in [0, 255]."""
    if not _HAS_PIL:
        raise RuntimeError("PIL unavailable")
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32)


def save_image(
    path: str,
    image: np.ndarray,
    quality: int = 95,
    bit_depth: int = 8,
) -> str:
    """Save by extension: .tiff/.tif -> compressed TIFF, .png -> PNG, else
    JPEG (reference: main.py:399-404). TIFF goes through the native C++
    backend when available (streaming striped deflate, true 16-bit RGB —
    PIL has no multi-channel 16-bit mode), PIL LZW otherwise."""
    if not _HAS_PIL:
        raise RuntimeError("PIL unavailable")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    lower = path.lower()
    if lower.endswith((".tiff", ".tif")):
        try:
            from .native import write_tiff

            write_tiff(path, np.asarray(image), bit_depth=bit_depth)
            return path
        except (ImportError, OSError):
            pass
    arr = np.clip(np.asarray(image), 0, 255).astype(np.uint8)
    im = Image.fromarray(arr)
    if lower.endswith((".tiff", ".tif")):
        im.save(path, format="TIFF", compression="tiff_lzw")
    elif lower.endswith(".png"):
        im.save(path, format="PNG", compress_level=3)
    else:
        im.save(path, quality=quality)
    return path


def image_size(path: str) -> Tuple[int, int]:
    """(width, height) without decoding pixel data."""
    with Image.open(path) as im:
        return im.size
