"""ctypes bindings for the native IO backend (native/tiffio.cpp).

Builds the shared library on first use (g++ is in the image; no pybind11
needed) and exposes:

- :func:`write_tiff` — striped deflate TIFF, 8/16-bit RGB (16-bit is
  unavailable through PIL for multi-channel images);
- :func:`content_hash` — FNV-1a 64-bit content addressing.

Falls back cleanly (raises ImportError from :func:`load`) when no
compiler is present; callers gate on :func:`available`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_LIB_DIR, "libsrstiff.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


_SRC_PATH = os.path.join(_LIB_DIR, "tiffio.cpp")
_STAMP_PATH = os.path.join(_LIB_DIR, ".tiffio.sha256")


def _src_digest() -> str:
    import hashlib

    with open(_SRC_PATH, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build() -> None:
    subprocess.run(
        ["make", "-C", _LIB_DIR, "libsrstiff.so"],
        check=True,
        capture_output=True,
    )
    with open(_STAMP_PATH, "w", encoding="utf-8") as f:
        f.write(_src_digest())


def _needs_build() -> bool:
    """Rebuild unless the .so was built from the current source content.

    Content-hash stamp rather than mtimes: mtimes are arbitrary after a
    fresh clone, and the library must always come from source (no
    unverifiable prebuilt binary is shipped)."""
    if not os.path.exists(_LIB_PATH) or not os.path.exists(_STAMP_PATH):
        return True
    try:
        with open(_STAMP_PATH, encoding="utf-8") as f:
            return f.read().strip() != _src_digest()
    except OSError:
        return True


def load() -> ctypes.CDLL:
    global _lib, _load_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _load_failed:
            raise ImportError("native tiff backend unavailable")
        try:
            if _needs_build():
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.srs_write_tiff.restype = ctypes.c_int64
            lib.srs_write_tiff.argtypes = [
                ctypes.c_char_p,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
            ]
            lib.srs_hash64.restype = ctypes.c_uint64
            lib.srs_hash64.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            _lib = lib
            return lib
        except Exception as e:  # noqa: BLE001
            _load_failed = True
            raise ImportError(f"native tiff backend unavailable: {e}") from e


def available() -> bool:
    try:
        load()
        return True
    except ImportError:
        return False


def write_tiff(
    path: str,
    image: np.ndarray,
    bit_depth: int = 8,
    compress: bool = True,
) -> int:
    """Write (H, W, C) image as striped TIFF. Input float [0,255] or
    uint8/uint16; 16-bit output rescales from the 255 domain."""
    lib = load()
    arr = np.asarray(image)
    if arr.ndim == 2:
        arr = arr[..., None]
    if bit_depth == 16:
        if arr.dtype != np.uint16:
            arr = (np.clip(arr.astype(np.float64), 0, 255) / 255.0 * 65535.0 + 0.5).astype(
                np.uint16
            )
    else:
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0, 255).astype(np.uint8)
    arr = np.ascontiguousarray(arr)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    h, w, c = arr.shape
    rc = lib.srs_write_tiff(
        path.encode(), arr.ctypes.data_as(ctypes.c_void_p), h, w, c, bit_depth,
        1 if compress else 0,
    )
    if rc < 0:
        raise IOError(f"srs_write_tiff failed with code {rc}")
    return int(rc)


def content_hash(data: np.ndarray | bytes) -> str:
    lib = load()
    if isinstance(data, np.ndarray):
        data = np.ascontiguousarray(data).tobytes()
    h = lib.srs_hash64(data, len(data))
    return f"{h:016x}"


class TiffStreamWriter:
    """Incremental TIFF writer: feed row bands as they arrive from the
    device; strips deflate on a C++ thread pool so compression hides under
    the ~30 MB/s host-link transfer."""

    def __init__(self, path: str, h: int, w: int, channels: int = 3,
                 bit_depth: int = 8, compress: bool = True, level: int = 1):
        lib = load()
        if not hasattr(lib, "_stream_proto_set"):
            lib.srs_tiff_begin.restype = ctypes.c_void_p
            lib.srs_tiff_begin.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            lib.srs_tiff_write_rows.restype = ctypes.c_int64
            lib.srs_tiff_write_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.srs_tiff_end.restype = ctypes.c_int64
            lib.srs_tiff_end.argtypes = [ctypes.c_void_p]
            lib._stream_proto_set = True
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._lib = lib
        self._bit_depth = bit_depth
        self._ctx = lib.srs_tiff_begin(
            path.encode(), h, w, channels, bit_depth, 1 if compress else 0, level
        )
        if not self._ctx:
            raise IOError("srs_tiff_begin failed")

    def write(self, rows: np.ndarray) -> None:
        arr = np.ascontiguousarray(rows)
        expect = np.uint16 if self._bit_depth == 16 else np.uint8
        if arr.dtype != expect:
            raise TypeError(f"rows must be {expect}, got {arr.dtype}")
        rc = self._lib.srs_tiff_write_rows(
            self._ctx, arr.ctypes.data_as(ctypes.c_void_p), arr.shape[0]
        )
        if rc < 0:
            raise IOError(f"srs_tiff_write_rows failed ({rc})")

    def close(self) -> int:
        if self._ctx is None:
            return 0
        rc = self._lib.srs_tiff_end(self._ctx)
        self._ctx = None
        if rc < 0:
            raise IOError(f"srs_tiff_end failed ({rc})")
        return int(rc)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
