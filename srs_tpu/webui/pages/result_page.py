"""Result page: before/after comparison, real QA metrics, export options.

Parity+fix of reference pages/result_page.py:27-314: the reference shows
hard-coded metrics (PSNR 42.3) and a LANCZOS mock result; this page loads
the actual pipeline output and the real QA report.
"""

from __future__ import annotations

import io
import os
import tempfile
from typing import Tuple

from ..session import get_state

EXPORT_FORMATS = ["tiff", "png", "jpeg"]
COLOR_SPACES = ["sRGB", "AdobeRGB", "ProPhoto"]
BIT_DEPTHS = [8, 16]


def build_export(
    path: str, fmt: str, color_space: str, bit_depth: int, quality: int = 95
) -> Tuple[bytes, str]:
    """Re-encode the pipeline output per the export selectors (the
    reference's selectors were decorative, pages/result_page.py:115-178).

    Returns (file bytes, suggested filename). 16-bit requires TIFF (via the
    native writer); PNG/JPEG exports are 8-bit."""
    import numpy as np
    from PIL import Image

    from ...ops.colorspace import convert_profile

    Image.MAX_IMAGE_PIXELS = None
    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), np.float32)
    if color_space != "sRGB":
        arr = convert_profile(arr, color_space)

    stem = os.path.splitext(os.path.basename(path))[0]
    suffix = "" if color_space == "sRGB" else f"_{color_space.lower()}"
    if fmt == "tiff":
        from ...io.native import write_tiff

        with tempfile.NamedTemporaryFile(suffix=".tiff", delete=False) as tmp:
            tmp_path = tmp.name
        try:
            write_tiff(tmp_path, arr, bit_depth=bit_depth if bit_depth in (8, 16) else 8)
            with open(tmp_path, "rb") as f:
                return f.read(), f"{stem}{suffix}.tiff"
        finally:
            os.unlink(tmp_path)
    img8 = Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))
    buf = io.BytesIO()
    if fmt == "jpeg":
        img8.save(buf, format="JPEG", quality=int(quality))
        return buf.getvalue(), f"{stem}{suffix}.jpg"
    img8.save(buf, format="PNG")
    return buf.getvalue(), f"{stem}{suffix}.png"


def render() -> None:
    import streamlit as st
    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None
    st.header("4. Result")
    path = get_state("result_path")
    if not path or not os.path.exists(path):
        st.info("No result yet.")
        return

    src = get_state("uploaded_image")
    with Image.open(path) as out_img:
        ow, oh = out_img.size
        preview = out_img.copy()
        preview.thumbnail((1400, 1400))

    c1, c2 = st.columns(2)
    if src is not None:
        c1.image(src, caption=f"Input {src.width}x{src.height}")
    c2.image(preview, caption=f"Output {ow}x{oh} ({ow*oh/1e6:.0f} MP, preview)")

    report = get_state("qa_report")
    if report:
        st.subheader("Quality metrics")
        cols = st.columns(5)
        for col, (label, key, fmt) in zip(
            cols,
            [
                ("PSNR", "psnr", "{:.2f} dB"),
                ("SSIM", "ssim", "{:.4f}"),
                ("MS-SSIM", "ms_ssim", "{:.4f}"),
                ("NIQE", "niqe", "{:.2f}"),
                ("Overall", "overall_score", "{:.1f}/100"),
            ],
        ):
            if key in report:
                col.metric(label, fmt.format(report[key]))
        with st.expander("Full QA report"):
            st.json(report)

    st.subheader("Export")
    fmt = st.selectbox("Format", EXPORT_FORMATS)
    color_space = st.selectbox("Color space", COLOR_SPACES)
    bit_depth = st.selectbox("Bit depth", BIT_DEPTHS)
    quality = st.slider("Quality", 60, 100, 95) if fmt == "jpeg" else 95
    if st.button("Prepare download"):
        data, name = build_export(path, fmt, color_space, int(bit_depth), quality)
        st.download_button("Save file", data, file_name=name)
