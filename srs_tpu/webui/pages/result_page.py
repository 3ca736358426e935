"""Result page: before/after comparison, real QA metrics, export options.

Parity+fix of reference pages/result_page.py:27-314: the reference shows
hard-coded metrics (PSNR 42.3) and a LANCZOS mock result; this page loads
the actual pipeline output and the real QA report.
"""

from __future__ import annotations

import os

from ..session import get_state

EXPORT_FORMATS = ["tiff", "png", "jpeg"]
COLOR_SPACES = ["sRGB", "AdobeRGB", "ProPhoto"]
BIT_DEPTHS = [8, 16]


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
    st.selectbox("Color space", COLOR_SPACES)
    st.selectbox("Bit depth", BIT_DEPTHS)
    quality = st.slider("Quality", 60, 100, 95) if fmt == "jpeg" else 95
    if st.button("Download"):
        with open(path, "rb") as f:
            st.download_button(
                "Save file", f.read(), file_name=os.path.basename(path)
            )
