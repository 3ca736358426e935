"""Config page: resolution presets, tile/overlap sliders, model/fusion
selectors, advanced knobs, live estimator, start gating.

Parity port of reference pages/config_page.py:11-346 (presets
100/150/200MP + custom, tile 512-4096, overlap 10-30%, max tiles,
model/fusion selectors, guidance/steps/seed, industry templates, cost
estimator gating the start button when tiles > max).
"""

from __future__ import annotations

from ...config import RESOLUTION_PRESETS
from ...models.prompts import PromptTemplateManager
from ..estimator import calculate_estimates
from ..session import get_state, set_state


def render() -> None:
    import streamlit as st

    st.header("2. Configure")
    info = get_state("image_info")
    if info is None:
        st.warning("Upload an image first.")
        return

    st.subheader("Target resolution")
    preset = st.radio(
        "Preset", ["100MP", "150MP", "200MP", "custom"], horizontal=True,
        index=["100MP", "150MP", "200MP", "custom"].index(get_state("target_resolution", "100MP"))
        if get_state("target_resolution", "100MP") in ("100MP", "150MP", "200MP", "custom") else 0,
    )
    if preset == "custom":
        cw = st.number_input("width", 1000, 30000, 12245)
        ch = st.number_input("height", 1000, 30000, 8163)
        set_state("target_resolution", f"{cw}x{ch}")
        target_pixels = cw * ch
    else:
        set_state("target_resolution", preset)
        tw, th = RESOLUTION_PRESETS[preset]
        target_pixels = tw * th
    set_state("target_pixels", target_pixels)

    st.subheader("Tiling")
    tile = st.slider("Tile size", 512, 4096, get_state("tile_size", 1024), step=128)
    overlap = st.slider("Overlap %", 10, 30, int(get_state("overlap_ratio", 0.2) * 100)) / 100.0
    max_tiles = st.slider("Max tiles", 4, 256, get_state("max_tiles", 64))
    set_state("tile_size", tile)
    set_state("overlap_ratio", overlap)
    set_state("max_tiles", max_tiles)

    st.subheader("Model")
    # Ordered by held-out panel quality per compute (EVAL.json panel
    # blocks): quality (+ the self-ensemble toggle below for the best
    # result) > fusion (5-net blend; loses to one self-ensembled net on
    # the panel — kept for parity) > hybrid > fast > bicubic; zssr is the
    # per-image adaptation ceiling probe.
    providers = ["quality", "fusion", "hybrid", "fast", "bicubic", "zssr"]
    cur_prov = get_state("model_version", "quality")
    model = st.selectbox(
        "Provider", providers,
        index=providers.index(cur_prov) if cur_prov in providers else 0,
    )
    best = st.checkbox(
        "Best quality: self-ensemble (\"+\", 8 dihedral passes — wins the "
        "held-out panel at every scale; ~8x SR-stage compute)",
        value=bool(get_state("self_ensemble", False)),
    )
    set_state("self_ensemble", best)
    nets = ["edsr_xl", "edsr_l", "edsr_l_robust", "edsr_m", "rcan", "espcn"]
    cur_net = get_state("quality_model", "edsr_xl")
    qnet = st.selectbox(
        "Quality net (fallback; each ladder step auto-serves the "
        "panel-best packaged net at that scale)", nets,
        index=nets.index(cur_net) if cur_net in nets else 0,
    )
    fusion = st.selectbox(
        "Fusion algorithm",
        ["laplacian", "multi_band", "weighted", "feather", "gradient_domain", "poisson"],
        index=0,
    )
    cats = PromptTemplateManager.list_categories()
    cur_cat = get_state("prompt_category", "general")
    category = st.selectbox(
        "Industry template", cats,
        index=cats.index(cur_cat) if cur_cat in cats else cats.index("general"),
    )
    set_state("model_version", model)
    set_state("quality_model", qnet)
    set_state("fusion_algorithm", fusion)
    set_state("prompt_category", category)

    with st.expander("Advanced"):
        set_state("guidance_scale", st.slider("Guidance", 1.0, 20.0, get_state("guidance_scale", 7.5)))
        set_state("num_steps", st.slider("Refinement steps", 0, 100, get_state("num_steps", 50)))
        set_state("seed", st.number_input("Seed (-1 = content hash)", -1, 2**31 - 1, get_state("seed", -1)))
        set_state("negative_prompt", st.text_input("Negative prompt", get_state("negative_prompt", "")))

    est = calculate_estimates(
        info["width"], info["height"], target_pixels, tile, overlap,
        self_ensemble=best,
    )
    st.subheader("Estimate")
    c1, c2, c3 = st.columns(3)
    c1.metric("Scale", f"{est['scale_factor']:.1f}x")
    c2.metric("Tiles", f"{est['tiles_x']}x{est['tiles_y']} = {est['num_tiles']}")
    c3.metric("Est. time", f"{est['estimated_seconds']:.0f} s")

    if est["num_tiles"] > max_tiles:
        st.error(f"Tile count {est['num_tiles']} exceeds max {max_tiles}; raise max or tile size.")
    else:
        if st.button("Start processing", type="primary"):
            set_state("processing", True)
            set_state("cancelled", False)
            st.switch_page("monitor") if hasattr(st, "switch_page") else None
