"""WebUI shell: page config, sidebar navigation, status metrics, router.

Parity port of reference app.py:27-164 (5-page sidebar nav, online-agent /
queue-depth status metrics, header, router) over the real pipeline.
Run with: streamlit run srs_tpu/webui/app.py  (requires streamlit; the
module imports cleanly without it for testing).
"""

from __future__ import annotations

PAGES = ["Upload", "Configure", "Monitor", "Result", "Advanced"]


def main() -> None:
    import streamlit as st

    from .session import get_state, initialize_session_state
    from .styles import apply_custom_css
    from .pages import (
        advanced_page,
        config_page,
        monitor_page,
        result_page,
        upload_page,
    )

    st.set_page_config(
        page_title="srs-tpu | Super-Resolution",
        page_icon="SR",
        layout="wide",
        initial_sidebar_state="expanded",
    )
    initialize_session_state()
    apply_custom_css()

    with st.sidebar:
        st.title("srs-tpu")
        st.caption("TPU-native print-grade super-resolution")
        page = st.radio("Navigate", PAGES)
        pipe = get_state("_pipeline")
        if pipe is not None and pipe.scheduler is not None:
            stats = pipe.scheduler.get_statistics()
            st.metric("Agents online", stats["agents"]["online"])
            st.metric("Queue depth", stats["queue"]["depth"])
        import jax

        st.caption(f"Devices: {len(jax.devices())} ({jax.default_backend()})")

    st.title("Ultra-Resolution Image Generation")
    st.caption("tile -> super-resolve -> blend -> assess, end to end on TPU")

    router = {
        "Upload": upload_page.render,
        "Configure": config_page.render,
        "Monitor": monitor_page.render,
        "Result": result_page.render,
        "Advanced": advanced_page.render,
    }
    router[page]()


if __name__ == "__main__":
    main()
