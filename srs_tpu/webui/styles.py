"""WebUI theme CSS.

Parity role of the reference's styles/custom_css.py:8-415 (dark gradient
theme + card/button styles), reduced to the essentials; injected via
st.markdown when Streamlit is present.
"""

from __future__ import annotations

CUSTOM_CSS = """
<style>
.stApp { background: linear-gradient(160deg, #0f1220 0%, #171a2e 60%, #1c2040 100%); }
section[data-testid="stSidebar"] { background: #12152a; }
h1, h2, h3 { color: #e8eaf6; }
.block-container { padding-top: 2rem; }
.srs-card {
  background: rgba(255,255,255,0.04); border: 1px solid rgba(255,255,255,0.08);
  border-radius: 12px; padding: 1rem 1.25rem; margin-bottom: 1rem;
}
.srs-metric { font-size: 1.6rem; font-weight: 600; color: #8ab4ff; }
.stButton > button {
  background: linear-gradient(90deg, #3b5bdb, #4dabf7); color: white;
  border: none; border-radius: 8px;
}
</style>
"""


def apply_custom_css() -> None:
    try:
        import streamlit as st

        st.markdown(CUSTOM_CSS, unsafe_allow_html=True)
    except Exception:
        pass


def get_card_style() -> str:
    return "srs-card"


def get_button_style() -> str:
    return "stButton"
