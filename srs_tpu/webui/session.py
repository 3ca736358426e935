"""WebUI session state management.

Parity port of the reference's session manager (reference:
utils/session_manager.py:11-198): the same DEFAULT_SESSION_STATE keys
(tile_size 1024, overlap 0.20, target 1e8 px, guidance 7.5, steps 50,
seed -1, negative prompt, processing flags), init/get/set/reset and
`get_config_summary` — backed by Streamlit session_state when available,
or a plain dict (headless/CLI use and tests).
"""

from __future__ import annotations

from typing import Any, Dict

try:
    import streamlit as st

    _HAS_ST = True
except Exception:  # pragma: no cover
    _HAS_ST = False

DEFAULT_SESSION_STATE: Dict[str, Any] = {
    # upload
    "uploaded_image": None,
    "image_info": None,
    "crop_region": None,
    # config (reference: session_manager.py:11-58)
    "tile_size": 1024,
    "overlap_ratio": 0.20,
    "target_pixels": 100_000_000,
    "target_resolution": "100MP",
    "max_tiles": 64,
    "model_version": "quality",
    "fusion_algorithm": "laplacian",
    "guidance_scale": 7.5,
    "num_steps": 50,
    "seed": -1,
    "negative_prompt": "",
    "prompt_category": "general",
    # processing flags
    "processing": False,
    "paused": False,
    "cancelled": False,
    "progress": 0.0,
    "current_stage": "",
    "result_path": None,
    "qa_report": None,
    "task_history": [],
}

_fallback_state: Dict[str, Any] = {}


def _state() -> Dict[str, Any]:
    if _HAS_ST:
        return st.session_state
    return _fallback_state


def initialize_session_state() -> None:
    s = _state()
    for k, v in DEFAULT_SESSION_STATE.items():
        if k not in s:
            s[k] = v


def get_state(key: str, default: Any = None) -> Any:
    return _state().get(key, DEFAULT_SESSION_STATE.get(key, default))


def set_state(key: str, value: Any) -> None:
    _state()[key] = value


def reset_session_state() -> None:
    s = _state()
    for k, v in DEFAULT_SESSION_STATE.items():
        s[k] = v


def get_config_summary() -> Dict[str, Any]:
    """(reference: session_manager.py:154-173)."""
    return {
        "tile_size": get_state("tile_size"),
        "overlap_ratio": get_state("overlap_ratio"),
        "target_resolution": get_state("target_resolution"),
        "model_version": get_state("model_version"),
        "fusion_algorithm": get_state("fusion_algorithm"),
        "guidance_scale": get_state("guidance_scale"),
        "num_steps": get_state("num_steps"),
        "seed": get_state("seed"),
        "prompt_category": get_state("prompt_category"),
    }
