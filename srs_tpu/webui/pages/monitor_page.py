"""Monitor page: real progress, real scheduler statistics, live logs.

Parity+fix of reference pages/monitor_page.py:12-346: the reference shows
scripted mock logs, a fake 8-agent table and random progress (SURVEY §3.4
"No call from UI into SuperResolutionPipeline exists"); this page drives
the real pipeline in a worker thread and renders the real
`AgentScheduler.get_statistics()` endpoint.
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Optional

from ..session import get_state, set_state

_worker: Optional[threading.Thread] = None
_log_buffer: list = []


class _BufferHandler(logging.Handler):
    def emit(self, record):
        _log_buffer.append(
            (time.strftime("%H:%M:%S"), record.levelname, record.getMessage())
        )
        del _log_buffer[:-500]


def _run_pipeline(image, cfg_state: dict) -> None:
    import numpy as np

    from ...pipeline import PipelineConfig, SuperResolutionPipeline

    try:
        set_state("current_stage", "initializing")
        cfg = PipelineConfig(
            block_size=min(cfg_state["tile_size"], 1024),
            overlap_ratio=cfg_state["overlap_ratio"],
            target_resolution=cfg_state["target_resolution"],
            provider=cfg_state["model_version"],
            quality_model=cfg_state.get("quality_model", "edsr_xl"),
            blend_method=cfg_state["fusion_algorithm"],
            self_ensemble=bool(cfg_state.get("self_ensemble", False)),
            # industry template steers the conditioned polish
            prompt_category=cfg_state.get("prompt_category"),
        )
        pipe = SuperResolutionPipeline(cfg)
        set_state("_pipeline", pipe)
        set_state("current_stage", "processing")
        out_path = cfg_state.get("output_path", "/tmp/srs_webui_output.tiff")
        result = pipe.process(np.asarray(image, np.float32), out_path)
        set_state("result_path", result.output_path)
        set_state("qa_report", result.quality_report)
        set_state("progress", 1.0)
        set_state("current_stage", "done" if result.success else f"failed: {result.error_message}")
    except Exception as e:  # noqa: BLE001
        set_state("current_stage", f"failed: {e}")
    finally:
        set_state("processing", False)


def start_worker(image, cfg_state: dict) -> None:
    global _worker
    handler = _BufferHandler()
    logging.getLogger("srs_tpu.pipeline").addHandler(handler)
    _worker = threading.Thread(target=_run_pipeline, args=(image, cfg_state), daemon=True)
    _worker.start()


def render() -> None:
    import streamlit as st

    st.header("3. Monitor")
    if not get_state("processing") and get_state("result_path") is None:
        st.info("Start a job from the Configure page.")
        return

    if get_state("processing") and (_worker is None or not _worker.is_alive()):
        img = get_state("uploaded_image")
        if img is not None:
            from ..session import get_config_summary

            cfg = dict(get_config_summary())
            cfg["overlap_ratio"] = get_state("overlap_ratio")
            cfg["tile_size"] = get_state("tile_size")
            cfg["target_resolution"] = get_state("target_resolution")
            cfg["model_version"] = get_state("model_version")
            cfg["fusion_algorithm"] = get_state("fusion_algorithm")
            cfg["self_ensemble"] = get_state("self_ensemble")
            start_worker(img, cfg)

    st.subheader("Stage")
    st.write(get_state("current_stage") or "queued")
    st.progress(float(get_state("progress") or 0.0))

    pipe = get_state("_pipeline")
    if pipe is not None and pipe.scheduler is not None:
        stats = pipe.scheduler.get_statistics()
        st.subheader("Scheduler")
        c1, c2, c3, c4 = st.columns(4)
        c1.metric("Agents online", stats["agents"]["online"])
        c2.metric("Queue depth", stats["queue"]["depth"])
        c3.metric("Completed", stats["counters"]["completed"])
        c4.metric("Retried", stats["counters"]["retried"])

    st.subheader("Logs")
    for ts, level, msg in _log_buffer[-30:]:
        st.text(f"{ts} [{level}] {msg}")

    c1, c2 = st.columns(2)
    if c1.button("Cancel"):
        set_state("cancelled", True)
        if pipe is not None:
            # Cooperative abort: the worker's process() raises
            # PipelineCancelled at the next stage boundary.
            pipe.cancel()
            set_state("current_stage", "cancelling...")
    if c2.button("Refresh"):
        pass  # streamlit rerun happens on any interaction
