"""Routed-default acceptance on the held-out photo panel (VERDICT r4 #7).

Runs the FULL pipeline (per-scale selection + degradation routing + the
SR-gain self-probe, exactly what a user's x2 job serves) on each panel
image downscaled by --scale, and scores the output against the held-out
HR. Acceptance: no panel image negative vs bicubic for the routed
default — the probe must route self-similar textures (the wood family,
where every clean net loses to bicubic) to the bicubic ladder while the
other images keep their learned gains.

    python scripts/routed_panel.py [--cpu] [--scale 2]

Prints one JSON line per image + a summary; records a ``routed_panel``
block under ``pipeline_x{scale}`` in the packaged EVAL.json.
"""

import argparse
import importlib.util
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _photo_eval():
    spec = importlib.util.spec_from_file_location(
        "photo_eval", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "photo_eval.py"))
    pe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pe)
    return pe


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--no-write", action="store_true")
    ap.add_argument(
        "--routes", default="bicubic,shrink",
        help="comma list of sr_gain_route values to measure; the EVAL "
        "block records each under routed_panel[_<route>], the acceptance "
        "verdict (no image negative) applies to the FIRST",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import cv2
    import jax.numpy as jnp

    from srs_tpu.ops.resize import resize_bicubic_up
    from srs_tpu.pipeline import PipelineConfig, SuperResolutionPipeline
    from srs_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    pe = _photo_eval()
    s = args.scale
    panel = pe.load_panel()

    routes = [r.strip() for r in args.routes.split(",") if r.strip()]
    eval_update = {}
    first_summary = None
    for route in routes:
        cfg = PipelineConfig(
            block_size=128, overlap_ratio=0.2, target_resolution="0x0",
            provider="quality", enable_qa=False, sr_gain_route=route,
        )
        pipe = SuperResolutionPipeline(cfg)

        rows = []
        for tag, hr in panel:
            lr = cv2.resize(hr, (hr.shape[1] // s, hr.shape[0] // s),
                            interpolation=cv2.INTER_AREA)
            # quantize the baseline like the pipeline's 8-bit output:
            # scoring float bicubic against a uint8 PNG reads ~-0.04 dB
            # of pure quantization as a "loss"
            base = pe.psnr(np.round(np.clip(np.asarray(
                resize_bicubic_up(jnp.asarray(lr)[None], s))[0], 0, 255)), hr)
            pipe.config.target_resolution = f"{hr.shape[1]}x{hr.shape[0]}"
            out = os.path.join("/tmp", f"routed_{tag}_x{s}_{route}.png")
            r = pipe.process(lr, out)
            assert r.success, r.error_message
            from PIL import Image

            got = np.asarray(Image.open(out).convert("RGB"), np.float32)
            p = pe.psnr(got, hr)
            info = dict(pipe.last_run_info)
            row = {
                "image": tag,
                "psnr": round(p, 3),
                "delta": round(p - base, 3),
                "provider": info.get("provider"),
                "models": info.get("models"),
                "sr_gain_probe": (round(info["sr_gain_probe"], 3)
                                  if info.get("sr_gain_probe") is not None
                                  else None),
            }
            if info.get("sr_gain_alpha") is not None:
                row["sr_gain_alpha"] = info["sr_gain_alpha"]
            rows.append(row)
            print(json.dumps({"route": route, **row}), flush=True)

        deltas = [r["delta"] for r in rows]
        summary = {
            "scale": s,
            "route": route,
            "mean_delta": round(float(np.mean(deltas)), 3),
            "min_delta": round(float(np.min(deltas)), 3),
            "no_image_negative": bool(min(deltas) >= -0.01),
        }
        print(json.dumps(summary))
        key = "routed_panel" if route == routes[0] else f"routed_panel_{route}"
        eval_update[key] = {"rows": rows, **summary}
        if first_summary is None:
            first_summary = summary

    if not args.no_write:
        from srs_tpu.models.evaljson import packaged_eval_dir, update_eval

        update_eval(packaged_eval_dir(), f"pipeline_x{s}", eval_update)
        print("EVAL.json updated")
    return 0 if first_summary["no_image_negative"] else 1


if __name__ == "__main__":
    sys.exit(main())
