"""Conditioned-polish acceptance on the held-out photo panel.

VERDICT r3 #8: the per-category conditioning strengths were validated
when only one eval photo existed; this re-checks the serving contract on
the 4-image panel — for each panel image, the HR is distorted with a
known (noise, blur, jpeg) recipe, and the packaged cond_polish must
restore it BETTER conditioned on the matching category vector than blind
(c=0), and must not damage clean images (near-identity at c=0).
Honest demotion path: if conditioned <= blind on the panel mean, set
``PipelineConfig.prompt_category`` guidance accordingly / report it.

    python scripts/cond_panel.py [--cpu]

Prints one JSON line per image and a summary; optionally records
cond_panel into checkpoints/EVAL.json under cond_polish_x1.
"""

import argparse
import importlib.util
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_panel():
    spec = importlib.util.spec_from_file_location(
        "photo_eval", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "photo_eval.py"))
    pe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pe)
    return pe.load_panel()


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-write", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from srs_tpu.models.conditioning import (build_cond_polish,
                                             is_cond_polish_trained)
    from srs_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    if not is_cond_polish_trained():
        print("no packaged cond_polish checkpoint", file=sys.stderr)
        return 1
    module, params, _ = build_cond_polish()

    import cv2

    rows = []
    for tag, hr in _load_panel():
        # the documented degradation recipe the conditioning vector names:
        # sigma-8 noise + 1.0 blur + q35 jpeg (mid severities)
        rng = np.random.default_rng(5)
        d = cv2.GaussianBlur(hr, (0, 0), 1.0)
        ok, buf = cv2.imencode(".jpg", d[..., ::-1].astype(np.uint8),
                               [int(cv2.IMWRITE_JPEG_QUALITY), 35])
        d = cv2.imdecode(buf, cv2.IMREAD_COLOR)[..., ::-1].astype(np.float32)
        d = np.clip(d + rng.normal(0, 8, d.shape), 0, 255).astype(np.float32)

        db = jnp.asarray(d)[None]
        # the trained conditioning contract (degrade_conditioned): noise
        # sigma = 25*c0, blur sigma = 1.6*c1, JPEG table scale = 2.5*c2
        # (cv2 q35 ~= table scale 50/35 = 1.43)
        c = jnp.asarray([[8.0 / 25.0, 1.0 / 1.6, 1.43 / 2.5]], jnp.float32)
        cond = np.asarray(jnp.clip(module.apply(params, db, c), 0, 255))[0]
        blind = np.asarray(jnp.clip(
            module.apply(params, db, jnp.zeros_like(c)), 0, 255))[0]
        clean = np.asarray(jnp.clip(
            module.apply(params, jnp.asarray(hr)[None],
                         jnp.zeros_like(c)), 0, 255))[0]
        row = {
            "image": tag,
            "distorted": round(psnr(d, hr), 3),
            "conditioned": round(psnr(cond, hr), 3),
            "blind": round(psnr(blind, hr), 3),
            "clean_passthrough": round(psnr(clean, hr), 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    mean_c = float(np.mean([r["conditioned"] for r in rows]))
    mean_b = float(np.mean([r["blind"] for r in rows]))
    mean_d = float(np.mean([r["distorted"] for r in rows]))
    summary = {
        "panel_mean_distorted": round(mean_d, 3),
        "panel_mean_conditioned": round(mean_c, 3),
        "panel_mean_blind": round(mean_b, 3),
        "cond_beats_blind": mean_c > mean_b,
        "min_clean_passthrough": round(
            min(r["clean_passthrough"] for r in rows), 2),
    }
    print(json.dumps(summary))

    if not args.no_write:
        from srs_tpu.models.evaljson import packaged_eval_dir, update_eval

        update_eval(packaged_eval_dir(), "cond_polish_x1",
                    {"cond_panel": summary})
        print("EVAL.json updated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
