"""End-to-end quality benchmark: pipeline output PSNR vs known HR truth.

Net-level eval (checkpoints/EVAL.json) scores the bare models; this runs
the WHOLE pipeline (tiling -> SR ladder -> blend -> save) on synthetic
LR inputs whose HR ground truth is known, per provider. This is the
honest system-level analog of the reference's remote-provider quality
claims (super_resolution_module.py:561-711).

    python scripts/quality_bench.py [--cpu] [--n 6] [--size 512]

Prints one JSON line per provider and a summary table.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--size", type=int, default=512, help="HR size (LR = size/2)")
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--no-photo", action="store_true",
                    help="skip the held-out real-photograph row")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import cv2
    import numpy as np

    from srs_tpu.models.corpus import render_image, render_natural
    from srs_tpu.pipeline import PipelineConfig, SuperResolutionPipeline

    hr_size = args.size
    lr_size = hr_size // args.scale
    # Held-out seeds disjoint from training/fit ranges.
    images = []
    for i in range(args.n):
        render = render_natural if i % 2 else render_image
        images.append(("proc", render(880_000 + i, hr_size)))
    if not args.no_photo:
        # Permanent held-out row: the real-photograph eval panel (never
        # trained on — tests/test_photo_holdout.py). load_panel yields
        # common-shape 420x504 crops; pad/crop handling stays in the
        # pipeline under test.
        from photo_eval import load_panel

        for tag, photo in load_panel(["portrait"]):
            ph, pw = photo.shape[:2]
            s = min(hr_size / ph, hr_size / pw, 1.0)
            if s < 1.0:
                photo = cv2.resize(
                    photo, (int(pw * s) // 4 * 4, int(ph * s) // 4 * 4),
                    interpolation=cv2.INTER_AREA)
            images.append(("photo", photo))

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255.0**2 / max(mse, 1e-12))

    providers = [
        ("bicubic", {}),
        ("fast", {}),
        ("quality", {}),
        ("quality", {"quality_model": "rcan"}),
        ("quality", {"quality_model": "edsr_l"}),
        ("hybrid", {}),
        ("zssr", {"zssr_steps": 100}),
    ]
    out_rows = []
    with tempfile.TemporaryDirectory() as td:
        for prov, extra in providers:
            scores = {"proc": [], "photo": []}
            for i, (kind, hr) in enumerate(images):
                lr = cv2.resize(hr, (hr.shape[1] // args.scale, hr.shape[0] // args.scale),
                                interpolation=cv2.INTER_AREA)
                cfg = PipelineConfig(
                    block_size=128,
                    target_resolution=f"{hr.shape[1]}x{hr.shape[0]}",
                    provider=prov,
                    enable_qa=False,
                    **extra,
                )
                pipe = SuperResolutionPipeline(cfg)
                out = os.path.join(td, f"{prov}_{i}.png")
                r = pipe.process(lr, out)
                assert r.success, r.error_message
                from PIL import Image

                up = np.asarray(Image.open(out)).astype(np.float32)
                scores[kind].append(psnr(up, hr))
            label = prov + (f"[{extra['quality_model']}]" if "quality_model" in extra else "")
            row = {
                "provider": label,
                "psnr_mean": round(float(np.mean(scores["proc"])), 3),
                "psnr_min": round(float(np.min(scores["proc"])), 3),
                "n": len(scores["proc"]),
                "hr": hr_size,
                "scale": args.scale,
            }
            if scores["photo"]:
                row["photo_psnr"] = round(float(np.mean(scores["photo"])), 3)
            out_rows.append(row)
            print(json.dumps(row), flush=True)
    base = next(r["psnr_mean"] for r in out_rows if r["provider"] == "bicubic")
    base_ph = next((r.get("photo_psnr") for r in out_rows if r["provider"] == "bicubic"), None)
    print("\nprovider          PSNR    vs bicubic   photo    vs bicubic")
    for r in out_rows:
        line = f"{r['provider']:<16} {r['psnr_mean']:6.2f}  {r['psnr_mean']-base:+.2f} dB"
        if base_ph is not None and "photo_psnr" in r:
            line += f"   {r['photo_psnr']:6.2f}  {r['photo_psnr']-base_ph:+.2f} dB"
        print(line)


if __name__ == "__main__":
    main()
