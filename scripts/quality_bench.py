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
        images.append(render(880_000 + i, hr_size))

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255.0**2 / max(mse, 1e-12))

    providers = [
        ("bicubic", {}),
        ("fast", {}),
        ("quality", {}),
        ("quality", {"quality_model": "rcan"}),
        ("quality", {"quality_model": "edsr_l"}),
        ("zssr", {"zssr_steps": 100}),
    ]
    out_rows = []
    with tempfile.TemporaryDirectory() as td:
        for prov, extra in providers:
            cfg = PipelineConfig(
                block_size=128,
                target_resolution=f"{hr_size}x{hr_size}",
                provider=prov,
                enable_qa=False,
                **extra,
            )
            pipe = SuperResolutionPipeline(cfg)
            scores = []
            for i, hr in enumerate(images):
                lr = cv2.resize(hr, (lr_size, lr_size), interpolation=cv2.INTER_AREA)
                out = os.path.join(td, f"{prov}_{i}.png")
                r = pipe.process(lr, out)
                assert r.success, r.error_message
                from PIL import Image

                up = np.asarray(Image.open(out)).astype(np.float32)
                scores.append(psnr(up, hr))
            label = prov + (f"[{extra['quality_model']}]" if "quality_model" in extra else "")
            row = {
                "provider": label,
                "psnr_mean": round(float(np.mean(scores)), 3),
                "psnr_min": round(float(np.min(scores)), 3),
                "n": len(scores),
                "hr": hr_size,
                "scale": args.scale,
            }
            out_rows.append(row)
            print(json.dumps(row), flush=True)
    base = next(r["psnr_mean"] for r in out_rows if r["provider"] == "bicubic")
    print("\nprovider          PSNR    vs bicubic")
    for r in out_rows:
        print(f"{r['provider']:<16} {r['psnr_mean']:6.2f}  {r['psnr_mean']-base:+.2f} dB")


if __name__ == "__main__":
    main()
