"""Held-out REAL-PHOTOGRAPH eval panel (the generalization oracle).

Every quality number in EVAL.json / quality_bench.py lives on the
procedural corpus distribution; this script scores the packaged nets on
the one real photograph in this environment (matplotlib's
grace_hopper.jpg) — which is NEVER used for training or fitting anywhere
in the repo (enforced by tests/test_photo_holdout.py). Degradation
matches the corpus protocol: cv2 INTER_AREA downsample.

    python scripts/photo_eval.py [--cpu] [--scale 2] [--models a,b,c]

Prints one JSON line per model plus a summary table. This is the honest
analog of the reference's natural-image providers
(super_resolution_module.py:561-711): a provider that loses to bicubic
here adds no value on real content no matter its corpus eval.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRACE_HOPPER = os.path.join(
    os.path.dirname(os.path.abspath(__import__("matplotlib").__file__)),
    "mpl-data", "sample_data", "grace_hopper.jpg",
)


def load_photo():
    import numpy as np
    from PIL import Image

    img = np.asarray(Image.open(GRACE_HOPPER).convert("RGB"), np.float32)
    h, w = img.shape[:2]
    return img[: h - h % 12, : w - w % 12]  # multiple of 2/3/4 for all scales


def psnr(a, b):
    import numpy as np

    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--models", type=str,
                    default="espcn,edsr_m,rcan,edsr_l,edsr_l_robust")
    ap.add_argument("--checkpoint-dir", type=str, default=None)
    ap.add_argument("--zssr-steps", type=int, default=150)
    ap.add_argument("--degrade", choices=["none", "noise", "blur"],
                    default="none",
                    help="damage the LR input like real capture defects "
                    "(the degradation router's triggers): the robust-tier "
                    "acceptance panel — both tiers must beat bicubic here")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import cv2
    import jax.numpy as jnp
    import numpy as np

    from srs_tpu.models.registry import build_model, is_pretrained
    from srs_tpu.ops.resize import resize_bicubic_up

    hr = load_photo()
    s = args.scale
    lr = cv2.resize(hr, (hr.shape[1] // s, hr.shape[0] // s),
                    interpolation=cv2.INTER_AREA)
    if args.degrade == "noise":  # true sensor-noise level that trips the router
        lr = np.clip(
            lr + np.random.default_rng(0).normal(0, 6, lr.shape), 0, 255
        ).astype(np.float32)
    elif args.degrade == "blur":
        lr = cv2.GaussianBlur(lr, (0, 0), 1.2)
    lr_b = jnp.asarray(lr, jnp.float32)[None]

    base = psnr(np.clip(np.asarray(resize_bicubic_up(lr_b, s))[0], 0, 255), hr)
    rows = [{"model": "bicubic", "psnr": round(base, 3), "delta": 0.0}]
    print(json.dumps(rows[0]), flush=True)
    for name in args.models.split(","):
        name = name.strip()
        if not name:
            continue
        # Row grammar: bare[+][:ibp]  — "+" = geometric self-ensemble,
        # ":ibp" = area-consistent iterative back-projection (the eval
        # degradation IS area, so this enforces the true fixed point).
        ibp = name.endswith(":ibp")
        stem = name[: -len(":ibp")] if ibp else name
        ensemble = stem.endswith("+")  # "edsr_l+" = geometric self-ensemble
        bare = stem[:-1] if ensemble else stem
        if bare == "fusion":
            from srs_tpu.models.fusion import load_fusion
            from srs_tpu.models.sr_module import _dihedral_ensemble

            loaded = load_fusion(s, args.checkpoint_dir)
            if loaded is None:
                print(json.dumps({"model": name, "skipped": "no FUSION.json"}))
                continue
            members, weights = loaded
            out_b = None
            for m, w in zip(members, weights):
                if m == "bicubic":
                    y = resize_bicubic_up(lr_b, s)
                else:
                    module, params = build_model(m, s, args.checkpoint_dir)
                    fn = lambda x, mo=module, pa=params: mo.apply(pa, x)
                    y = _dihedral_ensemble(fn, lr_b) if ensemble else fn(lr_b)
                out_b = y * w if out_b is None else out_b + y * w
            trained = True
        elif bare == "zssr":
            # Per-image adaptation ceiling probe: fine-tune the quality
            # prior on the LR input itself (never touches the HR truth).
            from srs_tpu.models.sr_module import _dihedral_ensemble
            from srs_tpu.models.train import zssr_finetune

            prior = "edsr_l" if is_pretrained("edsr_l", s, args.checkpoint_dir) else "espcn"
            module, params = build_model(prior, s, args.checkpoint_dir)
            tuned = zssr_finetune(module, params, lr, scale=s,
                                  steps=args.zssr_steps, lr=1e-4)
            fn = lambda x: module.apply(tuned, x)
            out_b = _dihedral_ensemble(fn, lr_b) if ensemble else fn(lr_b)
            trained = True
        else:
            trained = is_pretrained(bare, s, args.checkpoint_dir)
            module, params = build_model(bare, s, args.checkpoint_dir)
            if ensemble:
                from srs_tpu.models.sr_module import _dihedral_ensemble

                out_b = _dihedral_ensemble(lambda x: module.apply(params, x), lr_b)
            else:
                out_b = module.apply(params, lr_b)
        if ibp:
            from srs_tpu.models.nets import back_project

            out_b = back_project(out_b, lr_b, s, steps=8, degradation="area")
        out = np.clip(np.asarray(out_b)[0], 0, 255)
        p = psnr(out, hr)
        row = {"model": name, "psnr": round(p, 3),
               "delta": round(p - base, 3), "trained": bool(trained)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    tag = "" if args.degrade == "none" else f" + {args.degrade}"
    print(f"\ngrace_hopper x{s} (INTER_AREA degradation{tag})")
    print("model            PSNR     vs bicubic")
    for r in rows:
        print(f"{r['model']:<16} {r['psnr']:6.2f}  {r['delta']:+.2f} dB")


if __name__ == "__main__":
    main()
