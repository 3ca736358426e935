"""Held-out REAL-PHOTOGRAPH eval panel (the generalization oracle).

Every quality number in EVAL.json / quality_bench.py lives on the
procedural corpus distribution; this script scores the packaged nets on
real photographs that are NEVER used for training or fitting anywhere in
the repo (enforced by tests/test_photo_holdout.py).

Round 4 (VERDICT r3 #2): the panel is now FOUR held-out images, not one —
matplotlib's portrait plus the three ``EVAL_HOLDOUT_SOURCES`` withheld
from the training pool (macro flower scene, two wood material textures).
Per-model output is the per-image delta vs bicubic and the panel
mean/min/max, so packaging gates stop living inside single-image noise.
All images are center-cropped to one common 420x504 shape so the TPU
compiles each net once per scale (this tunnel's compile helper takes
minutes per distinct shape). Degradation matches the corpus protocol:
cv2 INTER_AREA downsample.

    python scripts/photo_eval.py [--cpu] [--scale 2] [--models a,b,c]
                                 [--images portrait,flower,wood,darkwood]

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

# Common eval shape: fits the smallest panel image (flower, 427x640) with
# h, w multiples of 12 (divisible by every eval scale 2/3/4).
PANEL_H, PANEL_W = 420, 504


def _center_crop(img, h, w):
    ih, iw = img.shape[:2]
    y, x = max((ih - h) // 2, 0), max((iw - w) // 2, 0)
    return img[y : y + h, x : x + w]


def load_panel(names=None):
    """[(name, hr 420x504x3 float32)] — the 4-image held-out panel."""
    import numpy as np
    from PIL import Image

    from srs_tpu.models.photo_data import eval_photo_paths

    panel = [("portrait", np.asarray(
        Image.open(GRACE_HOPPER).convert("RGB"), np.float32))]
    for p in eval_photo_paths():
        base = os.path.basename(p).lower()
        tag = ("flower" if "flower" in base
               else "darkwood" if "darkwood" in base
               else "wood" if "wood" in base else os.path.splitext(base)[0])
        panel.append((tag, np.asarray(
            Image.open(p).convert("RGB"), np.float32)))
    out = []
    for tag, img in panel:
        if names and tag not in names:
            continue
        out.append((tag, np.ascontiguousarray(
            _center_crop(img, PANEL_H, PANEL_W), np.float32)))
    return out


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
    ap.add_argument("--images", type=str, default=None,
                    help="comma-set of panel image names "
                    "(portrait,flower,wood,darkwood); default all")
    ap.add_argument("--degrade", choices=["none", "noise", "blur"],
                    default="none",
                    help="damage the LR input like real capture defects "
                    "(the degradation router's triggers): the robust-tier "
                    "acceptance panel — both tiers must beat bicubic here")
    ap.add_argument("--write-eval", action="store_true",
                    help="record per-net photo_panel blocks into the "
                    "packaged EVAL.json (field-level merge; requires the "
                    "full default panel so blocks stay comparable)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import cv2
    import jax.numpy as jnp
    import numpy as np

    from srs_tpu.models.registry import build_model, is_pretrained
    from srs_tpu.ops.resize import resize_bicubic_up

    s = args.scale
    names = set(args.images.split(",")) if args.images else None
    panel = load_panel(names)
    assert panel, f"no panel images match {args.images!r}"

    # LR inputs + bicubic baselines, one per panel image (same shape ->
    # one TPU compile per net).
    lrs, bases = {}, {}
    for tag, hr in panel:
        lr = cv2.resize(hr, (hr.shape[1] // s, hr.shape[0] // s),
                        interpolation=cv2.INTER_AREA)
        if args.degrade == "noise":  # sensor-noise level that trips the router
            lr = np.clip(
                lr + np.random.default_rng(0).normal(0, 6, lr.shape), 0, 255
            ).astype(np.float32)
        elif args.degrade == "blur":
            lr = cv2.GaussianBlur(lr, (0, 0), 1.2)
        lrs[tag] = jnp.asarray(lr, jnp.float32)[None]
        bases[tag] = psnr(
            np.clip(np.asarray(resize_bicubic_up(lrs[tag], s))[0], 0, 255), hr)

    rows = [{
        "model": "bicubic", "mean_delta": 0.0,
        "per_image": {t: {"psnr": round(b, 3), "delta": 0.0}
                      for t, b in bases.items()},
    }]
    print(json.dumps(rows[0]), flush=True)

    def apply_row(name, lr_b):
        """One provider row on one LR input -> (out_batch, trained)."""
        ibp = name.endswith(":ibp")
        stem = name[: -len(":ibp")] if ibp else name
        ensemble = stem.endswith("+")  # "edsr_l+" = geometric self-ensemble
        bare = stem[:-1] if ensemble else stem
        if bare == "fusion":
            from srs_tpu.models.fusion import load_fusion
            from srs_tpu.models.sr_module import _dihedral_ensemble

            loaded = load_fusion(s, args.checkpoint_dir)
            if loaded is None:
                return None, False
            members, weights = loaded
            out_b = None
            for m, w in zip(members, weights):
                m_ens = ensemble or m.endswith("+")
                bare_m = m.rstrip("+")
                if bare_m == "bicubic":
                    y = resize_bicubic_up(lr_b, s)
                else:
                    module, params = build_model(bare_m, s, args.checkpoint_dir)
                    fn = lambda x, mo=module, pa=params: mo.apply(pa, x)
                    y = _dihedral_ensemble(fn, lr_b) if m_ens else fn(lr_b)
                out_b = y * w if out_b is None else out_b + y * w
            trained = True
        elif bare == "zssr":
            # Per-image adaptation ceiling probe: fine-tune the quality
            # prior on the LR input itself (never touches the HR truth).
            from srs_tpu.models.sr_module import _dihedral_ensemble
            from srs_tpu.models.train import zssr_finetune

            prior = next(
                (m for m in ("edsr_xl", "edsr_l")
                 if is_pretrained(m, s, args.checkpoint_dir)), "espcn")
            module, params = build_model(prior, s, args.checkpoint_dir)
            tuned = zssr_finetune(module, params, np.asarray(lr_b[0]), scale=s,
                                  steps=args.zssr_steps, lr=1e-4)
            fn = lambda x: module.apply(tuned, x)
            out_b = _dihedral_ensemble(fn, lr_b) if ensemble else fn(lr_b)
            trained = True
        else:
            trained = is_pretrained(bare, s, args.checkpoint_dir)
            module, params = build_model(bare, s, args.checkpoint_dir)
            if ensemble:
                from srs_tpu.models.sr_module import _dihedral_ensemble

                out_b = _dihedral_ensemble(
                    lambda x: module.apply(params, x), lr_b)
            else:
                out_b = module.apply(params, lr_b)
        if ibp:
            from srs_tpu.models.nets import back_project

            out_b = back_project(out_b, lr_b, s, steps=8, degradation="area")
        return out_b, trained

    for name in args.models.split(","):
        name = name.strip()
        if not name:
            continue
        per_image, trained, skipped = {}, False, None
        for tag, hr in panel:
            out_b, trained = apply_row(name, lrs[tag])
            if out_b is None:
                skipped = "no FUSION.json"
                break
            p = psnr(np.clip(np.asarray(out_b)[0], 0, 255), hr)
            per_image[tag] = {"psnr": round(p, 3),
                              "delta": round(p - bases[tag], 3)}
        if skipped:
            print(json.dumps({"model": name, "skipped": skipped}), flush=True)
            continue
        deltas = [v["delta"] for v in per_image.values()]
        row = {
            "model": name,
            "mean_delta": round(float(np.mean(deltas)), 3),
            "min_delta": round(float(np.min(deltas)), 3),
            "max_delta": round(float(np.max(deltas)), 3),
            "per_image": per_image,
            "trained": bool(trained),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

        # Durable acceptance record (VERDICT r4 weak #3): the panel block
        # lives next to the checkpoint it measured, merge-safe.
        if args.write_eval and names is None and ":ibp" not in name:
            import time as _time

            from srs_tpu.models.evaljson import (packaged_eval_dir,
                                                 update_eval)

            ensemble = name.endswith("+")
            bare = name[:-1] if ensemble else name
            field = "photo_panel" + ("_ensemble" if ensemble else "")
            if args.degrade != "none":
                field += f"_{args.degrade}"
            block = {k: row[k] for k in
                     ("mean_delta", "min_delta", "max_delta", "per_image")}
            block["measured_utc"] = _time.strftime("%Y-%m-%d")
            update_eval(
                packaged_eval_dir(args.checkpoint_dir),
                f"{bare}_x{s}", {field: block},
            )

    tag = "" if args.degrade == "none" else f" + {args.degrade}"
    img_names = [t for t, _ in panel]
    print(f"\nheld-out photo panel x{s} (INTER_AREA degradation{tag}), "
          f"delta dB vs bicubic")
    print(f"{'model':<16} " + " ".join(f"{n:>9}" for n in img_names)
          + "      mean [min, max]")
    for r in rows:
        cells = " ".join(
            f"{r['per_image'][n]['delta']:+9.2f}" if n in r["per_image"]
            else " " * 9 for n in img_names)
        mn, mx = r.get("min_delta", 0.0), r.get("max_delta", 0.0)
        print(f"{r['model']:<16} {cells}    {r['mean_delta']:+6.2f} "
              f"[{mn:+.2f}, {mx:+.2f}]")


if __name__ == "__main__":
    main()
