#!/usr/bin/env python
"""Quantitative eval of the ARK conditional generator.

Measures what the visual grid shows: that the class conditioning steers
the sampled distribution. Protocol:

1. Fit per-class feature centroids on REAL renders (render_class) using
   simple image statistics (color moments, gradient energy, radial
   spectral bands, histogram entropy), z-scored over the real pool.
2. Sample K images per class from the packaged model (DDIM, CFG).
3. Class accuracy = fraction of samples whose nearest centroid is their
   conditioning class (chance = 1/8), plus a mode-collapse check: mean
   pairwise within-class feature distance of samples vs real renders.

Writes the numbers into checkpoints/EVAL.json under ark_gen_x1.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def features(img: np.ndarray) -> np.ndarray:
    """13-dim statistic vector of a [S,S,3] float image in [0,255]."""
    g = img.mean(-1)
    gy, gx = np.gradient(g)
    gm = np.hypot(gx, gy)
    f = np.fft.rfft2(g - g.mean())
    p = np.abs(f) ** 2
    h, w = p.shape
    yy = np.minimum(np.arange(h), h - np.arange(h))[:, None] / (h / 2)
    xx = (np.arange(w) / w)[None, :]
    r = np.hypot(yy, xx)
    bands = [
        np.log1p(p[(r >= lo) & (r < hi)].mean() + 1e-9)
        for lo, hi in ((0, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 2.0))
    ]
    hist, _ = np.histogram(g, 32, (0, 255))
    q = hist / max(hist.sum(), 1)
    ent = -(q[q > 0] * np.log(q[q > 0])).sum()
    return np.array(
        [*img.mean((0, 1)), *img.std((0, 1)), gm.mean(), gm.std(), *bands, ent],
        np.float64,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8, help="samples per class")
    ap.add_argument("--real-n", type=int, default=24, help="real renders per class")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=2.0)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--size", type=int, default=None,
                    help="sample size (default: the checkpoint's native "
                    "trained size from ark_meta.json)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-write", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from srs_tpu.models.generative import (ARK_CLASSES, ark_meta, build_ark,
                                           render_class, sample_ark)
    from srs_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    if args.checkpoint_dir:
        # an explicit dir must hold the checkpoint: the packaged fallback
        # once silently graded the OLD model after a failed train (r5)
        marker = os.path.join(args.checkpoint_dir, "ark_gen_x1",
                              "_CHECKPOINT_METADATA")
        if not os.path.isfile(marker):
            print(f"no committed ark_gen_x1 checkpoint in "
                  f"{args.checkpoint_dir}; refusing the packaged fallback",
                  file=sys.stderr)
            return 1
    module, params, trained = build_ark(args.checkpoint_dir)
    if not trained:
        print("no packaged ark_gen checkpoint", file=sys.stderr)
        return 1
    size = args.size or ark_meta(args.checkpoint_dir)["size"]
    print(f"eval at {size}px (native trained size)")

    ncls = len(ARK_CLASSES)
    real = np.stack(
        [features(render_class(1000 + i, c, size))
         for c in range(ncls) for i in range(args.real_n)]
    ).reshape(ncls, args.real_n, -1)
    mu = real.reshape(-1, real.shape[-1]).mean(0)
    sd = real.reshape(-1, real.shape[-1]).std(0) + 1e-9
    realz = (real - mu) / sd
    cent = realz.mean(1)  # [ncls, D]

    correct, div_s, div_r = 0, [], []
    for c in range(ncls):
        s = sample_ark(module, params, c, jax.random.PRNGKey(7000 + c),
                       size=size, steps=args.steps, guidance=args.guidance,
                       batch=args.k)
        fz = (np.stack([features(np.asarray(x)) for x in np.asarray(s)]) - mu) / sd
        pred = np.argmin(((fz[:, None] - cent[None]) ** 2).sum(-1), axis=1)
        hits = int((pred == c).sum())
        correct += hits
        dd = lambda z: float(np.mean(
            [np.linalg.norm(a - b) for i, a in enumerate(z) for b in z[i + 1:]]
        ))
        div_s.append(dd(fz))
        div_r.append(dd(realz[c][: args.k]))
        print(f"{ARK_CLASSES[c]:9s} acc {hits}/{args.k}  "
              f"diversity {div_s[-1]:.2f} (real {div_r[-1]:.2f})")
    acc = correct / (ncls * args.k)
    div_ratio = float(np.mean(div_s) / max(np.mean(div_r), 1e-9))
    print(f"class accuracy {acc:.3f} (chance {1/ncls:.3f}); "
          f"within-class diversity ratio vs real {div_ratio:.2f}")

    if not args.no_write:
        from srs_tpu.models.evaljson import packaged_eval_dir, update_eval

        update_eval(
            packaged_eval_dir(), "ark_gen_x1",
            {"class_accuracy": acc, "chance": 1 / ncls,
             "diversity_ratio_vs_real": div_ratio,
             "eval_k": args.k, "eval_steps": args.steps,
             "eval_guidance": args.guidance, "eval_size": size},
        )
        print("EVAL.json updated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
