"""Generated-image naturalness: calibrated NIQE of ARK 2K samples.

VERDICT r3 #4's done-criterion: generated-2K calibrated NIQE within ~2 of
a real photograph (round 3 measured 11.4-11.8 vs 6.6 for a real photo —
an honest signal that the 64px-base samples carried no real synthesized
high-resolution content). Protocol:

1. Generate a 2K sample per prompt (learned backend; optional --refine
   A/B runs the SDEdit native-resolution pass too).
2. Score calibrated NIQE on random 512px crops of each 2K image (the
   same whole-image feature path bench.py's fullres panel uses).
3. Reference row: the held-out real portrait's NIQE on the same scale.

Writes gen2k_niqe{,_refined} into checkpoints/EVAL.json under ark_gen_x1.

    python scripts/gen_quality.py [--prompts a,b] [--refine] [--crops 4]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROMPTS = [
    "misty mountain landscape photo",
    "product shot of a leather bag",
    "woven fabric texture",
    "studio gradient with glossy highlights",
]


def niqe_of(img: np.ndarray, crops: int, rng: np.random.Generator):
    import jax.numpy as jnp

    from srs_tpu.qa.niqe import niqe_scores

    h, w = img.shape[:2]
    side = min(512, h, w)
    vals = []
    for _ in range(crops):
        y = int(rng.integers(0, h - side + 1))
        x = int(rng.integers(0, w - side + 1))
        v = niqe_scores(jnp.asarray(img[y:y + side, x:x + side])[None])
        if v and v[0] is not None:
            vals.append(float(v[0]))
    return float(np.mean(vals)) if vals else None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompts", default=None)
    ap.add_argument("--refine", action="store_true",
                    help="also score the SDEdit-refined variant (A/B)")
    ap.add_argument("--crops", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", default="2K")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-write", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from srs_tpu.models.generate import ARKImageConfig, ARKImageGenerator
    from srs_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    prompts = args.prompts.split(",") if args.prompts else PROMPTS
    rng = np.random.default_rng(11)
    gen = ARKImageGenerator()

    def run(refine: bool):
        vals = []
        for p in prompts:
            cfg = ARKImageConfig(size=args.size, seed=1234,
                                 extra={"steps": args.steps,
                                        **({"refine": True} if refine else {})})
            r = gen.generate(p, cfg)
            assert r.metadata.get("model") != "procedural-v1", (
                "learned backend unavailable")
            v = niqe_of(np.asarray(r.image, np.float32), args.crops, rng)
            print(f"{'refined ' if refine else ''}{p!r}: niqe {v and round(v, 2)}"
                  f" (base {r.metadata.get('base_size')},"
                  f" ladder {r.metadata.get('sr_ladder')})", flush=True)
            if v is not None:
                vals.append(v)
        return float(np.mean(vals)) if vals else None

    base_niqe = run(False)
    refined_niqe = run(True) if args.refine else None

    # real-photo reference on the same scale (the strict holdout portrait)
    import matplotlib
    from PIL import Image

    gh = os.path.join(os.path.dirname(os.path.abspath(matplotlib.__file__)),
                      "mpl-data", "sample_data", "grace_hopper.jpg")
    real = np.asarray(Image.open(gh).convert("RGB"), np.float32)
    real_niqe = niqe_of(real, min(args.crops, 2), rng)

    out = {"gen2k_niqe": base_niqe, "real_photo_niqe": real_niqe,
           "gen2k_prompts": len(prompts), "gen2k_crops": args.crops}
    if refined_niqe is not None:
        out["gen2k_niqe_refined"] = refined_niqe
    print(json.dumps(out))

    if not args.no_write:
        from srs_tpu.models.evaljson import packaged_eval_dir, update_eval

        update_eval(packaged_eval_dir(), "ark_gen_x1",
                    {k: v for k, v in out.items() if v is not None})
        print("EVAL.json updated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
