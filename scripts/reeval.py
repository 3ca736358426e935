"""Re-run the held-out eval panel for already-trained packaged checkpoints
and merge the numbers into EVAL.json (no training).

Exists because eval code evolves after a net is trained — e.g. the robust
degraded panel once sampled the clean-passthrough arm (degrade() drew one
Bernoulli per batch), making psnr_net_degraded == psnr_net. Rerunning the
eval is seconds; retraining is an hour.

    python scripts/reeval.py [--cpu] [--only edsr_l_robust_x2,...] [out_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = list(sys.argv[1:])
    if "--cpu" in argv:
        argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    out_dir = argv[0] if argv else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "srs_tpu", "models", "checkpoints",
    )

    from srs_tpu.models.evaljson import update_eval
    from srs_tpu.models.registry import MODEL_REGISTRY, build_model, is_pretrained
    from srs_tpu.models.train import eval_on_holdout

    for name in sorted(MODEL_REGISTRY):
        for scale in (1, 2, 3, 4):
            tag = f"{name}_x{scale}"
            if only is not None and tag not in only:
                continue
            if scale == 1 or not is_pretrained(name, scale, out_dir):
                continue
            module, params = build_model(name, scale, out_dir)
            t0 = time.time()
            stats = eval_on_holdout(module, params, scale, n=12, size=256)
            if "robust" in name:
                deg = eval_on_holdout(
                    module, params, scale, n=12, size=256, degradation="robust"
                )
                stats["psnr_net_degraded"] = deg["psnr_net"]
                stats["psnr_bicubic_degraded"] = deg["psnr_bicubic"]
            # same weights, fresher eval code: merge — training provenance
            # and the derived evidence blocks (photo_panel, cond_panel)
            # remain valid and untouched
            update_eval(out_dir, tag, stats)
            print(f"[{tag}] {json.dumps(stats)} ({time.time()-t0:.1f}s)",
                  flush=True)
    print("updated", os.path.join(out_dir, "EVAL.json"))


if __name__ == "__main__":
    main()
