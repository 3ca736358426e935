#!/usr/bin/env python
"""Train the ARK conditional diffusion generator (models/generative.py).

Replaces the procedural stand-in behind the ARK text-to-image API
(reference: ark_api_module.py:17-96) with a learned class-conditional
model. Trains on the 8-family class-labelled corpus, saves the EMA
params as checkpoint ``ark_gen_x1``, and records an EVAL.json entry.

Usage:
  python scripts/train_ark.py --steps 40000 --out /root/repo/srs_tpu/models/checkpoints
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40000)
    ap.add_argument("--n-per-class", type=int, default=384)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--base", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--scan-chunk", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="checkpoint dir (default: ~/.cache/srs_tpu/checkpoints)")
    ap.add_argument("--init-from", default=None,
                    help="warm-start from an ark_gen_x1 checkpoint dir "
                    "(params are resolution-agnostic: a 64px model can "
                    "seed a 128px run)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from srs_tpu.utils.tpu_guard import require_tpu

        require_tpu()

    from srs_tpu.models.generative import make_class_corpus, train_ark
    from srs_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    out = args.out or os.path.expanduser("~/.cache/srs_tpu/checkpoints")
    t0 = time.time()
    print(f"[ark] rendering class corpus ({args.n_per_class}/class @ {args.size}px)...",
          flush=True)
    corpus = make_class_corpus(args.n_per_class, args.size, args.seed)
    print(f"[ark] corpus {corpus[0].shape} in {time.time()-t0:.1f}s", flush=True)

    tlog = time.time()
    slog = 0

    def log(step, loss):
        # log points arrive every ~1000 steps (train_ark gates the loss
        # fetch); rate from the step delta, not scan_chunk
        nonlocal tlog, slog
        now = time.time()
        print(f"[ark] step {step}/{args.steps} loss {loss:.5f} "
              f"({(step - slog) / max(now - tlog, 1e-9):.1f} steps/s)", flush=True)
        tlog, slog = now, step

    module, ema, loss = train_ark(
        steps=args.steps, n_per_class=args.n_per_class, size=args.size,
        base=args.base, batch=args.batch, lr=args.lr,
        scan_chunk=args.scan_chunk, seed=args.seed,
        checkpoint_dir=out, log_fn=log, corpus=corpus,
        init_from=args.init_from,
    )
    dt = time.time() - t0
    print(f"[ark] done: final loss {loss:.5f} in {dt:.0f}s -> {out}/ark_gen_x1")

    entry = {
        "final_loss": loss,
        "steps": args.steps,
        "base": args.base,
        "size": args.size,
        "n_per_class": args.n_per_class,
        "train_seconds": dt,
    }
    try:
        from srs_tpu.models.evaljson import update_eval

        # replace: every other ark field (class acc, gen2k NIQE) is
        # derived from the weights this run just replaced
        update_eval(out, "ark_gen_x1", entry, replace=True)
        print(f"[ark] EVAL.json updated: {entry}")
    except Exception as e:
        print(f"[ark] EVAL.json update failed: {e}")


if __name__ == "__main__":
    main()
