"""Pretrain the registry SR nets on the procedural corpus and save the
packaged checkpoints (srs_tpu/models/checkpoints/). Run on the real TPU:

    python scripts/pretrain.py [out_dir]

Writes one orbax checkpoint per (model, scale) plus a JSON eval panel
(held-out PSNR vs bicubic / bicubic+IBP) next to them.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srs_tpu.models.registry import MODEL_REGISTRY  # noqa: E402
from srs_tpu.models.train import eval_on_holdout, train_synthetic  # noqa: E402

CONFIGS = [
    # (model, scale, steps[, degradation]). ~35 ms/step on the tunneled
    # v5e chip; the held-out panel keeps improving past 20k steps.
    # Select a subset with: python scripts/pretrain.py --only espcn_x4,edsr_m_x4
    ("espcn", 2, 30000),
    ("espcn", 3, 30000),
    ("espcn", 4, 30000),
    ("edsr_m", 2, 40000),
    ("edsr_m", 3, 40000),
    ("edsr_m", 4, 40000),
    ("rcan", 2, 40000),
    ("rcan", 3, 40000),
    ("rcan", 4, 40000),
    ("edsr_l", 2, 40000),
    ("edsr_l", 3, 40000),
    ("edsr_xl", 2, 40000),
    ("edsr_xl", 3, 40000),
    ("edsr_xl", 4, 40000),
    ("edsr_l_robust", 2, 40000, "robust"),
    ("edsr_l_robust", 3, 40000, "robust"),
    # texture tier: fine-tune FROM the packaged edsr_l on the "tex" mix —
    # run with --mix tex --init-from <dir holding edsr_l_tex_x2 seeded
    # from edsr_l_x2> (scripts/round5e_fleet.sh stages the seed copy)
    ("edsr_l_tex", 2, 25000),
]

CORPUS_N = 3072
CORPUS_SIZE = 256
# Round-3 default: the photo-statistics mix (real bundled photos +
# render_photo + legacy procedural families) — the round-2 verdict's
# generalization fix. "proc" reproduces the round-1/2 corpus.
CORPUS_MIX = "v3"


def load_corpus(n: int = CORPUS_N, size: int = CORPUS_SIZE, seed: int = 0,
                mix: str = CORPUS_MIX):
    """Cached corpus (generation is minutes of host-side cv2)."""
    import numpy as np

    from srs_tpu.models.corpus import make_corpus

    tag = f"{mix}_" if mix != "proc" else ""
    if mix != "proc":
        # photo-bearing mixes: key the cache on the bundled-photo set so
        # widening PHOTO_SOURCES invalidates stale corpora
        from srs_tpu.models.photo_data import photo_paths

        tag += f"p{len(photo_paths())}_"
    cache = f"/tmp/srs_corpus_{tag}{n}_{size}_{seed}.npy"
    if os.path.exists(cache):
        return np.load(cache)
    t0 = time.time()
    corpus = make_corpus(n, size, seed=seed, mix=mix)
    np.save(cache, corpus)
    print(f"corpus: {corpus.shape} in {time.time()-t0:.1f}s", flush=True)
    return corpus


def main() -> None:
    argv = [a for a in sys.argv[1:]]
    only = None
    steps_override = None
    corpus_n = CORPUS_N
    mix = CORPUS_MIX
    if "--only" in argv:
        i = argv.index("--only")
        only = list(argv[i + 1].split(","))
        del argv[i : i + 2]
    if "--steps" in argv:
        i = argv.index("--steps")
        steps_override = int(argv[i + 1])
        del argv[i : i + 2]
    steps_map = {}
    if "--steps-map" in argv:
        # per-net step counts for multi-net invocations, e.g.
        #   --steps-map edsr_xl_x2=100000,edsr_l_x2=60000
        # (one process = ONE corpus upload on the tunneled link)
        i = argv.index("--steps-map")
        for kv in argv[i + 1].split(","):
            k, v = kv.split("=")
            steps_map[k] = int(v)
        del argv[i : i + 2]
    skip_existing = False
    if "--skip-existing" in argv:
        skip_existing = True
        argv.remove("--skip-existing")
    if "--corpus-n" in argv:
        i = argv.index("--corpus-n")
        corpus_n = int(argv[i + 1])
        del argv[i : i + 2]
    if "--mix" in argv:
        i = argv.index("--mix")
        mix = argv[i + 1]
        del argv[i : i + 2]
    grain = 0.0
    if "--grain" in argv:
        i = argv.index("--grain")
        grain = float(argv[i + 1])
        del argv[i : i + 2]
    init_from = None
    if "--init-from" in argv:
        i = argv.index("--init-from")
        init_from = argv[i + 1]
        del argv[i : i + 2]
    lr = 2e-4
    if "--lr" in argv:
        i = argv.index("--lr")
        lr = float(argv[i + 1])
        del argv[i : i + 2]
    out_dir = argv[0] if argv else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "srs_tpu", "models", "checkpoints",
    )
    os.makedirs(out_dir, exist_ok=True)
    corpus = load_corpus(n=corpus_n, mix=mix)
    # Upload ONCE per process, as uint8 (4x fewer bytes than f32; photo
    # sources are 8-bit anyway and procedural renders lose only +-0.5
    # quantization noise, ~50 dB below the training targets). Patches are
    # dequantized to f32 on device inside train_synthetic.
    import jax
    import numpy as np

    from srs_tpu.utils.tpu_guard import require_tpu

    require_tpu()

    t0 = time.time()
    corpus = jax.device_put(
        np.clip(np.round(corpus), 0, 255).astype(np.uint8)
    )
    corpus.block_until_ready()
    mb = corpus.size / 1e6
    dt = time.time() - t0
    print(f"corpus h2d: {mb:.0f} MB in {dt:.1f}s ({mb/max(dt,1e-9):.1f} MB/s)",
          flush=True)
    # Merge into the existing eval ledger so partial runs accumulate
    # (field-level merge; see srs_tpu/models/evaljson.py).
    from srs_tpu.models.evaljson import (DERIVED_EVIDENCE, load_eval,
                                         update_eval)

    panel = load_eval(out_dir)
    if only is None:
        configs = list(CONFIGS)
    else:
        # honor the --only ORDER: on a day where the fleet may be cut
        # short, the caller lists the highest-priority nets first
        by_key = {f"{c[0]}_x{c[1]}": c for c in CONFIGS}
        unknown = [k for k in only if k not in by_key]
        if unknown:
            # a typo'd --only must not exit 0 with nothing trained — the
            # fleet's .done marker would record a missing checkpoint as OK
            sys.exit(f"--only: unknown net keys {unknown}; "
                     f"valid: {sorted(by_key)}")
        configs = [by_key[k] for k in only]
    for k in steps_map:
        if not any(f"{c[0]}_x{c[1]}" == k for c in CONFIGS):
            print(f"WARNING: --steps-map key {k!r} matches no config; "
                  "ignored", flush=True)
    for cfg_row in configs:
        name, scale, steps = cfg_row[:3]
        if steps_override:
            steps = steps_override
        steps = steps_map.get(f"{name}_x{scale}", steps)
        # skip only on a COMMITTED orbax save: a run killed mid-save leaves
        # a partial directory that a bare isdir would skip forever
        ck_meta = os.path.join(out_dir, f"{name}_x{scale}", "_CHECKPOINT_METADATA")
        if skip_existing and os.path.isfile(ck_meta) \
                and f"{name}_x{scale}" in panel:
            print(f"[{name}_x{scale}] skip: checkpoint exists", flush=True)
            continue
        degradation = cfg_row[3] if len(cfg_row) > 3 else "area"
        t0 = time.time()
        params, loss = train_synthetic(
            name, scale, steps=steps, corpus_n=corpus_n, corpus_size=CORPUS_SIZE,
            patch=48, batch=32, lr=lr, checkpoint_dir=out_dir,
            scan_chunk=50, corpus=corpus, degradation=degradation,
            hr_grain=grain, init_from=init_from,
            log_fn=lambda s, l, n=name, sc=scale, t=t0: print(
                f"[{n}_x{sc}] step {s}: loss {l:.5f} ({time.time()-t:.0f}s)",
                flush=True)
            if s % 1000 == 0 else None,
        )
        spec = MODEL_REGISTRY[name]
        kwargs = dict(spec.kwargs)
        kwargs.setdefault("scale", scale)
        module = spec.ctor(**kwargs)
        stats = eval_on_holdout(module, params, scale, n=12, size=256)
        if degradation != "area":
            # also score on the matching degraded holdout (the robust
            # net's home turf) alongside the clean panel
            stats_deg = eval_on_holdout(
                module, params, scale, n=12, size=256, degradation=degradation
            )
            stats["psnr_net_degraded"] = stats_deg["psnr_net"]
            stats["psnr_bicubic_degraded"] = stats_deg["psnr_bicubic"]
        stats["final_loss"] = loss
        stats["train_seconds"] = time.time() - t0
        stats["degradation"] = degradation
        stats["mix"] = mix
        if grain:
            stats["hr_grain"] = grain
        if init_from:
            stats["init_from"] = init_from
        if lr != 2e-4:
            stats["lr"] = lr
        print(f"[{name}_x{scale}] {json.dumps(stats)}", flush=True)
        # write incrementally so a killed multi-net run keeps its finished
        # nets' entries; the weights just changed, so the stale derived
        # evidence blocks (photo panel, cond contract) are dropped — the
        # acceptance fleet re-measures them against the new checkpoint
        panel[f"{name}_x{scale}"] = update_eval(
            out_dir, f"{name}_x{scale}", stats, drop=DERIVED_EVIDENCE)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
