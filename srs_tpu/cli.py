"""Command-line interface.

The reference has no CLI (entry is an asyncio `main()` demo, main.py:444-480,
plus Windows start scripts for the WebUI); this provides the equivalent
operational surface: `srs-tpu process`, `srs-tpu bench`, `srs-tpu webui`,
`srs-tpu info`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _cmd_process(args: argparse.Namespace) -> int:
    from .pipeline import PipelineConfig, SuperResolutionPipeline

    mesh_shape = None
    if args.mesh:
        # "data=4,space=2" -> {"data": 4, "space": 2}
        mesh_shape = {
            k.strip(): int(v)
            for k, v in (part.split("=") for part in args.mesh.split(","))
        }
    cfg = PipelineConfig(
        block_size=args.block_size,
        overlap_ratio=args.overlap,
        target_resolution=args.target,
        provider=args.provider,
        quality_model=args.quality_model,
        blend_method=args.blend,
        enable_qa=not args.no_qa,
        ibp_steps=args.steps,
        zssr_steps=args.zssr_steps,
        mesh_shape=mesh_shape,
        bit_depth=args.bit_depth,
        enable_seam_repair=args.seam_repair,
        enable_color_correction=args.color_correction,
        enable_checkpoint=args.checkpoint,
        content_aware=args.content_aware,
        self_ensemble=args.self_ensemble,
        per_scale_selection=not args.pin_quality_model,
    )
    pipe = SuperResolutionPipeline(cfg)
    if args.profile:
        from .utils.profiling import device_trace

        with device_trace(args.profile):
            result = pipe.process(args.input, args.output, prompt=args.prompt)
        print(f"profiler trace written to {args.profile} (view with xprof/TensorBoard)")
    else:
        result = pipe.process(args.input, args.output, prompt=args.prompt)
    if result.success:
        print(f"OK {result.output_path} ({result.processing_time:.1f}s, "
              f"{result.total_blocks} tiles)")
        if result.quality_score is not None:
            print(f"quality score: {result.quality_score:.1f}/100")
        for k, v in result.stage_times.items():
            print(f"  {k}: {v:.2f}s")
        return 0
    print(f"FAILED: {result.error_message}", file=sys.stderr)
    return 1


def _cmd_bench(args: argparse.Namespace) -> int:
    import bench as _b  # repo-root bench

    _b.main()
    return 0


def _cmd_webui(args: argparse.Namespace) -> int:
    import subprocess

    from .webui import app

    return subprocess.call(
        [sys.executable, "-m", "streamlit", "run", app.__file__, "--server.port", str(args.port)]
    )


def _cmd_train(args: argparse.Namespace) -> int:
    from .config import ModelConfig
    from .models.train import train_from_images, train_synthetic

    ckpt = args.checkpoint_dir or ModelConfig().checkpoint_dir
    if args.synthetic:
        _, loss = train_synthetic(
            args.model, args.scale, steps=args.steps, corpus_n=args.corpus_n,
            patch=args.patch, batch=args.batch, lr=args.lr, checkpoint_dir=ckpt,
        )
    elif args.images:
        _, loss = train_from_images(
            args.images, args.model, args.scale, steps=args.steps,
            patch=args.patch, batch=args.batch, lr=args.lr, checkpoint_dir=ckpt,
        )
    else:
        print("provide HR image files or --synthetic", file=sys.stderr)
        return 2
    print(f"trained {args.model} x{args.scale}: final loss {loss:.4f}; "
          f"checkpoint in {ckpt}")
    return 0


def _cmd_warmup(args: argparse.Namespace) -> int:
    """Pre-compile a config's programs into the persistent XLA cache.

    First compiles of a new shape take minutes through this environment's
    remote compile helper; running warmup ahead of time (e.g. at deploy)
    makes the first real job start instantly."""
    import tempfile
    import time

    import numpy as np

    from .pipeline import PipelineConfig, SuperResolutionPipeline

    w, h = map(int, args.source.lower().split("x"))
    rng = np.random.default_rng(0)
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    cfg = PipelineConfig(
        block_size=args.block_size,
        target_resolution=args.target,
        provider=args.provider,
        quality_model=args.quality_model,
        bit_depth=args.bit_depth,
        enable_qa=True,
    )
    pipe = SuperResolutionPipeline(cfg)
    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        r = pipe.process(img, os.path.join(td, "warmup.tiff"))
    if not r.success:
        print(f"warmup FAILED: {r.error_message}", file=sys.stderr)
        return 1
    print(f"warmed {args.source} -> {args.target} ({args.provider}/"
          f"{args.quality_model}, block {args.block_size}, {args.bit_depth}-bit) "
          f"in {time.time() - t0:.1f}s; subsequent runs hit the compile cache")
    return 0


def _cmd_generate(args: argparse.Namespace) -> int:
    """Text-to-image via the learned ARK generator (reference analog:
    ark_api_module.py generate endpoint); falls back to the procedural
    synthesizer when no ark_gen checkpoint is packaged."""
    import numpy as np

    from .models.generate import ARKImageConfig, ARKImageGenerator

    cfg = ARKImageConfig(
        size=args.size,
        watermark=args.watermark,
        seed=args.seed,
        guidance_scale=args.guidance,
        extra={"steps": args.steps,
               **({"category": args.category} if args.category else {})},
    )
    r = ARKImageGenerator().generate(args.prompt, cfg)
    img = r.image
    if hasattr(img, "save"):
        img.save(args.output)
    else:  # PIL unavailable: raw npy
        np.save(args.output, np.asarray(img))
    print(f"OK {args.output} {r.size[0]}x{r.size[1]} "
          f"({r.metadata.get('model')}, class={r.metadata.get('class', '-')}, "
          f"seed={r.seed}, {r.processing_time:.1f}s)")
    return 0


def _cmd_info(args: argparse.Namespace) -> int:
    import jax

    from . import __version__
    from .config import SystemConfig

    from .models.registry import MODEL_REGISTRY, PACKAGED_CHECKPOINT_DIR

    models = {}
    for name, spec in MODEL_REGISTRY.items():
        trained = sorted(
            int(d.rsplit("_x", 1)[1])
            for d in os.listdir(PACKAGED_CHECKPOINT_DIR)
            if os.path.isdir(os.path.join(PACKAGED_CHECKPOINT_DIR, d))
            and d.rsplit("_x", 1)[0] == name and d.rsplit("_x", 1)[1].isdigit()
        ) if os.path.isdir(PACKAGED_CHECKPOINT_DIR) else []
        models[name] = {
            "description": spec.description,
            "trained_scales": trained or "untrained (bicubic floor + IBP)",
        }
    info = {
        "version": __version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "models": models,
        "config": SystemConfig.from_env().to_dict() if args.config else "use --config",
    }
    print(json.dumps(info, indent=2, default=str))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="srs-tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("process", help="super-resolve an image")
    pp.add_argument("input")
    pp.add_argument("output")
    pp.add_argument("--target", default="100MP", help="100MP|150MP|200MP|WxH")
    pp.add_argument("--block-size", type=int, default=512)
    pp.add_argument("--overlap", type=float, default=0.2)
    pp.add_argument("--provider", default="quality",
                    choices=["quality", "fast", "hybrid", "bicubic", "zssr",
                             "fusion"])
    pp.add_argument("--blend", default="laplacian",
                    choices=["laplacian", "multi_band", "weighted", "feather",
                             "gradient_domain", "poisson"])
    pp.add_argument("--quality-model", default="edsr_xl",
                    choices=["edsr_m", "edsr_l", "edsr_xl", "edsr_l_robust",
                             "rcan", "espcn"],
                    help="registry net for the quality tier (the fallback "
                         "when per-scale selection has no panel evidence)")
    pp.add_argument("--pin-quality-model", action="store_true",
                    help="disable per-scale panel-best selection and serve "
                         "--quality-model for every ladder step")
    pp.add_argument("--steps", type=int, default=8, help="back-projection steps")
    pp.add_argument("--zssr-steps", type=int, default=150,
                    help="self-supervised fine-tune steps for --provider zssr")
    pp.add_argument("--mesh", default=None,
                    help="device mesh, e.g. 'data=4,space=2' (default: single device)")
    pp.add_argument("--bit-depth", type=int, default=8, choices=[8, 16],
                    help="output bit depth (16 requires TIFF output)")
    pp.add_argument("--seam-repair", action="store_true",
                    help="post-blend seam QA + repair pass")
    pp.add_argument("--color-correction", action="store_true",
                    help="histogram-match output colors to the source")
    pp.add_argument("--checkpoint", action="store_true",
                    help="persist upscaled tiles for kill-resume (costs host-link traffic)")
    pp.add_argument("--content-aware", action="store_true",
                    help="seam placement avoids faces/text/salient regions")
    pp.add_argument("--self-ensemble", action="store_true",
                    help="average the net over the 8 dihedral tile "
                         "transforms (EDSR '+': ~+0.3 dB, 8x SR compute)")
    pp.add_argument("--prompt", default=None,
                    help="prompt text; a template category name (beauty, 3c, "
                    "food, ...) steers the conditioned polish")
    pp.add_argument("--no-qa", action="store_true")
    pp.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler device trace into DIR")
    pp.set_defaults(fn=_cmd_process)

    pb = sub.add_parser("bench", help="run the 720p->100MP benchmark")
    pb.set_defaults(fn=_cmd_bench)

    pwu = sub.add_parser("warmup", help="pre-compile a config into the XLA cache")
    pwu.add_argument("--source", default="1280x720", help="input WxH")
    pwu.add_argument("--target", default="100MP")
    pwu.add_argument("--block-size", type=int, default=512)
    pwu.add_argument("--provider", default="quality")
    pwu.add_argument("--quality-model", default="edsr_xl")
    pwu.add_argument("--bit-depth", type=int, default=8, choices=[8, 16])
    pwu.set_defaults(fn=_cmd_warmup)

    pw = sub.add_parser("webui", help="launch the Streamlit UI")
    pw.add_argument("--port", type=int, default=8501)
    pw.set_defaults(fn=_cmd_webui)

    pt = sub.add_parser("train", help="train an SR model on HR images")
    pt.add_argument("images", nargs="*", help="HR image files")
    pt.add_argument("--synthetic", action="store_true",
                    help="train on the procedural corpus (no images needed)")
    pt.add_argument("--corpus-n", type=int, default=256,
                    help="procedural corpus size for --synthetic")
    pt.add_argument("--model", default="espcn", help="registry model name")
    pt.add_argument("--scale", type=int, default=2)
    pt.add_argument("--steps", type=int, default=2000)
    pt.add_argument("--patch", type=int, default=48)
    pt.add_argument("--batch", type=int, default=32)
    pt.add_argument("--lr", type=float, default=2e-4)
    pt.add_argument("--checkpoint-dir", default=None,
                    help="defaults to ModelConfig.checkpoint_dir")
    pt.set_defaults(fn=_cmd_train)

    pg = sub.add_parser("generate", help="text-to-image (learned ARK analog)")
    pg.add_argument("prompt")
    pg.add_argument("output")
    pg.add_argument("--size", default="2K", help="1K|2K|4K|WxH")
    pg.add_argument("--seed", type=int, default=None)
    pg.add_argument("--guidance", type=float, default=7.5,
                    help="classifier-free guidance (reference-scale default)")
    pg.add_argument("--steps", type=int, default=50, help="DDIM steps")
    pg.add_argument("--category", default=None,
                    help="industry template category conditioning the class")
    pg.add_argument("--watermark", action="store_true")
    pg.set_defaults(fn=_cmd_generate)

    pi = sub.add_parser("info", help="environment and config info")
    pi.add_argument("--config", action="store_true")
    pi.set_defaults(fn=_cmd_info)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
