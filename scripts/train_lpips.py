"""Train the LPIPS feature nets on the distortion ladder (ranking loss).

The reference loads torch-lpips pretrained VGG/Alex features
(quality_assessment_module.py:135-146, 419-465); zero egress means no
pretrained perceptual weights, so round 1/2 shipped deterministic RANDOM
features. This trains them: for a reference patch and two distortions of
the same kind at severities k1 < k2, the metric must satisfy
D(ref, d1) < D(ref, d2) — a 2AFC-style hinge on the distance difference
(the same supervision signal LPIPS itself was trained with, with the
severity ladder standing in for human judgments).

    python scripts/train_lpips.py [--net vgg,alex] [--steps 1500]

Saves orbax checkpoints to srs_tpu/models/checkpoints/lpips_{net} (the
packaged location LPIPSMetric probes) and prints a held-out ranking-
accuracy comparison vs the random-feature baseline.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED0 = 640_000  # disjoint from training/eval/fit seed ranges


def build_pairs(n_imgs: int, size: int, seed0: int):
    """(ref, d_lo, d_hi) float32 stacks from the fit_qa distortion ladder.

    Cached to /tmp: the render loop is host cv2 work that this single-core
    microVM occasionally stalls 10-25 s per image on (scheduler steal, not
    memory pressure) — a lost 90-minute fleet budget must not repeat it."""
    import numpy as np

    # keyed on the bundled-photo set: the v3 mix draws real photo mosaics,
    # so shrinking the training pool (round-4 eval holdout) must
    # invalidate stale pairs
    from srs_tpu.models.photo_data import photo_paths

    cache = (f"/tmp/srs_lpips_pairs_v2_{n_imgs}_{size}_{seed0}"
             f"_p{len(photo_paths())}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        return z["refs"], z["lows"], z["highs"]

    from scripts.fit_qa_models import distort  # reuse the ladder
    from srs_tpu.models.corpus import render_any

    refs, lows, highs = [], [], []
    rng = np.random.default_rng(seed0)
    kinds = ("blur", "noise", "jpeg", "upscale")
    for i in range(n_imgs):
        img = render_any(seed0 + i, size, mix="v3")
        for kind in kinds:
            k1, k2 = sorted(rng.choice(5, 2, replace=False) + 1)
            refs.append(img)
            lows.append(distort(img, kind, int(k1)))
            highs.append(distort(img, kind, int(k2)))
        # Cross-KIND pairs (v2): within-kind ordering is already at
        # ceiling for random features; what training must add is a
        # comparable scale ACROSS distortion kinds (the property human
        # 2AFC data gives torch-lpips). Severity gap >= 2 makes the
        # ground-truth ordering safe despite kinds not being perceptually
        # equated at equal level.
        for _ in range(4):
            ka, kb = rng.choice(4, 2, replace=False)
            sb = int(rng.integers(1, 4))  # 1..3
            sa = int(rng.integers(sb + 2, 6))  # sb+2 .. 5
            refs.append(img)
            lows.append(distort(img, kinds[kb], sb))
            highs.append(distort(img, kinds[ka], sa))
    out = (np.stack(refs).astype(np.float32),
           np.stack(lows).astype(np.float32),
           np.stack(highs).astype(np.float32))
    np.savez(cache, refs=out[0], lows=out[1], highs=out[2])
    return out


def ranking_accuracy(pair_acc_fn, refs, lows, highs, chunk: int = 32) -> float:
    """Fraction of triplets with D(ref,lo) < D(ref,hi).

    ``pair_acc_fn(r, lo, hi) -> [N] bool`` runs batched on device; one
    dispatch + one scalar fetch per chunk instead of two per triplet
    (the tunneled link makes 256 round trips minutes-long on bad days)."""
    ok, n = 0.0, len(refs)
    for i in range(0, n, chunk):
        ok += float(pair_acc_fn(refs[i:i + chunk], lows[i:i + chunk],
                                highs[i:i + chunk]).sum())
    return ok / n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", type=str, default="alex,vgg")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from srs_tpu.utils.tpu_guard import require_tpu

        require_tpu()

    # this tunnel's compile helper takes minutes per program — persist
    # every compile so a retried/killed run resumes through them
    from srs_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np
    import optax

    from srs_tpu.models.lpips import _ARCHS, _FeatureNet, _unit_normalize

    out_dir = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "srs_tpu", "models", "checkpoints",
    )

    print("building distortion pairs...", flush=True)
    refs, lows, highs = build_pairs(48, args.size, SEED0)
    h_refs, h_lows, h_highs = build_pairs(16, args.size, SEED0 + 10_000)
    n = len(refs)

    for net in args.net.split(","):
        net = net.strip()
        module = _FeatureNet(**_ARCHS[net])
        import zlib

        seed = zlib.crc32(net.encode()) % (2**31)
        # jit the init: eager flax init dispatches ~40 per-op programs and
        # each pays the remote compile helper (observed: 20+ min before
        # the first training line); one jitted program compiles once
        params = jax.jit(module.init)(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, args.size, args.size, 3), jnp.float32))

        def distance_p(p, a, b):
            an = a / 127.5 - 1.0
            bn = b / 127.5 - 1.0
            fa = module.apply(p, an)
            fb = module.apply(p, bn)
            total = 0.0
            for x, y in zip(fa, fb):
                d = _unit_normalize(x) - _unit_normalize(y)
                total = total + jnp.mean(jnp.sum(d * d, axis=-1), axis=(1, 2))
            return total / len(fa)  # [N]

        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr))
        opt_state = tx.init(params)

        def one_step(carry, key):
            # The pair stacks ride in the carry (device-resident): the
            # original per-step host upload was ~4.7 MB over the tunneled
            # ~30 MB/s link = ~6 s/step, 60x the compute time.
            params, opt_state, r_d, lo_d, hi_d = carry
            idx = jax.random.randint(key, (args.batch,), 0, n)
            r = jnp.take(r_d, idx, axis=0)
            lo = jnp.take(lo_d, idx, axis=0)
            hi = jnp.take(hi_d, idx, axis=0)

            def loss_fn(p):
                d_lo = distance_p(p, r, lo)
                d_hi = distance_p(p, r, hi)
                # 2AFC hinge: the higher severity must measure farther by a
                # margin proportional to the pair's scale (scale-free).
                m = 0.15 * jax.lax.stop_gradient(d_lo + d_hi) + 1e-4
                return jnp.mean(jax.nn.relu(d_lo - d_hi + m))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, r_d, lo_d, hi_d), loss

        chunk = 100

        @jax.jit
        def run_chunk(params, opt_state, r_d, lo_d, hi_d, key):
            keys = jax.random.split(key, chunk)
            (params, opt_state, *_), losses = jax.lax.scan(
                one_step, (params, opt_state, r_d, lo_d, hi_d), keys
            )
            return params, opt_state, jnp.mean(losses)

        @jax.jit
        def pair_acc(p, r, lo, hi):
            return distance_p(p, r, lo) < distance_p(p, r, hi)

        # uint8 once-per-process upload (4x fewer bytes over the tunnel;
        # the distortion stacks are 8-bit-representable to +-0.5, ~40 dB
        # below the severity gaps the hinge ranks) — dequantized on device
        def up8(a):
            return jax.device_put(
                np.clip(np.round(a), 0, 255).astype(np.uint8)
            ).astype(jnp.float32)

        hr_d, hlo_d, hhi_d = up8(h_refs), up8(h_lows), up8(h_highs)

        # baseline (random features) held-out accuracy
        acc0 = ranking_accuracy(
            lambda r, lo, hi, p=params: pair_acc(p, r, lo, hi),
            hr_d, hlo_d, hhi_d)

        r_d = up8(refs)
        lo_d = up8(lows)
        hi_d = up8(highs)
        key = jax.random.PRNGKey(seed + 1)
        t0 = time.time()
        loss = float("nan")
        for c in range(max(args.steps // chunk, 1)):
            key, sub = jax.random.split(key)
            params, opt_state, l = run_chunk(params, opt_state, r_d, lo_d, hi_d, sub)
            if (c * chunk) % 200 == 0:
                loss = float(l)
                print(f"[{net}] step {c * chunk}: loss {loss:.6f}", flush=True)

        acc1 = ranking_accuracy(
            lambda r, lo, hi, p=params: pair_acc(p, r, lo, hi),
            hr_d, hlo_d, hhi_d)
        print(f"[{net}] ranking accuracy: random {acc0:.3f} -> trained {acc1:.3f} "
              f"({time.time()-t0:.0f}s)", flush=True)

        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(out_dir, f"lpips_{net}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, params, force=True)
        ckptr.wait_until_finished()
        print(f"[{net}] saved {path}", flush=True)
        from srs_tpu.models.evaljson import update_eval

        update_eval(out_dir, f"lpips_{net}", {
            "rank_acc_random": round(acc0, 4),
            "rank_acc_trained": round(acc1, 4),
            "steps": args.steps, "pairs": int(n),
        }, replace=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
