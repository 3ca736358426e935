"""Train espcn_polish (the scale-1 quality-polish stage).

The reference's hybrid ladder ends with a real polish model
(veImageX fast_sr 1.0x, super_resolution_module.py:964-981); round 1/2
shipped espcn_polish with no checkpoint, so it was zero-init = identity
and hybrid paid an extra pass for nothing (VERDICT r2 missing #5).

This trains it as an SR-artifact-cleanup net: pairs are
(frozen SR net output, HR truth) — the polish net learns the residual
between what the packaged x2 nets produce and the ground truth, i.e.
exactly the distribution it sees at serving time inside `hybrid`.
Inputs mix the quality and fast nets' outputs (hybrid runs polish after
either, depending on the failure path).

    python scripts/train_polish.py [--steps 20000] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--patch", type=int, default=48)  # LR patch; HR = 2x
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--scan-chunk", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from srs_tpu.utils.tpu_guard import require_tpu

        require_tpu()

    from srs_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np
    import optax

    from scripts.pretrain import load_corpus
    from srs_tpu.models.registry import MODEL_REGISTRY, build_model
    from srs_tpu.models.train import (charbonnier_loss, downsample_area,
                                      save_checkpoint)

    out_dir = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "srs_tpu", "models", "checkpoints",
    )

    # uint8 once-per-process upload (degraded-link resilience; see
    # scripts/pretrain.py) — patches dequantize to f32 after the slice.
    import numpy as _np
    corpus = jax.device_put(
        _np.clip(_np.round(load_corpus()), 0, 255).astype(_np.uint8))
    n_img, ch, cw, _ = corpus.shape
    hp = args.patch * 2

    # frozen SR producers (the packaged x2 nets polish actually follows)
    q_mod, q_params = build_model("edsr_xl", 2)  # the default quality tier
    f_mod, f_params = build_model("espcn", 2)

    spec = MODEL_REGISTRY["espcn_polish"]
    module = spec.ctor(**dict(spec.kwargs))
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hp, hp, 3), jnp.float32)
    )
    schedule = optax.cosine_decay_schedule(args.lr, max(args.steps, 1), alpha=0.05)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    opt_state = tx.init(params)

    def one_step(carry, key):
        params, opt_state, corpus_d = carry
        ki, ky, kx, kq = jax.random.split(key, 4)
        idx = jax.random.randint(ki, (args.batch,), 0, n_img)
        ys = jax.random.randint(ky, (args.batch,), 0, ch - hp + 1)
        xs = jax.random.randint(kx, (args.batch,), 0, cw - hp + 1)
        imgs = jnp.take(corpus_d, idx, axis=0)
        hr = jax.vmap(
            lambda im, y, x: jax.lax.dynamic_slice(im, (y, x, 0), (hp, hp, 3))
        )(imgs, ys, xs)
        hr = hr.astype(jnp.float32)
        lr_b = downsample_area(hr, 2)
        sr_q = jnp.clip(q_mod.apply(q_params, lr_b), 0, 255)
        sr_f = jnp.clip(f_mod.apply(f_params, lr_b), 0, 255)
        use_q = jax.random.bernoulli(kq, 0.6, (args.batch, 1, 1, 1))
        sr = jnp.where(use_q, sr_q, sr_f)

        def loss_fn(p):
            return charbonnier_loss(module.apply(p, sr), hr)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, corpus_d), loss

    @jax.jit
    def run_chunk(params, opt_state, corpus_d, key):
        keys = jax.random.split(key, args.scan_chunk)
        (params, opt_state, _), losses = jax.lax.scan(
            one_step, (params, opt_state, corpus_d), keys
        )
        return params, opt_state, jnp.mean(losses)

    key = jax.random.PRNGKey(11)
    t0 = time.time()
    for chunk in range(max(args.steps // args.scan_chunk, 1)):
        key, sub = jax.random.split(key)
        params, opt_state, mloss = run_chunk(params, opt_state, corpus, sub)
        s = (chunk + 1) * args.scan_chunk
        if s % 1000 == 0:
            print(f"[espcn_polish] step {s}: loss {float(mloss):.5f}", flush=True)

    # Held-out check: polish(SR) must beat SR itself, and must not hurt.
    from srs_tpu.models.corpus import make_corpus

    hr = jnp.asarray(make_corpus(8, 192, seed=100_500))
    lr_b = downsample_area(hr[:, :192, :192], 2)
    def psnr(pred):
        mse = jnp.mean((jnp.clip(pred, 0, 255) - hr) ** 2, axis=(1, 2, 3))
        return float(jnp.mean(20 * jnp.log10(255.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))))
    sr = jnp.clip(q_mod.apply(q_params, lr_b), 0, 255)
    sr_db = psnr(sr)
    pol_db = psnr(module.apply(params, sr))
    print(f"[espcn_polish] holdout: sr {sr_db:.2f} dB -> "
          f"polished {pol_db:.2f} dB "
          f"({time.time()-t0:.0f}s)", flush=True)
    save_checkpoint(params, "espcn_polish", 1, out_dir)
    from srs_tpu.models.evaljson import DERIVED_EVIDENCE, update_eval

    update_eval(out_dir, "espcn_polish_x1", {
        "holdout_sr": round(sr_db, 3),
        "holdout_polished": round(pol_db, 3),
        "sr_producer": "edsr_xl/espcn x2 mix",
        "steps": args.steps,
        "train_seconds": round(time.time() - t0, 1),
    }, drop=DERIVED_EVIDENCE)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
