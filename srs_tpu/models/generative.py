"""Learned generative image model — the ARK text-to-image analog.

The reference's ARK client posts a prompt to a remote diffusion endpoint
and gets a 2K image back (reference: ark_api_module.py:17-96
`ARKImageGenerator.generate`, Bearer auth, size "2K", watermark flag;
guidance_scale/seed plumbed through `ARKImageConfig`). The TPU-native
equivalent is an **on-device class-conditional diffusion model**:

- a small UNet denoiser (:class:`CondUNet`, v-prediction, cosine
  schedule) trained on the framework's class-labelled corpus
  (8 visual families drawn from models/corpus.py + the bundled real
  photographs of models/photo_data.py);
- classifier-free guidance: training drops the class label 10% of the
  time; sampling blends conditional/unconditional v-estimates with the
  API's ``guidance_scale`` knob;
- DDIM sampling at the 64 px base resolution under one `lax.scan`
  (both guidance branches batched into a single MXU-friendly UNet call);
- the base sample is then **super-resolved to the requested 1K/2K/4K
  size by the framework's own packaged SR ladder** (models/sr_module.py
  `scale_ladder`) — generation and super-resolution share one stack,
  which is the point of the framework.

Prompts map to classes by keyword, falling back to the industry
category mapping (models/prompts.py categories). The mapping is
heuristic — there is no natural-language encoder in this zero-egress
environment — but the conditioning is real: each class is a distinct
visual distribution and the sampled pixels change with it.

`models/generate.py` keeps the reference's exact call surface and uses
this model when the ``ark_gen`` checkpoint is packaged, falling back to
the procedural synthesizer otherwise.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "ARK_CLASSES",
    "CondUNet",
    "class_for_prompt",
    "render_class",
    "make_class_corpus",
    "alpha_bar",
    "train_ark",
    "sample_ark",
    "refine_ark",
    "build_ark",
    "is_ark_trained",
    "ark_meta",
    "clear_ark_cache",
]

# ---------------------------------------------------------------------
# Classes and prompt mapping
# ---------------------------------------------------------------------

#: The 8 visual families the generator is conditioned on. Each has a
#: dedicated deterministic renderer in :func:`render_class`.
ARK_CLASSES: Tuple[str, ...] = (
    "graphic",   # flat color cells + line/glyph overlays (ad graphics)
    "document",  # text pages / posters
    "shaded",    # smooth studio shading + sharp foreground edges
    "pattern",   # periodic structure (weaves, grids)
    "texture",   # fractal micro-texture (grain, surfaces)
    "natural",   # 1/f natural-statistics fields with edge overlays
    "scene",     # layered photo-statistics scenes (render_photo)
    "photo",     # real bundled photograph mosaics
)

# Industry prompt category (models/prompts.py) -> default class. The
# reference steers its diffusion with these categories
# (super_resolution_module.py:102-222); here they pick the conditioning
# class of the learned generator.
_CATEGORY_CLASS: Dict[str, str] = {
    "beauty": "scene",
    "3c": "graphic",
    "food": "photo",
    "fashion": "pattern",
    "jewelry": "shaded",
    "furniture": "photo",
    "automotive": "shaded",
    "general": "scene",
}

# Keyword routing (checked in order, first hit wins) for free-text
# prompts that name a visual family directly.
_KEYWORD_CLASS: Tuple[Tuple[Tuple[str, ...], str], ...] = (
    (("text", "document", "poster", "page", "typography"), "document"),
    (("pattern", "grid", "weave", "tile", "stripe", "checker"), "pattern"),
    (("texture", "grain", "surface", "material"), "texture"),
    (("abstract", "noise", "organic field"), "natural"),
    (("photo", "photograph", "realistic", "camera"), "photo"),
    (("scene", "landscape", "still life", "product shot"), "scene"),
    (("logo", "icon", "graphic", "chart", "illustration"), "graphic"),
    (("gradient", "studio", "glossy", "metallic"), "shaded"),
)


def class_for_prompt(prompt: str, category: Optional[str] = None) -> int:
    """Conditioning class index for a prompt (+ optional template category).

    Keywords in the prompt win; otherwise the industry category maps via
    ``_CATEGORY_CLASS``; otherwise 'scene' (the general-content family).
    """
    import re

    low = (prompt or "").lower()
    for words, cls in _KEYWORD_CLASS:
        # whole-word match: "texture" must not trigger "text"
        if any(re.search(r"\b" + re.escape(w) + r"\b", low) for w in words):
            return ARK_CLASSES.index(cls)
    if category:
        cls = _CATEGORY_CLASS.get(category)
        if cls:
            return ARK_CLASSES.index(cls)
    # prompt may BE a known category name ("food", "jewelry", ...)
    cls = _CATEGORY_CLASS.get(low.strip())
    if cls:
        return ARK_CLASSES.index(cls)
    return ARK_CLASSES.index("scene")


# ---------------------------------------------------------------------
# Class-labelled training corpus
# ---------------------------------------------------------------------


def render_class(seed: int, cls: int, size: int = 64) -> np.ndarray:
    """One deterministic [size, size, 3] float32 [0,255] image of a class.

    Reuses the corpus family renderers (models/corpus.py) so the
    generator's training distribution is exactly the framework's visual
    vocabulary; 'photo' draws from the bundled real photographs
    (models/photo_data.py) and falls back to the scene renderer when no
    photos are installed.
    """
    from . import corpus as C

    name = ARK_CLASSES[cls]
    rng = np.random.default_rng((seed * 8 + cls) ^ 0x9E3779B9)
    s = int(rng.integers(1, 2**31))
    if name == "graphic":
        img = C._voronoi(rng, size, int(rng.integers(6, 24)))
        img = C._draw_overlays(rng, img)
    elif name == "document":
        img = C._document(rng, size)
    elif name == "shaded":
        img = C._gradient(rng, size)
        if rng.random() < 0.7:
            img = C._draw_overlays(rng, img)
    elif name == "pattern":
        img = C._pattern(rng, size)
    elif name == "texture":
        img = C._fractal_noise(rng, size, rng.uniform(1.0, 2.2))
        if rng.random() < 0.5:
            img = C._draw_overlays(rng, img)
    elif name == "natural":
        img = C.render_natural(s, size)
    elif name == "scene":
        img = C.render_photo(s, size)
    else:  # photo
        from .photo_data import photo_mosaic

        img = photo_mosaic(s, size)
        if img is None:
            img = C.render_photo(s, size)
    return np.clip(np.asarray(img, np.float32), 0.0, 255.0)


def make_class_corpus(
    n_per_class: int, size: int = 64, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """([N, size, size, 3] float32, [N] int32 labels), N = n_per_class * 8.

    Rendering is host-side and slow on this single-core box, so the
    result is cached to /tmp keyed by (n, size, seed, photo-set).
    """
    from .photo_data import photo_paths

    pkey = "%dp" % len(photo_paths())
    cache = os.path.join(
        "/tmp", f"srs_ark_corpus_{n_per_class}x{size}_s{seed}_{pkey}.npz"
    )
    if os.path.isfile(cache):
        try:
            z = np.load(cache)
            return z["x"], z["y"]
        except Exception:
            pass
    xs, ys = [], []
    for c in range(len(ARK_CLASSES)):
        for i in range(n_per_class):
            xs.append(render_class(seed + i, c, size))
            ys.append(c)
    x = np.stack(xs).astype(np.float32)
    y = np.asarray(ys, np.int32)
    try:
        np.savez(cache, x=x, y=y)
    except Exception:
        pass
    return x, y


# ---------------------------------------------------------------------
# Denoiser network
# ---------------------------------------------------------------------


def _timestep_embed(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embedding of continuous t in [0, 1] -> (..., dim)."""
    half = dim // 2
    freqs = jnp.exp(jnp.linspace(0.0, math.log(1000.0), half))
    ang = t[..., None] * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class _ResBlock(nn.Module):
    ch: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1] // 4), dtype=jnp.float32)(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype)(h)
        h = h + nn.Dense(self.ch, dtype=self.dtype)(nn.silu(emb))[:, None, None, :]
        h = nn.GroupNorm(num_groups=min(32, self.ch // 4), dtype=jnp.float32)(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros)(h)
        if x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), dtype=self.dtype)(x)
        return x + h


class _Attn(nn.Module):
    """Single-head self-attention over the (small) spatial grid."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        xn = nn.GroupNorm(num_groups=min(32, c // 4), dtype=jnp.float32)(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype)(xn.astype(self.dtype))
        q, k, v = jnp.split(qkv.reshape(b, h * w, 3 * c), 3, axis=-1)
        att = jax.nn.softmax(
            (q @ k.transpose(0, 2, 1)).astype(jnp.float32) / math.sqrt(c), axis=-1
        ).astype(self.dtype)
        out = (att @ v).reshape(b, h, w, c)
        return x + nn.Dense(c, dtype=self.dtype,
                            kernel_init=nn.initializers.zeros)(out)


class CondUNet(nn.Module):
    """Class-conditional v-prediction UNet for the base resolution.

    ``__call__(x, t, y)``: x (B, S, S, 3) in [-1, 1], t (B,) in [0, 1],
    y (B,) int32 class in [0, n_classes] — index ``n_classes`` is the
    unconditional (classifier-free) token. Returns the v-estimate.
    """

    base: int = 64
    n_classes: int = len(ARK_CLASSES)
    depth: int = 2  # resblocks per level (tests use 1 for compile speed)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, y: jax.Array) -> jax.Array:
        emb = _timestep_embed(t, self.base * 2).astype(self.dtype)
        emb = nn.Dense(self.base * 4, dtype=self.dtype)(emb)
        emb = emb + nn.Embed(self.n_classes + 1, self.base * 4,
                             dtype=self.dtype)(y)
        emb = nn.Dense(self.base * 4, dtype=self.dtype)(nn.silu(emb))

        chs = (self.base, self.base * 2, self.base * 4)
        h = nn.Conv(chs[0], (3, 3), dtype=self.dtype)(x.astype(self.dtype))
        skips = [h]
        for lvl, ch in enumerate(chs):  # down path
            if lvl:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=self.dtype)(h)
            for _ in range(self.depth):
                h = _ResBlock(ch, self.dtype)(h, emb)
                if lvl == len(chs) - 1:
                    h = _Attn(self.dtype)(h)
                skips.append(h)
        h = _ResBlock(chs[-1], self.dtype)(h, emb)  # mid
        h = _Attn(self.dtype)(h)
        h = _ResBlock(chs[-1], self.dtype)(h, emb)
        for lvl, ch in reversed(list(enumerate(chs))):  # up path
            # each level pushed `depth` resblock skips; level 0 adds the stem
            for _ in range(self.depth if lvl else self.depth + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = _ResBlock(ch, self.dtype)(h, emb)
                if lvl == len(chs) - 1:
                    h = _Attn(self.dtype)(h)
            if lvl:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(chs[lvl - 1], (3, 3), dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1] // 4),
                         dtype=jnp.float32)(h)
        return nn.Conv(3, (3, 3), dtype=self.dtype,
                       kernel_init=nn.initializers.zeros)(nn.silu(h).astype(self.dtype)
                                                          ).astype(jnp.float32)


# ---------------------------------------------------------------------
# Diffusion math (cosine schedule, v-prediction)
# ---------------------------------------------------------------------


def alpha_bar(t: jax.Array) -> jax.Array:
    """Cosine cumulative signal level (Nichol & Dhariwal 2021), t in [0,1]."""
    s = 0.008
    return jnp.cos((t + s) / (1.0 + s) * (math.pi / 2)) ** 2


def _vt_from(x0: jax.Array, eps: jax.Array, ab: jax.Array) -> jax.Array:
    a, b = jnp.sqrt(ab), jnp.sqrt(1.0 - ab)
    return a * eps - b * x0


def _x0_eps_from_v(xt: jax.Array, v: jax.Array, ab: jax.Array):
    a, b = jnp.sqrt(ab), jnp.sqrt(1.0 - ab)
    return a * xt - b * v, b * xt + a * v


# ---------------------------------------------------------------------
# Training (device-resident, scan-chunked like models/train.py)
# ---------------------------------------------------------------------


def train_ark(
    steps: int = 30000,
    n_per_class: int = 384,
    size: int = 64,
    base: int = 64,
    depth: int = 2,
    batch: int = 64,
    lr: float = 2e-4,
    ema_decay: float = 0.999,
    drop_label: float = 0.1,
    seed: int = 0,
    scan_chunk: int = 100,
    checkpoint_dir: Optional[str] = None,
    log_fn=None,
    corpus: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    init_from: Optional[str] = None,
):
    """Train the conditional diffusion model; returns (module, ema_params,
    final_loss). Saves the EMA params as checkpoint ``ark_gen_x1`` when
    ``checkpoint_dir`` is given (registry/StandardCheckpointer layout),
    plus an ``ark_meta.json`` sidecar recording the trained sample size
    (the conv/attention params are resolution-agnostic, so the loader
    needs the native size recorded out-of-band). ``init_from`` warm-starts
    from a previously saved ``ark_gen_x1`` — e.g. continuing a 128 px run,
    or growing resolution from a 64 px model (same param tree)."""
    import optax

    from .train import make_optimizer, save_checkpoint

    x_np, y_np = corpus if corpus is not None else make_class_corpus(
        n_per_class, size, seed
    )
    module = CondUNet(base=base, depth=depth)
    key = jax.random.PRNGKey(seed)
    params = module.init(
        key,
        jnp.zeros((1, size, size, 3), jnp.float32),
        jnp.zeros((1,), jnp.float32),
        jnp.zeros((1,), jnp.int32),
    )
    if init_from is not None:
        from .registry import _try_load_checkpoint

        loaded = _try_load_checkpoint("ark_gen", 1, init_from, module,
                                      fallback_packaged=False,
                                      init_fn=lambda: params)
        if loaded is None:
            raise FileNotFoundError(f"no ark_gen_x1 checkpoint in {init_from}")
        params = loaded
    tx = make_optimizer(lr)
    opt_state = tx.init(params)
    # Upload uint8 and keep it uint8 on device (dequantize per minibatch
    # inside the step): the tunneled link makes a float32 corpus upload
    # (600 MB at 128 px) minutes-long on bad days, class renders are
    # 8-bit-representable to within +-0.5, AND the corpus must ride as a
    # run_chunk ARGUMENT — a closed-over array is embedded in the compile
    # request, which the remote compile helper rejects with HTTP 413 at
    # 128 px (604 MB f32 body; observed round 5).
    x_d = jax.device_put(np.clip(np.round(x_np), 0, 255).astype(np.uint8))
    y_d = jax.device_put(jnp.asarray(y_np))
    n = x_d.shape[0]
    ncls = len(ARK_CLASSES)

    def one_step(carry, k):
        p, o, ema, x8, yv = carry
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        idx = jax.random.randint(k1, (batch,), 0, n)
        x0 = (x8[idx].astype(jnp.float32) / 127.5) - 1.0
        y = yv[idx]
        # classifier-free label dropout -> the uncond token (== ncls)
        y = jnp.where(jax.random.uniform(k4, (batch,)) < drop_label, ncls, y)
        x0 = jnp.where(
            jax.random.uniform(k5, (batch, 1, 1, 1)) < 0.5, x0[:, :, ::-1], x0
        )
        t = jax.random.uniform(k2, (batch,), minval=1e-4, maxval=1.0)
        ab = alpha_bar(t)[:, None, None, None]
        eps = jax.random.normal(k3, x0.shape)
        xt = jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * eps
        vt = _vt_from(x0, eps, ab)

        def loss_fn(pp):
            v = module.apply(pp, xt, t, y)
            return jnp.mean((v - vt) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, o2 = tx.update(g, o, p)
        p2 = optax.apply_updates(p, up)
        ema2 = jax.tree.map(lambda e, q: e * ema_decay + q * (1 - ema_decay),
                            ema, p2)
        return (p2, o2, ema2, x8, yv), loss

    @jax.jit
    def run_chunk(p, o, ema, x8, yv, k):
        ks = jax.random.split(k, scan_chunk)
        (p, o, ema, _, _), losses = jax.lax.scan(
            one_step, (p, o, ema, x8, yv), ks)
        return p, o, ema, losses.mean()

    ema = params
    loss = float("nan")
    n_chunks = max((steps + scan_chunk - 1) // scan_chunk, 1)
    # Fetch the loss scalar only at log points plus the final chunk: each
    # float() is a device->host round trip through the tunnel, and on
    # degraded-link days hundreds of them dominate a 40k-step run (same
    # gating as train_synthetic; CLAUDE.md degraded-link rules).
    log_stride = max(1000 // max(scan_chunk, 1), 1)
    for ci, start in enumerate(range(0, steps, scan_chunk)):
        key, sub = jax.random.split(key)
        params, opt_state, ema, lchunk = run_chunk(
            params, opt_state, ema, x_d, y_d, sub)
        if ci == n_chunks - 1 or (ci + 1) % log_stride == 0:
            loss = float(lchunk)
            if log_fn is not None:
                log_fn(min(start + scan_chunk, steps), loss)
    if checkpoint_dir is not None:
        save_checkpoint(ema, "ark_gen", 1, checkpoint_dir)
        import json

        with open(os.path.join(checkpoint_dir, "ark_meta.json"), "w") as f:
            json.dump({"size": size, "base": base, "depth": depth}, f)
        # Evict build_ark's negative cache (ADVICE r3): a same-process
        # train-then-generate flow must see the new checkpoint, not a
        # memoized params=None from before training.
        clear_ark_cache()
    return module, ema, loss


# ---------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------


def sample_ark(
    module: CondUNet,
    params: Any,
    cls: int,
    key: jax.Array,
    size: int = 64,
    steps: int = 50,
    guidance: float = 2.0,
    batch: int = 1,
) -> jax.Array:
    """DDIM (eta=0) sample -> [batch, size, size, 3] float32 in [0, 255].

    Classifier-free guidance blends the conditional and unconditional
    v-estimates; both branches run in ONE batched UNet call per step so
    the scan body is a single MXU program.
    """
    ncls = module.n_classes
    y = jnp.concatenate([
        jnp.full((batch,), cls, jnp.int32),
        jnp.full((batch,), ncls, jnp.int32),
    ])
    ts = jnp.linspace(1.0 - 1e-4, 0.0, steps + 1)
    xt = jax.random.normal(key, (batch, size, size, 3))

    def step(x, i):
        t_now, t_next = ts[i], ts[i + 1]
        ab_now = alpha_bar(t_now)
        tb = jnp.full((2 * batch,), t_now)
        v2 = module.apply(params, jnp.concatenate([x, x]), tb, y)
        v_c, v_u = v2[:batch], v2[batch:]
        v = v_u + guidance * (v_c - v_u)
        x0, eps = _x0_eps_from_v(x, v, ab_now)
        x0 = jnp.clip(x0, -1.5, 1.5)
        ab_next = alpha_bar(t_next)
        x_next = jnp.sqrt(ab_next) * x0 + jnp.sqrt(1.0 - ab_next) * eps
        return x_next, None

    xt, _ = jax.lax.scan(step, xt, jnp.arange(steps))
    return jnp.clip((xt + 1.0) * 127.5, 0.0, 255.0)


def refine_ark(
    module: CondUNet,
    params: Any,
    image: jax.Array,
    cls: int,
    key: jax.Array,
    t0: float = 0.22,
    steps: int = 8,
    guidance: float = 1.3,
    tile: Optional[int] = None,
    chunk: int = 64,
) -> jax.Array:
    """SDEdit-style native-resolution refinement of an upscaled sample.

    The reference's ARK returns native-2K diffusion samples
    (ark_api_module.py:42-80); sampling this small model directly at 2K is
    neither trained nor affordable, so the cascade trick applies instead:
    the SR-upscaled image is split into overlapping tiles at the model's
    NATIVE resolution, renoised to a shallow t0 (cosine alpha_bar keeps
    ~sqrt(ab) of the signal), and denoised the rest of the way with class
    conditioning — injecting genuinely synthesized high-frequency detail
    where SR interpolation left smoothness, while the shallow start
    preserves global structure. Tiles ride the existing layout machinery
    (ramp-weight overlap merge), so seams blend exactly like SR tiles.

    image: [H, W, 3] float32 [0, 255]; returns the same shape/range.
    """
    from ..ops.tiles import extract_tiles, merge_tiles, pad_image, unpad_image
    from ..ops.weights import layout_weights
    from ..tiling.geometry import compute_layout

    h, w = int(image.shape[0]), int(image.shape[1])
    # native tile side: callers normally pass ark_meta()['size']
    side = int(tile) if tile else 64
    lo = compute_layout(w, h, block_size=side, overlap_ratio=0.25)
    tiles = extract_tiles(pad_image(image, lo), lo)  # [N, side, side, 3]
    n = tiles.shape[0]

    ab0 = alpha_bar(jnp.asarray(t0))
    ncls = module.n_classes
    ts = jnp.linspace(t0, 0.0, steps + 1)

    def denoise(xt, y):
        def step(x, i):
            t_now, t_next = ts[i], ts[i + 1]
            tb = jnp.full((2 * x.shape[0],), t_now)
            v2 = module.apply(params, jnp.concatenate([x, x]), tb, y)
            b = x.shape[0]
            v = v2[b:] + guidance * (v2[:b] - v2[b:])
            x0, eps = _x0_eps_from_v(x, v, alpha_bar(t_now))
            x0 = jnp.clip(x0, -1.5, 1.5)
            abn = alpha_bar(t_next)
            return jnp.sqrt(abn) * x0 + jnp.sqrt(1.0 - abn) * eps, None

        out, _ = jax.lax.scan(step, xt, jnp.arange(steps))
        return out

    refined = []
    for s0 in range(0, n, chunk):
        batch = tiles[s0 : s0 + chunk]
        b = batch.shape[0]
        x0 = batch / 127.5 - 1.0
        key, sub = jax.random.split(key)
        eps = jax.random.normal(sub, x0.shape)
        xt = jnp.sqrt(ab0) * x0 + jnp.sqrt(1.0 - ab0) * eps
        y = jnp.concatenate([
            jnp.full((b,), cls, jnp.int32), jnp.full((b,), ncls, jnp.int32)
        ])
        refined.append(denoise(xt, y))
    out = (jnp.concatenate(refined, axis=0) + 1.0) * 127.5
    weights = jnp.asarray(layout_weights(lo, kind="ramp"))
    merged = merge_tiles(jnp.clip(out, 0.0, 255.0), weights, lo)
    return jnp.clip(unpad_image(merged, lo)[:h, :w], 0.0, 255.0)


# ---------------------------------------------------------------------
# Packaged-checkpoint loader (build_cond_polish pattern)
# ---------------------------------------------------------------------

_CACHE: Dict[Tuple[Optional[str], int], Tuple[Any, Any, bool]] = {}


def clear_ark_cache() -> None:
    _CACHE.clear()


def build_ark(
    checkpoint_dir: Optional[str] = None,
    base: Optional[int] = None,
    size: Optional[int] = None,
    depth: Optional[int] = None,
) -> Tuple[Any, Any, bool]:
    """(module, params, trained). Restores the packaged ``ark_gen_x1``
    checkpoint (user ``checkpoint_dir`` first, then the packaged models/
    checkpoints directory). base/size/depth default to the checkpoint's
    ``ark_meta.json`` sidecar (64/64/2 for pre-sidecar checkpoints), so a
    128 px-trained package loads without callers changing. When absent,
    ``params`` is **None** and trained is False — unlike the SR nets there
    is no useful untrained generator, so no init is materialized (a
    full-size init costs ~15 s of CPU compile just to answer
    is_ark_trained)."""
    meta = ark_meta(checkpoint_dir)
    base = meta["base"] if base is None else base
    size = meta["size"] if size is None else size
    depth = meta["depth"] if depth is None else depth
    key = (checkpoint_dir, base, depth)
    if key in _CACHE:
        return _CACHE[key]
    module = CondUNet(base=base, depth=depth)

    def _init():
        with jax.ensure_compile_time_eval():
            return module.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, size, size, 3), jnp.float32),
                jnp.zeros((1,), jnp.float32),
                jnp.zeros((1,), jnp.int32),
            )

    from .registry import _try_load_checkpoint

    params = _try_load_checkpoint("ark_gen", 1, checkpoint_dir, module,
                                  init_fn=_init)
    _CACHE[key] = (module, params, params is not None)
    return _CACHE[key]


def is_ark_trained(checkpoint_dir: Optional[str] = None) -> bool:
    return build_ark(checkpoint_dir)[2]


def ark_meta(checkpoint_dir: Optional[str] = None) -> Dict[str, int]:
    """Metadata of the checkpoint build_ark would load: the trained sample
    size/base/depth from the ``ark_meta.json`` sidecar (same search order
    as the params — user dir first, then packaged). Pre-round-4
    checkpoints have no sidecar and default to the original 64 px."""
    import json

    from .registry import PACKAGED_CHECKPOINT_DIR

    for d in (checkpoint_dir, PACKAGED_CHECKPOINT_DIR):
        if not d:
            continue
        if not os.path.isdir(os.path.join(os.path.expanduser(d), "ark_gen_x1")):
            continue
        meta = os.path.join(os.path.expanduser(d), "ark_meta.json")
        if os.path.isfile(meta):
            try:
                with open(meta) as f:
                    return {k: int(v) for k, v in json.load(f).items()}
            except Exception:
                pass
        return {"size": 64, "base": 64, "depth": 2}
    return {"size": 64, "base": 64, "depth": 2}
