"""Procedural HR training corpus (zero-egress pretraining data).

The reference's SR models are remote pretrained services (reference:
super_resolution_module.py:561-711 Seedream, :713-840 veImageX); an
on-device framework must ship its own weights. With no network access,
the corpus is synthesized: images with *natural statistics* — 1/f^a
spectra, flat regions with sharp anti-aliased boundaries, oriented
gratings, text-like glyphs — exactly the structures bicubic upsampling
blurs and a residual SR net can learn to restore.

Everything is seeded numpy + cv2 (host-side data generation; the
training step itself is the jitted device program in train.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["make_corpus", "render_image"]


def _fractal_noise(rng: np.random.Generator, size: int, alpha: float) -> np.ndarray:
    """1/f^alpha spectrum noise, [size, size, 3] in [0, 255]."""
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.rfftfreq(size)[None, :]
    radius = np.sqrt(fy * fy + fx * fx)
    radius[0, 0] = 1.0
    amp = radius ** (-alpha)
    amp[0, 0] = 0.0
    out = np.empty((size, size, 3), np.float32)
    base = None
    corr = rng.uniform(0.3, 0.95)  # inter-channel correlation (natural images)
    for c in range(3):
        phase = rng.uniform(0, 2 * np.pi, amp.shape)
        spec = amp * np.exp(1j * phase)
        ch = np.fft.irfft2(spec, s=(size, size)).astype(np.float32)
        if base is None:
            base = ch
        else:
            ch = corr * base + (1 - corr) * ch
        lo, hi = ch.min(), ch.max()
        out[..., c] = (ch - lo) / max(hi - lo, 1e-8)
    lo = rng.uniform(0, 80)
    hi = rng.uniform(160, 255)
    return out * (hi - lo) + lo


def _voronoi(rng: np.random.Generator, size: int, ncells: int) -> np.ndarray:
    """Flat colored cells with sharp boundaries (cartoon/graphic stats)."""
    pts = rng.uniform(0, size, (ncells, 2)).astype(np.float32)
    colors = rng.uniform(0, 255, (ncells, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    best = np.full((size, size), np.inf, np.float32)
    idx = np.zeros((size, size), np.int32)
    for i, (py, px) in enumerate(pts):
        d = (yy - py) ** 2 + (xx - px) ** 2
        mask = d < best
        best[mask] = d[mask]
        idx[mask] = i
    return colors[idx]


def _gratings(rng: np.random.Generator, size: int) -> np.ndarray:
    """Sum of oriented sinusoids (controlled mid/high frequency content)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.zeros((size, size), np.float32)
    for _ in range(rng.integers(2, 5)):
        theta = rng.uniform(0, np.pi)
        freq = rng.uniform(4, size / 5.0)
        phase = rng.uniform(0, 2 * np.pi)
        img += rng.uniform(0.3, 1.0) * np.sin(
            2 * np.pi * freq * (np.cos(theta) * xx + np.sin(theta) * yy) + phase
        )
    img = (img - img.min()) / max(img.max() - img.min(), 1e-8)
    tint = rng.uniform(0.4, 1.0, 3).astype(np.float32)
    return img[..., None] * tint * 255.0


def _draw_overlays(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """Anti-aliased shapes, strokes and text at 2x then area-downsample."""
    import cv2

    size = img.shape[0]
    big = cv2.resize(img, (size * 2, size * 2), interpolation=cv2.INTER_CUBIC)
    # cv2 5.x text/drawing requires 8U; the corpus is HR ground truth so
    # 8-bit quantization here is harmless (outputs are 8/16-bit anyway).
    big = np.ascontiguousarray(np.clip(big, 0, 255)).astype(np.uint8)
    for _ in range(rng.integers(3, 10)):
        color = tuple(int(v) for v in rng.integers(0, 256, 3))
        kind = rng.integers(0, 4)
        if kind == 0:
            c = (int(rng.integers(0, 2 * size)), int(rng.integers(0, 2 * size)))
            cv2.circle(big, c, int(rng.integers(6, size // 2)), color,
                       int(rng.choice([-1, 2, 4])), lineType=cv2.LINE_AA)
        elif kind == 1:
            p0 = (int(rng.integers(0, 2 * size)), int(rng.integers(0, 2 * size)))
            p1 = (int(rng.integers(0, 2 * size)), int(rng.integers(0, 2 * size)))
            cv2.rectangle(big, p0, p1, color, int(rng.choice([-1, 2, 4])),
                          lineType=cv2.LINE_AA)
        elif kind == 2:
            p0 = (int(rng.integers(0, 2 * size)), int(rng.integers(0, 2 * size)))
            p1 = (int(rng.integers(0, 2 * size)), int(rng.integers(0, 2 * size)))
            cv2.line(big, p0, p1, color, int(rng.integers(1, 6)),
                     lineType=cv2.LINE_AA)
        else:
            txt = "".join(chr(int(c)) for c in rng.integers(33, 126, rng.integers(3, 9)))
            org = (int(rng.integers(0, 2 * size)), int(rng.integers(20, 2 * size)))
            cv2.putText(big, txt, org, cv2.FONT_HERSHEY_SIMPLEX,
                        float(rng.uniform(0.6, 2.5)), color,
                        int(rng.integers(1, 4)), lineType=cv2.LINE_AA)
    return cv2.resize(big, (size, size), interpolation=cv2.INTER_AREA).astype(np.float32)


def render_image(seed: int, size: int = 256) -> np.ndarray:
    """One deterministic HR image, [size, size, 3] float32 in [0, 255].

    Renders at a jittered supersize then area-downsamples half the time:
    this diversifies the band-limit/aliasing statistics (pure at-size
    renders share one phase structure, which lets a capable net memorize
    the generator instead of learning generic detail priors)."""
    import cv2

    rng = np.random.default_rng(seed)
    ss = size if rng.random() < 0.5 else int(size * rng.uniform(1.25, 2.0))
    bg = rng.integers(0, 3)
    if bg == 0:
        img = _fractal_noise(rng, ss, rng.uniform(1.0, 2.2))
    elif bg == 1:
        img = _voronoi(rng, ss, int(rng.integers(6, 30)))
    else:
        img = _gratings(rng, ss)
    if rng.random() < 0.85:
        img = _draw_overlays(rng, img.astype(np.float32))
    if rng.random() < 0.3:  # texture on top of graphics
        img = 0.7 * img + 0.3 * _fractal_noise(rng, ss, rng.uniform(1.2, 2.0))
    if ss != size:
        img = cv2.resize(
            np.ascontiguousarray(img, np.float32), (size, size),
            interpolation=cv2.INTER_AREA,
        )
    return np.clip(img, 0.0, 255.0).astype(np.float32)


def make_corpus(n: int, size: int = 256, seed: int = 0) -> np.ndarray:
    """[n, size, size, 3] float32 HR images. Different ``seed`` ranges give
    disjoint train/held-out sets (train uses seed..seed+n-1)."""
    return np.stack([render_image(seed + i, size) for i in range(n)])
