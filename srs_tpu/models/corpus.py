"""Procedural HR training corpus (zero-egress pretraining data).

The reference's SR models are remote pretrained services (reference:
super_resolution_module.py:561-711 Seedream, :713-840 veImageX); an
on-device framework must ship its own weights. With no network access,
the corpus is synthesized — weighted toward content where super-
resolution is *learnable*: anti-aliased edges, glyphs/text, line art,
smooth shaded regions, oriented patterns. Random-phase 1/f noise (the
classic "natural spectrum" texture) is kept only as a minor component:
its detail is information-theoretically unrecoverable from the
downsample, so a noise-dominated corpus caps any net at ~bicubic and
teaches nothing (measured: +0.1 dB ceiling on a noise-heavy mix vs
>1 dB on the structured mix).

Everything is seeded numpy + cv2 (host-side data generation; the
training step itself is the jitted device program in train.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["make_corpus", "render_image", "render_natural"]


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


def _gradient(rng: np.random.Generator, size: int) -> np.ndarray:
    """Smooth linear/radial shading + soft elliptical blobs (photo-like
    out-of-focus regions: trivially learnable, teaches the net restraint)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    theta = rng.uniform(0, 2 * np.pi)
    field = np.cos(theta) * xx + np.sin(theta) * yy
    c0 = rng.uniform(0, 255, 3).astype(np.float32)
    c1 = rng.uniform(0, 255, 3).astype(np.float32)
    img = field[..., None] * (c1 - c0) + c0
    for _ in range(rng.integers(2, 7)):
        cy, cx = rng.uniform(0, 1, 2)
        sy, sx = rng.uniform(0.03, 0.3, 2)
        rot = rng.uniform(0, np.pi)
        dy, dx = yy - cy, xx - cx
        u = np.cos(rot) * dx + np.sin(rot) * dy
        v = -np.sin(rot) * dx + np.cos(rot) * dy
        blob = np.exp(-(u * u / (2 * sx * sx) + v * v / (2 * sy * sy)))
        col = rng.uniform(0, 255, 3).astype(np.float32)
        a = rng.uniform(0.3, 0.9)
        img = img * (1 - a * blob[..., None]) + col * a * blob[..., None]
    return img


def _document(rng: np.random.Generator, size: int) -> np.ndarray:
    """Text-page composition: dense glyph lines + rules/boxes on a near-
    uniform background — the strongest SR-learnable content (glyph strokes
    have phase-aligned edges bicubic blurs in a systematic, invertible way)."""
    import cv2

    light = rng.random() < 0.75
    bg = rng.uniform(200, 255, 3) if light else rng.uniform(0, 60, 3)
    fg_lo, fg_hi = (0, 90) if light else (170, 255)
    big = np.full((size * 2, size * 2, 3), bg, np.float32).astype(np.uint8)
    fonts = [cv2.FONT_HERSHEY_SIMPLEX, cv2.FONT_HERSHEY_COMPLEX,
             cv2.FONT_HERSHEY_TRIPLEX, cv2.FONT_HERSHEY_PLAIN,
             cv2.FONT_HERSHEY_DUPLEX]
    y = int(rng.integers(10, 40))
    while y < 2 * size - 10:
        fs = float(rng.uniform(0.5, 1.6))
        col = tuple(int(v) for v in rng.uniform(fg_lo, fg_hi, 3))
        n_ch = int(rng.integers(8, 30))
        txt = "".join(chr(int(c)) for c in rng.integers(33, 126, n_ch))
        cv2.putText(big, txt, (int(rng.integers(0, size // 2)), y),
                    fonts[int(rng.integers(0, len(fonts)))], fs, col,
                    int(rng.integers(1, 3)), lineType=cv2.LINE_AA)
        y += int(20 * fs + rng.integers(4, 16))
    for _ in range(rng.integers(0, 4)):  # rules / boxes
        col = tuple(int(v) for v in rng.uniform(fg_lo, fg_hi, 3))
        p0 = (int(rng.integers(0, 2 * size)), int(rng.integers(0, 2 * size)))
        p1 = (int(rng.integers(0, 2 * size)), int(rng.integers(0, 2 * size)))
        if rng.random() < 0.5:
            cv2.line(big, p0, p1, col, int(rng.integers(1, 4)), lineType=cv2.LINE_AA)
        else:
            cv2.rectangle(big, p0, p1, col, int(rng.integers(1, 4)), lineType=cv2.LINE_AA)
    return cv2.resize(big, (size, size), interpolation=cv2.INTER_AREA).astype(np.float32)


def _pattern(rng: np.random.Generator, size: int) -> np.ndarray:
    """Hard-edged periodic structure: checkers / rings / stripe bundles."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    kind = rng.integers(0, 3)
    if kind == 0:  # rotated checkerboard
        theta = rng.uniform(0, np.pi)
        f = rng.uniform(4, 24)
        u = np.cos(theta) * xx + np.sin(theta) * yy
        v = -np.sin(theta) * xx + np.cos(theta) * yy
        img = (np.sin(2 * np.pi * f * u) * np.sin(2 * np.pi * f * v) > 0).astype(np.float32)
    elif kind == 1:  # concentric rings
        cy, cx = rng.uniform(0.2, 0.8, 2)
        r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        img = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(8, 40) * r)
        if rng.random() < 0.5:
            img = (img > 0.5).astype(np.float32)
    else:
        return _gratings(rng, size)
    c0 = rng.uniform(0, 255, 3).astype(np.float32)
    c1 = rng.uniform(0, 255, 3).astype(np.float32)
    return img[..., None] * (c1 - c0) + c0


def render_image(seed: int, size: int = 256) -> np.ndarray:
    """One deterministic HR image, [size, size, 3] float32 in [0, 255].

    Class mix weighted toward SR-learnable structure (edges/glyphs/line
    art); renders at a jittered supersize then area-downsamples half the
    time to diversify band-limit/aliasing statistics (pure at-size renders
    share one phase structure, which lets a capable net memorize the
    generator instead of learning generic detail priors)."""
    import cv2

    rng = np.random.default_rng(seed)
    ss = size if rng.random() < 0.5 else int(size * rng.uniform(1.25, 2.0))
    u = rng.random()
    if u < 0.26:  # graphic: flat cells + overlays
        img = _voronoi(rng, ss, int(rng.integers(6, 30)))
        img = _draw_overlays(rng, img)
    elif u < 0.50:  # document / text page
        img = _document(rng, ss)
    elif u < 0.70:  # photo-like shading + some sharp foreground
        img = _gradient(rng, ss)
        if rng.random() < 0.7:
            img = _draw_overlays(rng, img)
        if rng.random() < 0.4:  # low-contrast film-grain texture
            img = 0.9 * img + 0.1 * _fractal_noise(rng, ss, rng.uniform(1.2, 2.0))
    elif u < 0.88:  # periodic pattern
        img = _pattern(rng, ss)
        if rng.random() < 0.5:
            img = _draw_overlays(rng, img)
    else:  # textured (kept minor: random phase is unlearnable)
        img = _fractal_noise(rng, ss, rng.uniform(1.0, 2.2))
        if rng.random() < 0.7:
            img = _draw_overlays(rng, img)
    if ss != size:
        img = cv2.resize(
            np.ascontiguousarray(img, np.float32), (size, size),
            interpolation=cv2.INTER_AREA,
        )
    return np.clip(img, 0.0, 255.0).astype(np.float32)


def render_natural(seed: int, size: int = 256) -> np.ndarray:
    """One deterministic *natural-statistics* image: 1/f^a spectrum base
    (the classic natural-image power-law) with phase-coherent overlays for
    edge structure. This is the pristine family for the packaged NIQE
    model (qa/niqe.py): published NIQE is defined as deviation from
    pristine *natural* NSS — hard-edged synthetic graphics (documents,
    checkers) have non-natural statistics that blurring moves *toward*
    Gaussian, so they cannot serve as a pristine reference."""
    import cv2  # noqa: F401  (used by _draw_overlays)

    rng = np.random.default_rng(seed)
    img = _fractal_noise(rng, size, rng.uniform(1.0, 1.8))
    img = _draw_overlays(rng, img)
    return np.clip(img, 0.0, 255.0).astype(np.float32)


def make_corpus(n: int, size: int = 256, seed: int = 0) -> np.ndarray:
    """[n, size, size, 3] float32 HR images. Different ``seed`` ranges give
    disjoint train/held-out sets (train uses seed..seed+n-1)."""
    return np.stack([render_image(seed + i, size) for i in range(n)])
