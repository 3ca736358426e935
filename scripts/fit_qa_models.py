"""Fit and package the pretrained no-reference QA models (zero-egress):

- NIQE pristine MVG (mu, cov of 36-D NSS features) on sharp procedural
  corpus renders -> srs_tpu/qa/data/niqe_pristine.npz
- BRISQUE ridge regressor trained on a blur/noise/JPEG distortion ladder
  with severity-derived pseudo-DMOS -> srs_tpu/qa/data/brisque_model.npz

Run on CPU (feature extraction is cheap):  python scripts/fit_qa_models.py
"""

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from srs_tpu.models.corpus import (  # noqa: E402
    render_image,
    render_natural,
    render_photo,
)
from srs_tpu.models.photo_data import photo_mosaic  # noqa: E402
from srs_tpu.qa.niqe import (  # noqa: E402
    DATA_DIR,
    brisque_features,
)

N_BRISQUE = 90
SEED0 = 500_000  # disjoint from every training/eval corpus seed range


def _sharpness(img: np.ndarray) -> float:
    """Mean local-contrast (the NIQE sigma field) of the luma channel."""
    import cv2
    import jax.numpy as jnp

    from srs_tpu.qa.niqe import _sigma_field

    g = jnp.asarray(cv2.cvtColor(img.astype(np.float32), cv2.COLOR_RGB2GRAY))
    return float(jnp.mean(_sigma_field(g)))


def pristine_pool():
    """NIQE pristine feature pool (chosen by measurement, see commit):

    - the real bundled photographs at 5 scales (multi-scale crops give
      ~60 sharp patches from only 5 photos), and
    - the *crisp half* of `render_photo` renders (top 30 of 60 by mean
      local contrast): the generator's depth-of-field and camera-PSF
      draws produce soft images whose statistics overlap Gaussian blur —
      including them collapses NIQE's blur sensitivity (measured: a
      blurred photo scored BELOW its clean version against a soft-pool
      model).

    Mosaic composites are excluded: their tile seams are artificial
    edges that corrupt "pristine" NSS.  render_natural is excluded for
    the same softness reason as the soft renders."""
    import cv2
    import jax.numpy as jnp

    from srs_tpu.models.photo_data import load_photos
    from srs_tpu.qa.niqe import niqe_features

    feats = []
    for p in load_photos():
        for s in (1.0, 0.85, 0.7, 0.6, 0.5):
            v = p if s == 1.0 else cv2.resize(
                p, None, fx=s, fy=s, interpolation=cv2.INTER_AREA)
            feats.append(np.asarray(
                niqe_features(jnp.asarray(v, jnp.float32)), np.float64))
    cands = [render_photo(SEED0 + i, 320) for i in range(60)]
    cands.sort(key=_sharpness, reverse=True)
    for im in cands[:30]:
        feats.append(np.asarray(
            niqe_features(jnp.asarray(im, jnp.float32)), np.float64))
    return np.concatenate(feats, axis=0)


def distort(img: np.ndarray, kind: str, level: int) -> np.ndarray:
    """level 1..5, increasing severity."""
    import cv2

    import zlib

    # crc32, not hash(): str hash is salted per process and would make the
    # fitted models differ run to run.
    rng = np.random.default_rng(level * 1000 + zlib.crc32(kind.encode()) % 1000)
    if kind == "blur":
        sigma = [0.6, 1.0, 1.6, 2.4, 3.5][level - 1]
        return cv2.GaussianBlur(img, (0, 0), sigma)
    if kind == "noise":
        sigma = [3, 7, 13, 21, 32][level - 1]
        return np.clip(img + rng.normal(0, sigma, img.shape), 0, 255).astype(np.float32)
    if kind == "jpeg":
        from PIL import Image

        q = [80, 55, 35, 20, 10][level - 1]
        buf = io.BytesIO()
        Image.fromarray(img.astype(np.uint8)).save(buf, format="JPEG", quality=q)
        return np.asarray(Image.open(buf)).astype(np.float32)
    if kind == "upscale":
        # Bicubic down-then-up: the degradation an SR/upscaling pipeline
        # actually produces. Without this class the regressor extrapolates
        # (and rails at 100) on every upscaled output it is asked to score.
        s = [1.25, 1.6, 2.0, 2.7, 3.5][level - 1]
        h, w = img.shape[:2]
        small = cv2.resize(img, (max(int(w / s), 8), max(int(h / s), 8)),
                           interpolation=cv2.INTER_AREA)
        return cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
    raise ValueError(kind)


def main() -> None:
    import sys

    import jax.numpy as jnp

    os.makedirs(DATA_DIR, exist_ok=True)
    # --only lpips: refit just the LPIPS threshold calibration (needed
    # whenever the packaged lpips_{vgg,alex} features retrain — the
    # distance scale changes while the NIQE/BRISQUE fits do not).
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    if only == "lpips":
        _fit_lpips_calib(jnp)
        print("DONE")
        return

    # ---- NIQE pristine model: real-photo patches + crisp renders (see
    # pristine_pool docstring); diagonal shrinkage 0.1 so held-out clean
    # images are not swamped by small-sample covariance noise ----
    print("building pristine feature pool...", flush=True)
    f = pristine_pool()
    f = f[np.all(np.isfinite(f), axis=1)]
    print(f"fitting NIQE pristine MVG on {f.shape[0]} patches...", flush=True)
    cov = np.cov(f, rowvar=False)
    model = {
        "mu": f.mean(axis=0).astype(np.float64),
        "cov": (0.9 * cov + 0.1 * np.diag(np.diag(cov))).astype(np.float64),
    }

    # ---- scale calibration: raw Mahalanobis -> the published NIQE scale
    # the reference's thresholds use (good<3 / acceptable<5 / poor<8,
    # quality_assessment_module.py:63-70). Anchors on HELD-OUT crisp
    # renders: pristine median -> 2.5 (published NIQE of clean photos is
    # ~2-4) and the median over {blur sev-3, noise sev-3} -> 7.0 (clearly
    # degraded). The slope is capped at 3.0: when the anchor gap is
    # narrow an unbounded affine amplifies benign image-to-image NSS
    # variation into tens of "NIQE points" (the round-2 failure: a clean
    # photo calibrated to 21).
    print("calibrating NIQE scale...", flush=True)

    def raw_niqe(img, m):
        from srs_tpu.qa.niqe import _mahalanobis_score, niqe_features

        ff = np.asarray(niqe_features(jnp.asarray(img, jnp.float32)), np.float64)
        return _mahalanobis_score(ff, m["mu"], m["cov"])

    hcands = [render_photo(SEED0 + 50_000 + i, 320) for i in range(24)]
    hcands.sort(key=_sharpness, reverse=True)
    hold = hcands[:12]
    # Round 4 (VERDICT r3 #3): anchor on the sharpest REAL crops too, not
    # renders alone — "clean ≈ 2.5" must be a property of real photographs
    # for the calibrated scale to issue verdicts on photo content. Crops
    # come from the TRAINING pool (never the eval panel).
    real_crops = []
    import cv2 as _cv2

    from srs_tpu.models.photo_data import load_photos

    rng = np.random.default_rng(SEED0)
    for p in load_photos():
        h, w = p.shape[:2]
        if min(h, w) < 320:
            continue
        for _ in range(3):
            yy = int(rng.integers(0, h - 320 + 1))
            xx = int(rng.integers(0, w - 320 + 1))
            real_crops.append(np.ascontiguousarray(
                p[yy:yy + 320, xx:xx + 320], np.float32))
    real_crops.sort(key=_sharpness, reverse=True)
    hold = hold + real_crops[: max(len(real_crops) // 2, 8)]
    raw_clean = [raw_niqe(im, model) for im in hold]
    raw_sev = [raw_niqe(distort(im, "blur", 3), model) for im in hold]
    raw_sev += [raw_niqe(distort(im, "noise", 3), model) for im in hold]
    raw_clean = [v for v in raw_clean if v is not None]
    raw_sev = [v for v in raw_sev if v is not None]
    m_c, m_s = float(np.median(raw_clean)), float(np.median(raw_sev))
    a = float(np.clip((7.0 - 2.5) / max(m_s - m_c, 1e-6), 0.75, 3.0))
    b = 2.5 - a * m_c
    model["scale_a"] = np.float64(a)
    model["scale_b"] = np.float64(b)
    np.savez(os.path.join(DATA_DIR, "niqe_pristine.npz"), **model)
    print(f"niqe_pristine: mu[{model['mu'].shape}] cov[{model['cov'].shape}] "
          f"calib a={a:.4f} b={b:.4f} (raw clean {m_c:.2f}, sev3 {m_s:.2f})")

    # ---- BRISQUE regressor ----
    print("building distortion ladder...", flush=True)
    X, y = [], []
    for i in range(N_BRISQUE):
        # Rotate photo-statistics / real-photo / natural / synthetic
        # families: the regressor is supervised on severity, so class
        # diversity is robustness.
        img = None
        if i % 4 == 0:
            img = photo_mosaic(SEED0 + 10_000 + i, 256)
        if img is None:
            render = (render_photo, render_natural, render_image)[i % 3]
            img = render(SEED0 + 10_000 + i, 256)
        X.append(np.asarray(brisque_features(jnp.asarray(img)), np.float64))
        y.append(2.0)  # pristine pseudo-DMOS
        for kind in ("blur", "noise", "jpeg", "upscale"):
            for level in (1, 2, 3, 4, 5):
                d = distort(img, kind, level)
                X.append(np.asarray(brisque_features(jnp.asarray(d)), np.float64))
                y.append(level * 18.0)  # 18..90, monotone in severity
    X = np.stack(X)
    y = np.asarray(y)
    keep = np.all(np.isfinite(X), axis=1)
    X, y = X[keep], y[keep]
    from srs_tpu.qa.niqe import brisque_expand

    mu, sd = X.mean(0), X.std(0) + 1e-8
    Z = brisque_expand((X - mu) / sd)
    lam = 1.0
    w = np.linalg.solve(Z.T @ Z + lam * np.eye(Z.shape[1]), Z.T @ (y - y.mean()))
    b = y.mean()
    pred = np.clip(Z @ w + b, 0, 100)
    corr = np.corrcoef(pred, y)[0, 1]
    rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
    np.savez(os.path.join(DATA_DIR, "brisque_model.npz"), w=w, b=b, mu=mu, sd=sd)
    print(f"brisque: corr={corr:.3f} rmse={rmse:.1f} over {len(y)} samples")

    _fit_lpips_calib(jnp)
    print("DONE")


def _fit_lpips_calib(jnp) -> None:
    # ---- LPIPS threshold calibration ----
    # The reference's QualityThresholds LPIPS levels (0.02/0.05/0.10) are
    # calibrated for torch-lpips; this metric (trained ranking features,
    # or the random-feature fallback) has a different numeric scale.
    # Calibrate level cut-offs as the median distance at distortion
    # severities 1/2/3 of the ladder, so `lpips_level` labels carry the
    # intended "imperceptible / slight / acceptable" semantics under
    # *this* metric. Must be rerun whenever lpips_{vgg,alex} retrain.
    import json

    from srs_tpu.models.lpips import LPIPSMetric

    lp = LPIPSMetric()
    per_level: dict = {1: [], 2: [], 3: [], 4: [], 5: []}
    for i in range(16):
        render = (render_photo, render_natural, render_image)[i % 3]
        img = render(SEED0 + 20_000 + i, 192)
        a = jnp.asarray(img)
        for kind in ("blur", "noise", "jpeg", "upscale"):
            for level in (1, 2, 3, 4, 5):
                d = float(lp(a, jnp.asarray(distort(img, kind, level))))
                per_level[level].append(d)
    med = {lv: float(np.median(v)) for lv, v in per_level.items()}
    calib = {
        "lpips_excellent": round(med[1], 4),
        "lpips_good": round(med[2], 4),
        "lpips_acceptable": round(med[3], 4),
        "medians_by_severity": med,
    }
    with open(os.path.join(DATA_DIR, "lpips_calib.json"), "w") as f:
        json.dump(calib, f, indent=2)
    print("lpips calibration:", json.dumps(calib))


if __name__ == "__main__":
    main()
