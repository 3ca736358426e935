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

from srs_tpu.models.corpus import render_image, render_natural  # noqa: E402
from srs_tpu.qa.niqe import (  # noqa: E402
    DATA_DIR,
    brisque_features,
    fit_pristine_model,
)

N_PRISTINE = 120
PRISTINE_SIZE = 384  # 4x4 patches of 96 per image
N_BRISQUE = 90
SEED0 = 500_000  # disjoint from every training/eval corpus seed range


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
    import jax.numpy as jnp

    os.makedirs(DATA_DIR, exist_ok=True)

    # ---- NIQE pristine model (natural-statistics family ONLY: NIQE is
    # deviation-from-natural-NSS; see corpus.render_natural docstring) ----
    print("rendering pristine corpus...", flush=True)
    pristine = [render_natural(SEED0 + i, PRISTINE_SIZE) for i in range(N_PRISTINE)]
    print("fitting NIQE pristine MVG...", flush=True)
    model = fit_pristine_model(pristine)
    np.savez(os.path.join(DATA_DIR, "niqe_pristine.npz"), **model)
    print(f"niqe_pristine: mu[{model['mu'].shape}] cov[{model['cov'].shape}]")

    # ---- BRISQUE regressor ----
    print("building distortion ladder...", flush=True)
    X, y = [], []
    for i in range(N_BRISQUE):
        # Half natural-statistics, half mixed synthetic: the regressor is
        # supervised on severity, so class diversity is robustness.
        render = render_natural if i % 2 else render_image
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

    # ---- LPIPS threshold calibration ----
    # The reference's QualityThresholds LPIPS levels (0.02/0.05/0.10) are
    # calibrated for torch-lpips; the random-feature metric has a
    # different numeric scale. Calibrate level cut-offs as the median
    # distance at distortion severities 1/2/3 of the ladder, so
    # `lpips_level` labels carry the intended "imperceptible / slight /
    # acceptable" semantics under *this* metric.
    import json

    from srs_tpu.models.lpips import LPIPSMetric

    lp = LPIPSMetric()
    per_level: dict = {1: [], 2: [], 3: [], 4: [], 5: []}
    for i in range(16):
        render = render_natural if i % 2 else render_image
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
    print("DONE")


if __name__ == "__main__":
    main()
