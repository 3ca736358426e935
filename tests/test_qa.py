"""QA metric tests.

Oracles are independent numpy/cv2 computations of the same published
formulas the reference wraps (PSNR, SSIM local-stats maps, MSCN, FFT HF
ratio, blockiness, Lab delta-E). Mirrors the reference's example-as-test
style (quality_assessment_module.py:1378-1486: noise-perturbed synthetic
pairs, seeded)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from srs_tpu.qa import commercial as C
from srs_tpu.qa import metrics as M
from srs_tpu.qa import noref as N
from srs_tpu.qa.module import QualityAssessmentModule


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(42)
    clean = (rng.random((128, 128, 3)) * 255).astype(np.float32)
    noisy = np.clip(clean + rng.normal(0, 10, clean.shape), 0, 255).astype(np.float32)
    return clean, noisy


def test_psnr_matches_numpy(pair):
    clean, noisy = pair
    mse = np.mean((clean.astype(np.float64) - noisy.astype(np.float64)) ** 2)
    ref = 10 * np.log10(255.0**2 / mse)
    got = float(M.psnr(jnp.asarray(clean), jnp.asarray(noisy)))
    assert abs(got - ref) < 1e-3


def test_psnr_identical_clamped(pair):
    clean, _ = pair
    assert float(M.psnr(jnp.asarray(clean), jnp.asarray(clean))) == 100.0


def test_ssim_simple_matches_cv2_oracle(pair):
    clean, noisy = pair
    g1 = cv2.cvtColor(clean.astype(np.uint8), cv2.COLOR_RGB2GRAY).astype(np.float64)
    g2 = cv2.cvtColor(noisy.astype(np.uint8), cv2.COLOR_RGB2GRAY).astype(np.float64)
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu1 = cv2.GaussianBlur(g1, (11, 11), 1.5)
    mu2 = cv2.GaussianBlur(g2, (11, 11), 1.5)
    s1 = cv2.GaussianBlur(g1 * g1, (11, 11), 1.5) - mu1 * mu1
    s2 = cv2.GaussianBlur(g2 * g2, (11, 11), 1.5) - mu2 * mu2
    s12 = cv2.GaussianBlur(g1 * g2, (11, 11), 1.5) - mu1 * mu2
    ref = np.mean(
        ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))
    )
    # our kernel consumes float RGB (no uint8 rounding); compare on the
    # uint8-rounded input for exactness
    u1 = clean.astype(np.uint8).astype(np.float32)
    u2 = noisy.astype(np.uint8).astype(np.float32)
    got = float(M.ssim_simple(jnp.asarray(u1), jnp.asarray(u2)))
    assert abs(got - ref) < 5e-3  # rgb->gray rounding differences only


def test_ssim_properties(pair):
    clean, noisy = pair
    assert float(M.ssim(jnp.asarray(clean), jnp.asarray(clean))) > 0.9999
    s_noisy = float(M.ssim(jnp.asarray(clean), jnp.asarray(noisy)))
    assert 0.0 < s_noisy < 0.999
    # more noise -> lower ssim
    noisier = np.clip(clean + np.random.default_rng(0).normal(0, 40, clean.shape), 0, 255)
    assert float(M.ssim(jnp.asarray(clean), jnp.asarray(noisier.astype(np.float32)))) < s_noisy


def test_ms_ssim_properties(pair):
    clean, noisy = pair
    assert float(M.ms_ssim(jnp.asarray(clean), jnp.asarray(clean))) > 0.999
    assert float(M.ms_ssim(jnp.asarray(clean), jnp.asarray(noisy))) < 1.0


def test_ssim_global_matches_oracle(pair):
    clean, noisy = pair
    g1 = 0.299 * clean[..., 0] + 0.587 * clean[..., 1] + 0.114 * clean[..., 2]
    g2 = 0.299 * noisy[..., 0] + 0.587 * noisy[..., 1] + 0.114 * noisy[..., 2]
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu1, mu2 = g1.mean(), g2.mean()
    v1, v2 = g1.var(), g2.var()
    cov = ((g1 - mu1) * (g2 - mu2)).mean()
    ref = ((2 * mu1 * mu2 + C1) * (2 * cov + C2)) / ((mu1**2 + mu2**2 + C1) * (v1 + v2 + C2))
    got = float(M.ssim_global(jnp.asarray(clean), jnp.asarray(noisy)))
    assert abs(got - ref) < 1e-4


def test_mscn_matches_cv2_oracle(pair):
    clean, _ = pair
    g = cv2.cvtColor(clean.astype(np.uint8), cv2.COLOR_RGB2GRAY).astype(np.float32)
    mu = cv2.GaussianBlur(g, (7, 7), 7 / 6)
    sigma = np.sqrt(np.maximum(cv2.GaussianBlur(g * g, (7, 7), 7 / 6) - mu * mu, 0))
    ref = (g - mu) / (sigma + 1.0)
    got = np.asarray(N.mscn(jnp.asarray(g)))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_niqe_brisque_ranges(pair):
    clean, noisy = pair
    for img in (clean, noisy):
        v = float(N.niqe(jnp.asarray(img)))
        assert 1.0 <= v <= 15.0
        b = float(N.brisque(jnp.asarray(img)))
        assert 0.0 <= b <= 100.0


def test_hf_ratio_oracle(pair):
    clean, _ = pair
    g = (0.299 * clean[..., 0] + 0.587 * clean[..., 1] + 0.114 * clean[..., 2]).astype(np.float32)
    h, w = g.shape
    mag = np.abs(np.fft.fftshift(np.fft.fft2(g)))
    yy, xx = np.ogrid[:h, :w]
    mask = np.sqrt((xx - w // 2) ** 2 + (yy - h // 2) ** 2) > min(h, w) // 4
    ref = mag[mask].sum() / (mag.sum() + 1e-10)
    got = float(C.hf_ratio(jnp.asarray(clean)))
    assert abs(got - ref) < 1e-4


def test_delta_e_zero_for_same_color():
    img = np.full((16, 16, 3), 200.0, np.float32)
    d = float(C.delta_e(jnp.asarray(img), jnp.asarray(np.array([200, 200, 200], np.float32))))
    assert d < 1.5  # cv2 uint8 Lab rounding tolerance
    d2 = float(C.delta_e(jnp.asarray(img), jnp.asarray(np.array([20, 20, 200], np.float32))))
    assert d2 > 20


def test_brightness_uniformity_flat_vs_gradient():
    flat = np.full((64, 64, 3), 128.0, np.float32)
    grad = np.tile(np.linspace(0, 255, 64, dtype=np.float32)[None, :, None], (64, 1, 3))
    assert float(C.brightness_uniformity(jnp.asarray(flat))) == 100.0
    assert float(C.brightness_uniformity(jnp.asarray(grad))) < 50.0


def test_module_full_reference_report(pair):
    clean, noisy = pair
    qam = QualityAssessmentModule()
    m = qam.evaluate_full_reference(clean, noisy, scale_factor=2)
    for key in ("psnr", "ssim", "ms_ssim", "psnr_level", "ssim_level", "overall_score",
                "psnr_structure_color", "ssim_high_frequency"):
        assert key in m, key
    assert 0 <= m["overall_score"] <= 100
    rep = qam.generate_report(m, "full")
    assert "PSNR" in rep and "Overall" in rep
    rep_json = qam.generate_report(m, "json")
    import json

    assert "metrics" in json.loads(rep_json)


def test_module_no_reference_and_commercial(pair):
    clean, _ = pair
    qam = QualityAssessmentModule()
    nr = qam.evaluate_no_reference(clean)
    assert {"niqe", "brisque", "sharpness", "contrast", "colorfulness",
            "niqe_level", "brisque_level"} <= set(nr)
    rois = [
        {"type": "text", "bbox": [0, 0, 64, 64]},
        {"type": "brand", "bbox": [10, 10, 32, 32], "reference_color": (200, 30, 30)},
        {"type": "face", "bbox": [32, 32, 64, 64]},
    ]
    cm = qam.evaluate_commercial(clean, rois)
    assert "commercial_score" in cm and 0 <= cm["commercial_score"] <= 100
    assert "text_sharpness_0" in cm
    assert "brand_color_delta_e_1" in cm and "brand_color_accuracy_1" in cm
    assert "face_naturalness_2" in cm


def test_module_batch_evaluate(pair):
    clean, noisy = pair
    qam = QualityAssessmentModule()
    out = qam.batch_evaluate([(clean, noisy), (clean, clean)])
    assert len(out) == 2
    assert out[1]["psnr"] >= out[0]["psnr"]


def test_downsample_bicubic_validation(pair):
    clean, _ = pair
    qam = QualityAssessmentModule()
    with pytest.raises(ValueError):
        qam.downsample_bicubic(clean, 1.5)
    d = qam.downsample_bicubic(clean, 0.5)
    assert d.shape[:2] == (64, 64)


def test_full_niqe_orders_distortions():
    """Packaged NIQE pristine model: distortion -> higher score on
    natural-statistics images (the family NIQE is defined over; synthetic
    hard-edged graphics have non-natural NSS that blur moves *toward* the
    Gaussian, so no pristine model can rank them — matching published
    NIQE's known behavior on cartoons/documents)."""
    import cv2

    from srs_tpu.models.corpus import render_natural
    from srs_tpu.qa.niqe import niqe_score

    panel = {"clean": [], "blur": [], "noise": []}
    for seed in (910_000, 910_001, 910_002, 910_003):  # disjoint from fit
        img = render_natural(seed, 256)
        clean = niqe_score(jnp.asarray(img))
        assert clean is not None, "pristine model should be packaged"
        blur = cv2.GaussianBlur(img, (0, 0), 2.2)
        noisy = np.clip(
            img + np.random.default_rng(0).normal(0, 25, img.shape), 0, 255
        ).astype(np.float32)
        panel["clean"].append(clean)
        panel["blur"].append(niqe_score(jnp.asarray(blur)))
        panel["noise"].append(niqe_score(jnp.asarray(noisy)))
    means = {k: float(np.mean(v)) for k, v in panel.items()}
    # Margins on the CALIBRATED scale (good<3 / acceptable<5 / poor<8,
    # scripts/fit_qa_models.py): sigma-2.2 blur must cost >=1.5 NIQE
    # points, sigma-25 noise >=5 — and clean natural-statistics renders
    # must land inside the acceptable band.
    assert means["blur"] > means["clean"] + 1.5, means
    assert means["noise"] > means["clean"] + 5.0, means
    assert means["clean"] < 5.0, means


def test_trained_brisque_monotone_in_severity():
    import cv2

    from srs_tpu.models.corpus import render_natural
    from srs_tpu.qa.niqe import brisque_score

    img = render_natural(910_002, 256)
    scores = [brisque_score(jnp.asarray(cv2.GaussianBlur(img, (0, 0), s)))
              for s in (0.6, 1.6, 3.5)]
    assert scores[0] is not None
    assert scores[0] < scores[2], scores  # heavier blur scores worse


def test_module_prefers_packaged_nr_models():
    from srs_tpu.models.corpus import render_image
    from srs_tpu.qa.module import QualityAssessmentModule
    from srs_tpu.qa.niqe import brisque_score, niqe_score

    img = render_image(777_002, 256)
    qa = QualityAssessmentModule()
    m = qa.evaluate_no_reference(img)
    assert abs(m["niqe"] - niqe_score(jnp.asarray(img.astype(np.float32)))) < 1e-6
    assert abs(m["brisque"] - brisque_score(jnp.asarray(img.astype(np.float32)))) < 1e-6
    assert m["niqe_level"] in ("excellent", "good", "fair", "poor")


def test_lpips_thresholds_calibrated():
    """The module swaps the reference's torch-lpips cut-offs for values
    calibrated to the random-feature metric (qa/data/lpips_calib.json);
    user-supplied thresholds are respected untouched."""
    from srs_tpu.config import QualityAssessmentConfig, QualityThresholds
    from srs_tpu.qa.module import QualityAssessmentModule

    qa = QualityAssessmentModule()
    t = qa.thresholds
    assert 0 < t.lpips_excellent < t.lpips_good < t.lpips_acceptable
    assert t.lpips_excellent != QualityThresholds().lpips_excellent

    custom = QualityThresholds(lpips_excellent=0.3, lpips_good=0.4, lpips_acceptable=0.5)
    qa2 = QualityAssessmentModule(QualityAssessmentConfig(thresholds=custom))
    assert qa2.thresholds.lpips_excellent == 0.3


def test_batched_nr_scores_match_single():
    """niqe_scores/brisque_scores (one device program for N images) must
    agree with the per-image scorers."""
    from srs_tpu.models.corpus import render_natural
    from srs_tpu.qa.niqe import (
        brisque_score,
        brisque_scores,
        niqe_score,
        niqe_scores,
    )

    imgs = np.stack([render_natural(920_000 + i, 192) for i in range(3)])
    batch = jnp.asarray(imgs)
    nq = niqe_scores(batch)
    bq = brisque_scores(batch)
    for i in range(3):
        assert abs(nq[i] - niqe_score(jnp.asarray(imgs[i]))) < 1e-3
        assert abs(bq[i] - brisque_score(jnp.asarray(imgs[i]))) < 1e-3
