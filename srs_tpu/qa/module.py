"""QualityAssessmentModule — public QA surface.

API-parity port of the reference's `QualityAssessmentModule` (reference:
quality_assessment_module.py:89-1371): same method names
(`evaluate_full_reference`, `evaluate_no_reference`, `evaluate_commercial`,
`calculate_psnr/ssim/lpips/niqe/brisque`, `generate_report`,
`batch_evaluate`), same metric keys and level labels, same report
structure — with every metric computed by jnp kernels on device instead of
skimage/torch/cv2 on host.
"""

from __future__ import annotations

import json
from datetime import datetime
from enum import Enum
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..config import QualityAssessmentConfig, QualityThresholds
from . import commercial as C
from . import metrics as M
from . import noref as N


class AssessmentLevel(Enum):
    EXCELLENT = "excellent"
    GOOD = "good"
    FAIR = "fair"
    POOR = "poor"


def _f(x) -> float:
    return float(np.asarray(x))


def _calibrated_thresholds(t: QualityThresholds) -> QualityThresholds:
    """Swap the reference's torch-lpips level cut-offs (0.02/0.05/0.10,
    reference: qa:60-75) for values calibrated to the random-feature LPIPS
    actually used here (scripts/fit_qa_models.py medians at distortion
    severities 1/2/3, packaged as qa/data/lpips_calib.json). User-supplied
    non-default thresholds are respected untouched."""
    defaults = QualityThresholds()
    if (t.lpips_excellent, t.lpips_good, t.lpips_acceptable) != (
        defaults.lpips_excellent,
        defaults.lpips_good,
        defaults.lpips_acceptable,
    ):
        return t
    import os
    from dataclasses import replace

    path = os.path.join(os.path.dirname(__file__), "data", "lpips_calib.json")
    if not os.path.exists(path):
        return t
    try:
        with open(path) as f:
            c = json.load(f)
        return replace(
            t,
            lpips_excellent=float(c["lpips_excellent"]),
            lpips_good=float(c["lpips_good"]),
            lpips_acceptable=float(c["lpips_acceptable"]),
        )
    except Exception:
        return t


class QualityAssessmentModule:
    """Device-accelerated full/no-reference/commercial image QA."""

    def __init__(
        self,
        config: Optional[QualityAssessmentConfig] = None,
        device: str = "tpu",
        lpips_model=None,
    ):
        self.config = config or QualityAssessmentConfig()
        self.thresholds = _calibrated_thresholds(self.config.thresholds)
        self.device = device
        # LPIPS feature net (flax); injected or lazily built by
        # srs_tpu.models.lpips. None disables the lpips_* keys, mirroring
        # the reference's behavior when torch lpips fails to load
        # (reference: qa:135-146).
        self._lpips = lpips_model
        if self._lpips is None and self.config.enable_lpips:
            try:
                from ..models.lpips import LPIPSMetric

                self._lpips = LPIPSMetric()
            except Exception:
                self._lpips = None

    # -- preprocessing ----------------------------------------------------
    @staticmethod
    def _preprocess(image: np.ndarray) -> jnp.ndarray:
        """Normalize to float32 [0, 255] HWC (reference: qa:197-210 maps
        [0,1] floats to uint8; we keep float precision in the 255 domain).
        Device-resident jnp arrays pass through untouched (framework
        convention is float [0, 255]) — no host round-trip."""
        import jax

        if isinstance(image, jax.Array) and not isinstance(image, np.ndarray):
            img = image if image.ndim >= 3 else image[..., None]
            return img.astype(jnp.float32)
        arr = np.asarray(image)
        if arr.ndim == 2:
            arr = arr[..., None]
        arr = arr.astype(np.float32)
        if arr.max() <= 1.0:
            arr = arr * 255.0
        return jnp.asarray(arr)

    @staticmethod
    def _match_size(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mh = min(a.shape[0], b.shape[0])
        mw = min(a.shape[1], b.shape[1])
        return a[:mh, :mw], b[:mh, :mw]

    # -- scalar metrics (reference method names) --------------------------
    def calculate_psnr(self, img1, img2, data_range: float = 255.0) -> float:
        a, b = self._match_size(self._preprocess(img1), self._preprocess(img2))
        return _f(M.psnr(a, b, data_range))

    def calculate_ssim(self, img1, img2, multiscale: bool = True) -> float:
        a, b = self._match_size(self._preprocess(img1), self._preprocess(img2))
        # Reference's "multiscale" flag selects the gaussian-weighted
        # windowed SSIM (qa:367-380); plain selects uniform-ish default —
        # we use the same windowed kernel for both, and expose true
        # MS-SSIM via calculate_ms_ssim.
        return _f(M.ssim(a, b))

    def calculate_ms_ssim(self, img1, img2) -> float:
        a, b = self._match_size(self._preprocess(img1), self._preprocess(img2))
        return _f(M.ms_ssim(a, b))

    def calculate_lpips(self, img1, img2, net: str = "vgg") -> float:
        if self._lpips is None:
            raise RuntimeError("LPIPS model not loaded")
        a, b = self._match_size(self._preprocess(img1), self._preprocess(img2))
        return _f(self._lpips(a, b, net=net))

    def calculate_niqe(self, image) -> float:
        """Full NIQE (packaged pristine model, qa/niqe.py) when available —
        the analog of the reference preferring pyiqa's pretrained NIQE
        (qa:148-167) — else the closed-form fallback."""
        from .niqe import niqe_score

        img = self._preprocess(image)
        v = niqe_score(img)
        return float(v) if v is not None else _f(N.niqe(img))

    def calculate_brisque(self, image) -> float:
        """Trained BRISQUE (packaged ridge regressor) when available, else
        the closed-form fallback."""
        from .niqe import brisque_score

        img = self._preprocess(image)
        v = brisque_score(img)
        return float(v) if v is not None else _f(N.brisque(img))

    def downsample_bicubic(self, image, scale_factor: float) -> np.ndarray:
        if not (0.0 < scale_factor < 1.0):
            raise ValueError(f"scale_factor must be in (0, 1), got {scale_factor}")
        img = self._preprocess(image)
        h, w = img.shape[0], img.shape[1]
        from ..ops.resize import resize_bicubic

        return np.asarray(resize_bicubic(img, int(h * scale_factor), int(w * scale_factor)))

    # -- assessments -------------------------------------------------------
    def _level(self, value: float, exc: float, good: float, fair: float, lower_better=False) -> str:
        if lower_better:
            if value <= exc:
                return AssessmentLevel.EXCELLENT.value
            if value <= good:
                return AssessmentLevel.GOOD.value
            if value <= fair:
                return AssessmentLevel.FAIR.value
            return AssessmentLevel.POOR.value
        if value >= exc:
            return AssessmentLevel.EXCELLENT.value
        if value >= good:
            return AssessmentLevel.GOOD.value
        if value >= fair:
            return AssessmentLevel.FAIR.value
        return AssessmentLevel.POOR.value

    def evaluate_full_reference(
        self, original, upscaled, scale_factor: int = 4
    ) -> Dict[str, Any]:
        """Full-reference evaluation (reference: qa:467-516): multiscale
        downsample comparison + PSNR + SSIM/MS-SSIM + LPIPS + overall."""
        t = self.thresholds
        a = self._preprocess(original)
        b = self._preprocess(upscaled)
        # All metric programs dispatch asynchronously; scalars are fetched
        # in ONE stacked device->host copy (a per-scalar float() costs a
        # full round-trip each over a tunneled TPU link).
        vals: Dict[str, Any] = dict(M.downsample_comparison(a, b))
        am, bm = self._match_size(a, b)
        vals["psnr"] = M.psnr(am, bm)
        vals["ssim"] = M.ssim(am, bm)
        vals["ms_ssim"] = M.ms_ssim(am, bm)
        if self._lpips is not None:
            vals["lpips_vgg"] = self._lpips(am, bm, net="vgg")
            vals["lpips_alex"] = self._lpips(am, bm, net="alex")
        keys = list(vals)
        fetched = np.asarray(jnp.stack([jnp.asarray(vals[k], jnp.float32) for k in keys]))
        metrics: Dict[str, Any] = {k: float(v) for k, v in zip(keys, fetched)}
        metrics["psnr_level"] = self._level(
            metrics["psnr"], t.psnr_excellent, t.psnr_good, t.psnr_acceptable
        )
        metrics["ssim_level"] = self._level(
            metrics["ms_ssim"], t.ssim_excellent, t.ssim_good, t.ssim_acceptable
        )
        if self._lpips is not None:
            metrics["lpips_level"] = self._level(
                metrics["lpips_vgg"],
                t.lpips_excellent,
                t.lpips_good,
                t.lpips_acceptable,
                lower_better=True,
            )
        metrics["overall_score"] = self._overall_score(metrics)
        return metrics

    def _overall_score(self, metrics: Dict[str, Any]) -> float:
        """mean(clamped PSNR, ms_ssim*100, (1-lpips)*100) — reference qa:590-609."""
        scores = []
        if "psnr" in metrics:
            scores.append(min(100.0, max(0.0, metrics["psnr"])))
        if "ms_ssim" in metrics:
            scores.append(metrics["ms_ssim"] * 100.0)
        if "lpips_vgg" in metrics:
            scores.append(max(0.0, (1.0 - metrics["lpips_vgg"]) * 100.0))
        return float(np.mean(scores)) if scores else 0.0

    def evaluate_no_reference(self, image) -> Dict[str, Any]:
        """No-reference evaluation (reference: qa:721-749). NIQE/BRISQUE
        come from the packaged pretrained models when present (the
        reference's preferred pyiqa tier) with the closed-form scores as
        fallback."""
        from .niqe import brisque_score, niqe_score

        t = self.thresholds
        img = self._preprocess(image)
        raw = N.no_reference_metrics(img)
        keys = list(raw)
        fetched = np.asarray(jnp.stack([jnp.asarray(raw[k], jnp.float32) for k in keys]))
        metrics = {k: float(v) for k, v in zip(keys, fetched)}  # one fetch
        v = niqe_score(img)
        if v is not None:
            metrics["niqe"] = float(v)
        v = brisque_score(img)
        if v is not None:
            metrics["brisque"] = float(v)
        metrics["niqe_level"] = self._level(
            metrics["niqe"], t.niqe_excellent, t.niqe_good, t.niqe_acceptable, lower_better=True
        )
        metrics["brisque_level"] = self._level(
            metrics["brisque"],
            t.brisque_excellent,
            t.brisque_good,
            t.brisque_acceptable,
            lower_better=True,
        )
        return metrics

    def evaluate_commercial(
        self, image, roi_regions: Optional[List[Dict[str, Any]]] = None
    ) -> Dict[str, Any]:
        """Commercial evaluation (reference: qa:814-852) incl. per-ROI
        metrics and delta-E levels."""
        t = self.thresholds
        img = self._preprocess(image)
        raw = C.evaluate_commercial_arrays(img, roi_regions)
        metrics = {k: _f(v) for k, v in raw.items()}
        for k in list(metrics):
            if k.startswith("brand_color_delta_e_"):
                idx = k.rsplit("_", 1)[1]
                metrics[f"brand_color_accuracy_{idx}"] = self._level(
                    metrics[k],
                    t.delta_e_excellent,
                    t.delta_e_good,
                    t.delta_e_acceptable,
                    lower_better=True,
                )
        return metrics

    def batch_evaluate(
        self, image_pairs: Sequence[Tuple[np.ndarray, np.ndarray]], scale_factor: int = 4
    ) -> List[Dict[str, Any]]:
        return [
            self.evaluate_full_reference(o, u, scale_factor) for o, u in image_pairs
        ]

    # -- reports -----------------------------------------------------------
    def generate_report(
        self,
        metrics: Dict[str, Any],
        report_type: str = "full",
        output_path: Optional[str] = None,
    ) -> str:
        """Text/JSON QA reports (reference: qa:1195-1348), English labels,
        same sectioning and keys."""
        if report_type == "json":
            report = json.dumps(
                {"timestamp": datetime.now().isoformat(), "metrics": metrics},
                indent=2,
                ensure_ascii=False,
            )
        elif report_type == "summary":
            report = self._summary_report(metrics)
        else:
            report = self._full_report(metrics)
        if output_path:
            with open(output_path, "w", encoding="utf-8") as f:
                f.write(report)
        return report

    def _summary_report(self, m: Dict[str, Any]) -> str:
        lines = ["=" * 50, "Super-Resolution QA Summary", "=" * 50, ""]
        if "psnr" in m:
            lines.append(f"PSNR:      {m['psnr']:.2f} dB")
        if "ms_ssim" in m:
            lines.append(f"MS-SSIM:   {m['ms_ssim']:.4f}")
        if "lpips_vgg" in m:
            lines.append(f"LPIPS:     {m['lpips_vgg']:.4f}")
        if "niqe" in m:
            lines.append(f"NIQE:      {m['niqe']:.2f}")
        if "overall_score" in m:
            lines.append(f"Overall:   {m['overall_score']:.2f}/100")
        lines += ["", "=" * 50]
        return "\n".join(lines)

    def _full_report(self, m: Dict[str, Any]) -> str:
        lines = [
            "=" * 70,
            "Super-Resolution Image Quality Assessment Report",
            "=" * 70,
            f"Generated: {datetime.now().strftime('%Y-%m-%d %H:%M:%S')}",
            "",
        ]
        if "psnr" in m:
            lines += ["-" * 70, "[Full-Reference Metrics]", "-" * 70]
            lines.append(f"PSNR:           {m.get('psnr', 0):.2f} dB    [{m.get('psnr_level', 'N/A')}]")
            lines.append(f"SSIM:           {m.get('ssim', 0):.4f}")
            lines.append(f"MS-SSIM:        {m.get('ms_ssim', 0):.4f}    [{m.get('ssim_level', 'N/A')}]")
            if "lpips_vgg" in m:
                lines.append(f"LPIPS (VGG):    {m['lpips_vgg']:.4f}    [{m.get('lpips_level', 'N/A')}]")
                lines.append(f"LPIPS (Alex):   {m.get('lpips_alex', 0):.4f}")
            lines.append("")
        ds_names = ["structure_color", "mid_frequency", "high_frequency"]
        if any(f"psnr_{n}" in m for n in ds_names):
            lines += ["-" * 70, "[Multiscale Downsample Comparison]", "-" * 70]
            for n in ds_names:
                if f"psnr_{n}" in m:
                    lines.append(f"  {n}:")
                    lines.append(f"    PSNR: {m[f'psnr_{n}']:.2f} dB")
                    lines.append(f"    SSIM: {m[f'ssim_{n}']:.4f}")
            lines.append("")
        if "niqe" in m:
            lines += ["-" * 70, "[No-Reference Metrics]", "-" * 70]
            lines.append(f"NIQE:           {m['niqe']:.2f}    [{m.get('niqe_level', 'N/A')}]")
            lines.append(f"BRISQUE:        {m['brisque']:.2f}    [{m.get('brisque_level', 'N/A')}]")
            lines.append(f"Sharpness:      {m.get('sharpness', 0):.2f}")
            lines.append(f"Contrast:       {m.get('contrast', 0):.2f}")
            lines.append(f"Colorfulness:   {m.get('colorfulness', 0):.2f}")
            lines.append("")
        if "commercial_score" in m:
            lines += ["-" * 70, "[Commercial Advertising Assessment]", "-" * 70]
            lines.append(f"Commercial score: {m['commercial_score']:.2f}/100")
            lines.append("")
            lines.append("  Detail fidelity:")
            lines.append(f"    Global sharpness: {m.get('global_sharpness', 0):.2f}")
            lines.append(f"    HF ratio:         {m.get('high_frequency_ratio', 0):.4f}")
            lines.append("")
            lines.append("  Visual comfort:")
            lines.append(f"    Oversharpen:      {m.get('oversharpen_score', 0):.2f}/100")
            lines.append(f"    Artifacts:        {m.get('artifact_score', 0):.2f}/100")
            lines.append(f"    Noise level:      {m.get('noise_level', 0):.2f}")
            lines.append(f"    Brightness unif.: {m.get('brightness_uniformity', 0):.2f}/100")
            lines.append("")
        if "overall_score" in m:
            lines += ["-" * 70, "[Overall]", "-" * 70]
            lines.append(f"Overall quality score: {m['overall_score']:.2f}/100")
            lines.append("")
        lines += [
            "-" * 70,
            "[Levels]  excellent | good | fair | poor",
            "=" * 70,
        ]
        return "\n".join(lines)
