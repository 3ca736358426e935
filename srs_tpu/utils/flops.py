"""Analytic FLOP counting for the SR nets -> MFU reporting.

The round-2 verdict's open perf question was chip efficiency: the bench
reported MP/s and link rate but never said how much of the MXU the SR
stage actually uses. These helpers count the conv FLOPs of a registry
net analytically from its parameter tree (all registry architectures —
ESPCN/EDSR/RCAN — run every conv at LR resolution with a trailing
depth-to-space, so FLOPs = 2 * sum(kh*kw*cin*cout) * H_lr * W_lr exactly;
dense/1x1 attention layers in RCAN count the same way via their kernel
shapes). IBP back-projection and the blend are excluded and stated so:
they are bandwidth-bound resizes, not MXU work.

MFU = counted FLOPs / elapsed / chip peak. Peaks are the published bf16
numbers per TPU generation; unknown kinds fall back to v5e (197 TF) with
the kind echoed in the result so a misread is visible.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import numpy as np

__all__ = ["conv_flops_per_pixel", "ladder_flops", "multipass_ladder_flops",
           "chip_peak_flops", "mfu"]

# Published dense bf16 peak FLOP/s per chip generation.
_PEAKS = {
    "v4": 275e12,
    "v5 lite": 197e12,  # v5e
    "v5litepod": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6 lite": 918e12,  # Trillium
    "v6e": 918e12,
}


def chip_peak_flops(device: Optional[Any] = None) -> tuple[float, str]:
    """(peak bf16 FLOP/s, device kind) for the first/given device."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "unknown").lower()
    for key, peak in _PEAKS.items():
        if key in kind:
            return peak, kind
    return 197e12, kind  # conservative default (v5e)


def conv_flops_per_pixel(params) -> float:
    """2 * sum(kh*kw*cin*cout) over every conv kernel in a param tree —
    multiply-accumulate counted as 2 FLOPs, per LR pixel (valid for the
    registry nets: every conv runs at input resolution)."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(params):
        shape = getattr(leaf, "shape", ())
        if len(shape) == 4:  # [kh, kw, cin, cout]
            total += 2.0 * float(np.prod(shape))
        elif len(shape) == 2:  # dense (RCAN attention MLP)
            total += 2.0 * float(np.prod(shape))
    return total


def ladder_flops(
    model_name: str,
    ladder: List[int],
    block: int,
    n_tiles: int,
    checkpoint_dir: Optional[str] = None,
    models: Optional[List[str]] = None,
) -> float:
    """Total conv FLOPs of running ``ladder`` net passes over the tile
    batch (step i sees resolution block * prod(ladder[:i])). ``models``
    gives the per-step net when per-scale selection served a mixed
    ladder (pipeline.last_run_info["models"])."""
    from ..models.registry import build_model

    total = 0.0
    res = block
    for i, s in enumerate(ladder):
        name = models[i] if models and i < len(models) else model_name
        _, params = build_model(name, s, checkpoint_dir)
        total += conv_flops_per_pixel(params) * res * res * n_tiles
        res *= s
    return total


def multipass_ladder_flops(
    step_members: List[List],
    ladder: List[int],
    block: int,
    n_tiles: int,
    checkpoint_dir: Optional[str] = None,
) -> float:
    """Total conv FLOPs of a multi-pass ladder (self-ensemble / fusion).

    ``step_members`` is pipeline.last_run_info["step_members"]: per ladder
    step, a list of [net_name, n_passes] pairs — 8 passes for a dihedral
    "+" member, 1 otherwise; bicubic members are excluded upstream (a
    resize is bandwidth, not MXU work). The honest denominator for the
    ensemble/fusion cost rows: 8x the work must count as 8x the FLOPs or
    the tier's MFU reads as an 8x regression."""
    from ..models.registry import build_model

    total = 0.0
    res = block
    for s, members in zip(ladder, step_members):
        for name, passes in members:
            _, params = build_model(name, int(s), checkpoint_dir)
            total += passes * conv_flops_per_pixel(params) * res * res * n_tiles
        res *= int(s)
    return total


def mfu(flops: float, seconds: float, device: Optional[Any] = None) -> dict:
    """{"sr_tflops", "mfu_pct", "chip_kind"} for a measured stage."""
    peak, kind = chip_peak_flops(device)
    return {
        "sr_tflops": round(flops / 1e12, 2),
        "mfu_pct": round(100.0 * flops / max(seconds, 1e-9) / peak, 2),
        "chip_kind": kind,
    }
