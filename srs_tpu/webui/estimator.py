"""Processing cost/time estimator.

Parity port of the reference's live estimator (reference:
pages/config_page.py:23-68): scale = sqrt(target/current), tile count =
ceil(dim / (tile*(1-overlap)))^2-style grid math — except the remote-API
cost model ($5/1M calls, 5-15 s/tile) becomes a chip-time model: measured
MP/s per chip (from the last bench or a conservative default) instead of
API-call pricing.
"""

from __future__ import annotations

import math
from typing import Dict

# Measured round-2 steady state on one tunneled v5e (BENCH_LOCAL.md):
# 6.3 MP/s single-job, 8.1 sustained in batch mode; keep a margin below.
DEFAULT_MP_PER_SEC = 5.0


def calculate_estimates(
    width: int,
    height: int,
    target_pixels: int,
    tile_size: int = 1024,
    overlap_ratio: float = 0.2,
    mp_per_sec: float = DEFAULT_MP_PER_SEC,
    num_chips: int = 1,
    self_ensemble: bool = False,
) -> Dict[str, float]:
    current = width * height
    scale = math.sqrt(target_pixels / max(current, 1))
    step = tile_size * (1 - overlap_ratio)
    tiles_x = math.ceil(width / step)
    tiles_y = math.ceil(height / step)
    num_tiles = tiles_x * tiles_y
    target_mp = target_pixels / 1e6
    est_seconds = target_mp / max(mp_per_sec * num_chips, 1e-6)
    if self_ensemble:
        # "+" runs the SR stage 8x; SR is ~12% of measured e2e time
        # (BENCH_r04 stage split), so e2e ~= 1 + 7 * 0.12
        est_seconds *= 1.84
    return {
        "scale_factor": scale,
        "tiles_x": tiles_x,
        "tiles_y": tiles_y,
        "num_tiles": num_tiles,
        "target_mp": target_mp,
        "estimated_seconds": est_seconds,
        "estimated_chip_seconds": target_mp / max(mp_per_sec, 1e-6),
    }
