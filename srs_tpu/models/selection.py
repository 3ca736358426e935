"""Per-scale quality-tier selection from held-out panel evidence.

Round-4 finding (VERDICT r4 weak #2 / next #4): the packaged families
split the held-out photo panel — edsr_l wins x2 (+1.33 dB vs edsr_xl's
+1.17; wood texture -0.06 vs -0.64) while edsr_xl wins x3/x4 and is the
only trained x4 — but the pipeline could only pin ONE family for the
whole ladder, so every x2-only job got the panel-worse net. This module
picks the panel-best packaged net PER LADDER STEP from the durable
``photo_panel`` blocks in the checkpoints' EVAL.json (written by
scripts/photo_eval.py --write-eval).

Reference analog: the hybrid provider staging that picks a different
remote engine per pass (super_resolution_module.py:842-1009) — here the
choice is evidence-driven (measured dB on sources withheld from every
training path) instead of hardcoded.

Selection is conservative: the configured default only loses a step when
a candidate has BOTH a trained checkpoint at that scale and a strictly
better panel mean_delta on record; with no panel evidence, the default
stands untouched.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

from .evaljson import load_eval, packaged_eval_dir

# Quality-tier candidates, flagship first (iteration order breaks exact
# ties; the robust net is excluded — damaged-input routing owns it, see
# models/routing.py — as are the x1 polish/conditioning nets).
QUALITY_CANDIDATES = ("edsr_xl", "edsr_l", "edsr_m", "rcan", "espcn")

# (eval.json path, mtime) -> parsed ledger; selection runs per job and
# per ladder-factorization probe, so avoid re-reading an unchanged file.
_CACHE: Dict[Tuple[str, float], Dict[str, Any]] = {}


def _ledger(checkpoint_dir: Optional[str]) -> Dict[str, Any]:
    """EVAL.json of ``checkpoint_dir`` when it carries one, else the
    packaged ledger (a user dir holding only retrained weights still
    selects on the packaged evidence for the packaged nets)."""
    for d in (checkpoint_dir, packaged_eval_dir(None)):
        if not d:
            continue
        path = os.path.join(d, "EVAL.json")
        if os.path.isfile(path):
            key = (path, os.path.getmtime(path))
            if key not in _CACHE:
                _CACHE.clear()  # one live ledger at a time is plenty
                _CACHE[key] = load_eval(d)
            return _CACHE[key]
    return {}


def panel_best_model(
    scale: int,
    default: str,
    checkpoint_dir: Optional[str] = None,
    ensemble: bool = False,
    dtype: Any = None,
) -> str:
    """Panel-best packaged quality net for one ladder step of ``scale``.

    ``ensemble=True`` reads the ``photo_panel_ensemble`` blocks (the
    self-ensemble "+" mode changes the ranking: edsr_l+ > edsr_xl+ at
    x2). Falls back to ``default`` when no candidate carries evidence.
    """
    from .registry import is_pretrained

    data = _ledger(checkpoint_dir)
    field = "photo_panel_ensemble" if ensemble else "photo_panel"
    # default first: an exact tie never moves the configured net
    order = (default,) + tuple(
        n for n in QUALITY_CANDIDATES if n != default
    )
    best_name: Optional[str] = None
    best_delta = float("-inf")
    for name in order:
        entry = data.get(f"{name}_x{scale}") or {}
        block = entry.get(field) or entry.get("photo_panel") or {}
        delta = block.get("mean_delta")
        if delta is None:
            continue
        if delta <= best_delta:
            continue
        kwargs = {"dtype": dtype} if dtype is not None else {}
        if not is_pretrained(name, scale, checkpoint_dir, **kwargs):
            continue
        best_name, best_delta = name, float(delta)
    return best_name or default
