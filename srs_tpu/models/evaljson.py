"""Merge-safe EVAL.json access (the packaged-checkpoint evidence ledger).

EVAL.json carries one entry per packaged artifact (``edsr_l_x2``,
``cond_polish_x1``, ``ark_gen_x1``, ...) holding BOTH the trainer's
holdout stats and the acceptance evidence other scripts measure later
(held-out photo panel blocks, conditioning contracts, LPIPS ranking
accuracy). Round 4 lost acceptance records because each writer rewrote
entries wholesale (VERDICT r4 weak #3); every writer now goes through
:func:`update_eval`, which merges at FIELD level and only drops the
derived-evidence blocks the caller explicitly names as stale (a trainer
that just replaced the weights names them; an eval script names none).

Reference analog: the quality ledgers the reference keeps per provider
(quality_assessment_module.py:63-70 bands; super_resolution_module.py
provider metadata) — here made durable and machine-checkable.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterable, Optional

# Evidence blocks measured AGAINST a specific set of weights: a trainer
# that replaces the weights passes these as ``drop`` so stale acceptance
# records never outlive the checkpoints they measured.
DERIVED_EVIDENCE = (
    "photo_panel",
    "photo_panel_ensemble",
    "photo_panel_noise",
    "photo_panel_blur",
    "photo_holdout_x2",
    "cond_panel",
)


def eval_path(out_dir: str) -> str:
    return os.path.join(out_dir, "EVAL.json")


def load_eval(out_dir: str) -> Dict[str, Any]:
    path = eval_path(out_dir)
    if not os.path.isfile(path):
        return {}
    with open(path) as f:
        return json.load(f)


def update_eval(
    out_dir: str,
    key: str,
    fields: Dict[str, Any],
    drop: Iterable[str] = (),
    replace: bool = False,
) -> Dict[str, Any]:
    """Field-level merge of ``fields`` into entry ``key``; atomic write.

    Preserves every other entry and every other field of this entry.
    ``drop`` removes named fields first (trainers pass
    :data:`DERIVED_EVIDENCE` when the weights changed); ``replace=True``
    swaps the whole entry (for artifacts where every recorded field is
    weight-derived, e.g. the ARK generator). Returns the merged entry.
    """
    path = eval_path(out_dir)
    data = load_eval(out_dir)
    if replace:
        entry = data[key] = {}
    else:
        entry = data.setdefault(key, {})
    for k in drop:
        entry.pop(k, None)
    entry.update(fields)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return entry


def packaged_eval_dir(checkpoint_dir: Optional[str] = None) -> str:
    """The checkpoints dir whose EVAL.json ships with the package."""
    if checkpoint_dir:
        return checkpoint_dir
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "checkpoints")
