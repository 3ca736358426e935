"""Linear fusion of diverse SR nets (the ``fusion`` quality mode).

The reference serves one remote provider per request (reference:
super_resolution_module.py:1031-1082 routes to Seedream OR veImageX);
srs-tpu's nets run on-device, cheap enough to apply several to the same
tile batch and combine. An affine (sum-to-one) least-squares combination
of members with *decorrelated* errors is the PSNR-optimal linear fusion,
and with only K scalars it cannot overfit. Weights are fitted offline on
the bundled real photographs (scripts/fit_fusion.py) and
packaged as ``FUSION.json`` next to the checkpoints. The held-out
evaluation photograph is never used for fitting
(tests/test_photo_holdout.py enforces this).

Runtime contract: members whose checkpoints are missing at load time are
dropped and the remaining weights renormalized (an untrained registry net
is bicubic-exact, which would silently turn its slot into a second
``bicubic`` member with the wrong weight).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["fusion_path", "load_fusion", "fit_affine_weights", "save_fusion"]

_PACKAGED_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "checkpoints")


def fusion_path(checkpoint_dir: Optional[str] = None) -> Optional[str]:
    """First existing FUSION.json: user checkpoint_dir, then packaged."""
    for d in (checkpoint_dir, _PACKAGED_DIR):
        if not d:
            continue
        p = os.path.join(os.path.expanduser(d), "FUSION.json")
        if os.path.isfile(p):
            return p
    return None


def load_fusion(
    scale: int, checkpoint_dir: Optional[str] = None
) -> Optional[Tuple[List[str], List[float]]]:
    """(members, weights) for ``scale`` or None if not packaged.

    Members are registry names plus the literal ``"bicubic"``; weights sum
    to 1 (affine fit — individual weights may exceed [0,1], e.g. a small
    negative bicubic weight acts as a learned unsharp term).
    """
    p = fusion_path(checkpoint_dir)
    if p is None:
        return None
    try:
        with open(p) as f:
            data = json.load(f)
        entry = data.get(f"x{scale}")
        if not entry:
            return None
        members = [str(m) for m in entry["members"]]
        weights = [float(w) for w in entry["weights"]]
        if len(members) != len(weights) or not members:
            return None
        return members, weights
    except Exception:
        return None


def save_fusion(
    per_scale: Dict[int, Tuple[Sequence[str], Sequence[float], Dict]],
    out_dir: Optional[str] = None,
) -> str:
    """Write FUSION.json (merging over any existing scales)."""
    d = os.path.expanduser(out_dir or _PACKAGED_DIR)
    p = os.path.join(d, "FUSION.json")
    data: Dict = {}
    if os.path.isfile(p):
        with open(p) as f:
            data = json.load(f)
    for scale, (members, weights, meta) in per_scale.items():
        data[f"x{scale}"] = {
            "members": list(members),
            "weights": [float(w) for w in weights],
            **meta,
        }
    with open(p, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    return p


def fit_affine_weights(
    outputs: Sequence[np.ndarray], target: np.ndarray
) -> np.ndarray:
    """Least-squares weights over member ``outputs`` minimizing MSE to
    ``target`` subject to sum(w) == 1.

    Substituting w_K = 1 - sum(w_0..K-2) reduces the constrained problem
    to an unconstrained K-1-dim normal-equation solve on the member
    *differences* — exact, tiny, and numerically tame because the
    differences are zero-mean-ish detail residuals.
    """
    K = len(outputs)
    if K == 1:
        return np.ones(1)
    t = target.astype(np.float64).ravel()
    ys = [np.asarray(o, np.float64).ravel() for o in outputs]
    base = ys[-1]
    D = np.stack([y - base for y in ys[:-1]], axis=1)  # [P, K-1]
    r = t - base
    g = D.T @ D
    b = D.T @ r
    # Ridge eps keeps near-duplicate members (correlated nets) solvable.
    w_head = np.linalg.solve(g + 1e-8 * np.trace(g) / max(len(b), 1) * np.eye(len(b)), b)
    return np.concatenate([w_head, [1.0 - float(np.sum(w_head))]])
