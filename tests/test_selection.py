"""Per-scale model selection (models/selection.py) + the durable
acceptance-evidence contract on EVAL.json (VERDICT r4 #4/#5).

The packaged EVAL.json must carry held-out photo-panel blocks for every
packaged quality-tier net, and selection must route each ladder step to
the panel-best net at that scale (edsr_l wins x2, edsr_xl wins x3/x4 on
the round-4 panel). Reference analog: per-pass engine choice in the
hybrid staging, super_resolution_module.py:842-1009.
"""

import json
import os

import pytest

from srs_tpu.models.evaljson import (DERIVED_EVIDENCE, load_eval,
                                     packaged_eval_dir, update_eval)

CKPT = packaged_eval_dir(None)


def _packaged_quality_nets():
    """(name, scale) pairs with a committed orbax save in the package."""
    out = []
    for name in ("espcn", "edsr_m", "rcan", "edsr_l", "edsr_xl"):
        for s in (2, 3, 4):
            if os.path.isfile(os.path.join(
                    CKPT, f"{name}_x{s}", "_CHECKPOINT_METADATA")):
                out.append((name, s))
    return out


def test_packaged_quality_tiers_carry_panel_evidence():
    """The nets the quality tier actually serves ship with photo_panel
    blocks (the acceptance records retrains must not clobber), and at
    x2 — where the families disagree — selection sees a real comparison
    (>= 2 candidates with evidence)."""
    data = load_eval(CKPT)
    # serving set: the per-scale winners + the flagship at every scale
    for key in ("edsr_l_x2", "edsr_xl_x2", "edsr_xl_x3", "edsr_xl_x4"):
        assert "photo_panel" in data.get(key, {}), \
            f"serving net {key} has no panel evidence"
    with_evidence = [
        (n, s) for n, s in _packaged_quality_nets()
        if "photo_panel" in data.get(f"{n}_x{s}", {})
    ]
    n_x2 = sum(1 for n, s in with_evidence if s == 2)
    assert n_x2 >= 2, "x2 selection needs >= 2 candidates with evidence"


def test_panel_blocks_have_required_fields():
    data = load_eval(CKPT)
    for key, entry in data.items():
        for field in ("photo_panel", "photo_panel_ensemble"):
            block = entry.get(field)
            if block is None:
                continue
            for req in ("mean_delta", "min_delta", "max_delta", "per_image"):
                assert req in block, f"{key}.{field} missing {req}"


def test_update_eval_merges_and_drops(tmp_path):
    d = str(tmp_path)
    update_eval(d, "net_x2", {"psnr": 1.0,
                              "photo_panel": {"mean_delta": 0.5}})
    # a second writer's fields merge without clobbering the first's
    update_eval(d, "net_x2", {"cond_panel": {"ok": True}})
    e = load_eval(d)["net_x2"]
    assert e["psnr"] == 1.0 and e["photo_panel"]["mean_delta"] == 0.5
    assert e["cond_panel"] == {"ok": True}
    # a retrain drops ONLY the stale derived evidence
    update_eval(d, "net_x2", {"psnr": 2.0}, drop=DERIVED_EVIDENCE)
    e = load_eval(d)["net_x2"]
    assert e["psnr"] == 2.0
    assert "photo_panel" not in e and "cond_panel" not in e
    # other entries never touched
    update_eval(d, "other_x3", {"a": 1})
    assert load_eval(d)["net_x2"]["psnr"] == 2.0


def test_panel_best_model_per_scale():
    """Selection follows the recorded panel: x2 -> edsr_l beats the
    edsr_xl default; x3/x4 -> edsr_xl stays."""
    from srs_tpu.models.selection import panel_best_model

    data = load_eval(CKPT)
    x2 = {n: data[f"{n}_x2"]["photo_panel"]["mean_delta"]
          for n in ("edsr_l", "edsr_xl")}
    assert x2["edsr_l"] > x2["edsr_xl"], (
        "precondition: round-4 panel has edsr_l winning x2; update this "
        "test if a retrain changed the ranking")
    assert panel_best_model(2, "edsr_xl", CKPT) == "edsr_l"
    assert panel_best_model(3, "edsr_xl", CKPT) == "edsr_xl"
    assert panel_best_model(4, "edsr_xl", CKPT) == "edsr_xl"
    # ensemble blocks rank the same way at x2 (edsr_l+ 1.43 > edsr_xl+ 1.39)
    assert panel_best_model(2, "edsr_xl", CKPT, ensemble=True) == "edsr_l"


def test_panel_best_falls_back_without_evidence(tmp_path):
    from srs_tpu.models.selection import panel_best_model

    # empty ledger -> the configured default stands (checkpoint_dir with
    # an EVAL.json that has no panel blocks)
    d = str(tmp_path)
    with open(os.path.join(d, "EVAL.json"), "w") as f:
        json.dump({"edsr_l_x2": {"psnr_net": 30.0}}, f)
    assert panel_best_model(2, "edsr_xl", d) == "edsr_xl"


def test_sr_module_resolves_mixed_ladder():
    """The engine serves the panel-best net per step and reports the
    per-step choice for resume keys / MFU accounting."""
    from srs_tpu.config import ModelConfig
    from srs_tpu.models.sr_module import SuperResolutionModule

    sr = SuperResolutionModule(config=ModelConfig(
        quality_model="edsr_xl", checkpoint_dir=CKPT,
        per_scale_selection=True))
    models = sr.resolve_ladder_models([2, 3, 4], "quality")
    assert models == ["edsr_l", "edsr_xl", "edsr_xl"]
    # explicit override (degradation routing) bypasses selection
    assert sr.resolve_ladder_models([2, 2], "quality", model="edsr_l_robust") \
        == ["edsr_l_robust", "edsr_l_robust"]
    # selection off -> the configured family everywhere
    sr2 = SuperResolutionModule(config=ModelConfig(
        quality_model="edsr_xl", checkpoint_dir=CKPT,
        per_scale_selection=False))
    assert sr2.resolve_ladder_models([2, 3], "quality") \
        == ["edsr_xl", "edsr_xl"]


def test_pipeline_x2_job_routes_panel_best():
    """An x2-only job serves the panel-best x2 net end-to-end
    (VERDICT r4 #4 acceptance) and records it in last_run_info."""
    import numpy as np

    from srs_tpu.pipeline import PipelineConfig, SuperResolutionPipeline

    rng = np.random.default_rng(3)
    img = (rng.random((72, 96, 3)) * 255).astype(np.float32)
    cfg = PipelineConfig(block_size=48, overlap_ratio=0.2,
                         target_resolution="192x144", provider="quality",
                         enable_qa=False, auto_route=False)
    pipe = SuperResolutionPipeline(cfg)
    out = os.path.join(os.environ.get("TMPDIR", "/tmp"), "sel_x2.png")
    r = pipe.process(img, out)
    assert r.success, r.error_message
    info = pipe.last_run_info
    assert info["ladder"] == [2]
    assert info["models"] == ["edsr_l"]
    assert info["model"] == "edsr_l"
