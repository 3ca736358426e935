"""Degradation-aware routing (models/routing.py): probe calibration and
the pipeline's per-input quality-model swap (round-2 verdict item 2)."""

import numpy as np
import pytest


def _clean_lr(seed, size=128):
    import cv2

    from srs_tpu.models.corpus import render_photo

    hr = render_photo(seed, size * 2)
    return cv2.resize(hr, (size, size), interpolation=cv2.INTER_AREA)


def test_clean_photo_inputs_route_clean():
    from srs_tpu.models.routing import estimate_degradation

    for seed in range(700, 708):
        est = estimate_degradation(_clean_lr(seed))
        assert not est.degraded, (seed, est)


def test_bundled_real_photos_route_by_true_noise():
    """Clean bundled *scene* photos route clean; the raw webcam frame
    (camera_rgb, true sensor noise sigma~6 — its temporal average scores
    ~1.2) must route as noise: a true positive, not a miscalibration.

    The photographed material textures (round-3 pool widening) are close-
    up captures with real sensor grain — some legitimately probe as noisy
    (the robust tier IS the right call there), so for those the contract
    is only: any degraded flag must be grain ("noise"), never "blur"."""
    import cv2

    from srs_tpu.models.photo_data import load_photos, photo_paths
    from srs_tpu.models.routing import estimate_degradation

    photos = load_photos()
    if not photos:
        pytest.skip("no bundled photos in this install")
    scene_markers = ("sklearn", "pygame")
    for path, ph in zip(photo_paths(), photos):
        lr = cv2.resize(ph, (ph.shape[1] // 2, ph.shape[0] // 2),
                        interpolation=cv2.INTER_AREA)
        est = estimate_degradation(lr)
        if "camera_rgb" in path:
            assert est.degraded and est.reason == "noise", est
        elif any(m in path for m in scene_markers):
            assert not est.degraded, (path, est)
        elif est.degraded:  # grainy texture close-ups: noise is honest
            assert est.reason == "noise", (path, est)


def test_noisy_inputs_route_degraded():
    from srs_tpu.models.routing import estimate_degradation

    rng = np.random.default_rng(0)
    for seed in range(700, 704):
        lr = _clean_lr(seed)
        noisy = np.clip(lr + rng.normal(0, 6, lr.shape), 0, 255).astype(np.float32)
        est = estimate_degradation(noisy)
        assert est.degraded and est.reason == "noise", est


def test_heavy_blur_routes_degraded():
    import cv2

    from srs_tpu.models.corpus import render_photo
    from srs_tpu.models.routing import estimate_degradation

    n_caught = 0
    for seed in range(700, 706):
        hr = render_photo(seed, 256)
        soft = cv2.GaussianBlur(hr, (0, 0), 2.2)
        lr = cv2.resize(soft, (128, 128), interpolation=cv2.INTER_AREA)
        if estimate_degradation(lr).degraded:
            n_caught += 1
    # conservative detector: must catch most heavy-blur inputs without
    # ever flagging clean ones (test above)
    assert n_caught >= 4, f"only {n_caught}/6 heavy-blur inputs detected"


def test_route_quality_model_guard(tmp_path):
    """The robust pick requires trained robust weights — with an empty
    checkpoint dir... the packaged fallback still applies, so use a fake
    model name to prove the guard."""
    from srs_tpu.models.routing import route_quality_model

    rng = np.random.default_rng(1)
    noisy = np.clip(_clean_lr(700) + rng.normal(0, 6, (128, 128, 3)), 0, 255)
    # unknown robust model -> guard keeps the clean net
    name, est = route_quality_model(noisy, "edsr_l", robust_model="espcn_polish")
    assert est.degraded
    # espcn_polish has no packaged x2 checkpoint -> stays on clean model
    assert name == "edsr_l"


def test_sr_gain_probe_orders_content():
    """The per-image self-probe (probe_sr_gain) reads strongly positive on
    learnable photo content and negative on content the net cannot model
    (pure noise has no cross-scale structure to learn)."""
    from srs_tpu.models.registry import is_pretrained
    from srs_tpu.models.routing import probe_sr_gain

    if not is_pretrained("edsr_l", 2):
        pytest.skip("no packaged edsr_l x2 checkpoint")
    lr = _clean_lr(720, 192)
    g_photo = probe_sr_gain(lr, "edsr_l", 2)
    assert g_photo is not None and g_photo > 0.3, g_photo
    rng = np.random.default_rng(9)
    noise = (rng.random((192, 192, 3)) * 255).astype(np.float32)
    g_noise = probe_sr_gain(noise, "edsr_l", 2)
    assert g_noise is not None and g_noise < 0.0, g_noise
    # too-small input: probe declines instead of guessing
    assert probe_sr_gain(lr[:64, :64], "edsr_l", 2) is None


def test_probe_sr_alpha_bounds_and_order():
    """probe_sr_alpha returns the probe gain PLUS the pooled least-squares
    shrinkage coefficient: ~1 where the net's residual is real detail
    (photo content), small where the residual is hallucination (pure
    noise has no cross-scale structure — the net's added high frequencies
    are uncorrelated with the truth)."""
    from srs_tpu.models.registry import is_pretrained
    from srs_tpu.models.routing import probe_sr_alpha, probe_sr_gain

    if not is_pretrained("edsr_l", 2):
        pytest.skip("no packaged edsr_l x2 checkpoint")
    lr = _clean_lr(720, 192)
    res = probe_sr_alpha(lr, "edsr_l", 2)
    assert res is not None
    g_photo, a_photo = res
    # the gain component must agree with probe_sr_gain (shared dispatch)
    assert g_photo == pytest.approx(probe_sr_gain(lr, "edsr_l", 2))
    rng = np.random.default_rng(9)
    noise = (rng.random((192, 192, 3)) * 255).astype(np.float32)
    g_noise, a_noise = probe_sr_alpha(noise, "edsr_l", 2)
    assert 0.0 <= a_noise <= 1.0 and 0.0 <= a_photo <= 1.0
    assert a_photo > a_noise, (a_photo, a_noise)
    assert a_photo > 0.6, a_photo
    # too-small input: declines like the gain probe
    assert probe_sr_alpha(lr[:64, :64], "edsr_l", 2) is None


def test_probe_crop_ladder_covers_small_inputs():
    """The probe steps down the fixed crop ladder on inputs smaller than
    its top rung — the round-5 panel's x3/x4 LR images (140x168, 105x126)
    must keep probe protection instead of silently disabling routing —
    while staying declined below the smallest rung (five sub-96 crops on
    one image are mostly the same pixels)."""
    from srs_tpu.models.registry import is_pretrained
    from srs_tpu.models.routing import _fit_crop, probe_sr_gain

    # rung selection is pure geometry
    assert _fit_crop(1000, 1000, 2, 192) == 192
    assert _fit_crop(140, 168, 3, 192) == 126  # 128 made x3-divisible
    assert _fit_crop(105, 126, 4, 192) == 96
    assert _fit_crop(64, 64, 2, 192) is None
    # an explicit small crop is honored as its own single rung
    assert _fit_crop(64, 64, 2, 64) == 64
    assert _fit_crop(200, 200, 2, 128) == 128

    if not is_pretrained("edsr_l", 2):
        pytest.skip("no packaged edsr_l x2 checkpoint")
    lr = _clean_lr(720, 192)
    # the x4-panel-LR-sized input now probes (rung 96)
    g_small = probe_sr_gain(lr[:105, :126], "edsr_l", 2)
    assert g_small is not None
    # same content, same net: the down-ladder reading agrees in sign with
    # the full-crop reading (both strongly positive on photo content)
    assert g_small > 0.3, g_small


def test_pipeline_probe_routes_to_shrink(tmp_path, monkeypatch):
    """sr_gain_route="shrink": a probe-negative input serves the
    residual-shrinkage ladder bicubic + alpha*(net - bicubic), records
    the alpha, and the pixels interpolate the two pure ladders."""
    import srs_tpu.models.routing as routing
    from srs_tpu.io.image import load_image
    from srs_tpu.pipeline import PipelineConfig, SuperResolutionPipeline

    lr = _clean_lr(713, 64)
    alpha = 0.4

    def run(route, probe_ret, out_name):
        cfg = PipelineConfig(block_size=64, target_resolution="128x128",
                             provider="quality", enable_qa=False,
                             sr_gain_route=route)
        if route == "shrink":
            monkeypatch.setattr(routing, "probe_sr_alpha",
                                lambda *a, **k: probe_ret)
        else:
            monkeypatch.setattr(routing, "probe_sr_gain",
                                lambda *a, **k: probe_ret)
        pipe = SuperResolutionPipeline(cfg)
        out = str(tmp_path / out_name)
        r = pipe.process(lr, out)
        assert r.success
        return pipe.last_run_info, load_image(out)

    info, shrunk = run("shrink", (-0.5, alpha), "shrink.png")
    assert info["provider"] == "shrink"
    assert info["sr_gain_probe"] == -0.5
    assert info["sr_gain_alpha"] == pytest.approx(alpha)
    info_b, bic = run("bicubic", -0.5, "bic.png")
    assert info_b["provider"] == "bicubic" and info_b["sr_gain_alpha"] is None
    info_q, net = run("bicubic", 1.5, "net.png")
    assert info_q["provider"] == "quality"
    expect = bic.astype(np.float64) + alpha * (net.astype(np.float64)
                                               - bic.astype(np.float64))
    # two independent quantize-to-uint8 roundings allow ~1.5 levels
    assert np.max(np.abs(shrunk.astype(np.float64) - expect)) <= 2.0
    # a probe-positive input under the shrink route serves the net as-is
    monkeypatch.setattr(routing, "probe_sr_alpha", lambda *a, **k: (1.5, 0.97))
    cfg = PipelineConfig(block_size=64, target_resolution="128x128",
                         provider="quality", enable_qa=False,
                         sr_gain_route="shrink")
    pipe = SuperResolutionPipeline(cfg)
    r = pipe.process(lr, str(tmp_path / "pos.png"))
    assert r.success
    assert pipe.last_run_info["provider"] == "quality"
    assert pipe.last_run_info["sr_gain_alpha"] is None


def test_best_shrink_candidate_picks_predicted_winner(monkeypatch):
    """best_shrink_candidate ranks candidates by the CLOSED-FORM shrunk
    MSE (m_bic - 2*alpha*num + alpha^2*den) and skips unprobeable ones."""
    import srs_tpu.models.routing as routing

    stats = {
        # net A: raw gain negative, weak correlation -> small alpha,
        # modest shrunk gain
        "net_a": (np.full(5, 4.0), np.full(5, 3.0),
                  np.full(5, 0.5), np.full(5, 2.0)),
        # net B: stronger correlated residual -> better shrunk MSE
        "net_b": (np.full(5, 4.0), np.full(5, 3.0),
                  np.full(5, 1.5), np.full(5, 2.0)),
        "net_c": None,  # not packaged: skipped
    }
    monkeypatch.setattr(
        routing, "_probe_stats",
        lambda img, name, scale, ckdir, crop: stats[name],
    )
    img = np.zeros((256, 256, 3), np.float32)
    best = routing.best_shrink_candidate(
        img, ("net_a", "net_c", "net_b"), 2)
    name, raw_gain, alpha, shrunk_gain = best
    assert name == "net_b"
    assert alpha == pytest.approx(0.75)  # 1.5/2.0
    # shrunk mse = 3 - 2*.75*1.5 + .5625*2 = 1.875
    assert shrunk_gain == pytest.approx(10 * np.log10(3.0 / 1.875))
    assert raw_gain == pytest.approx(10 * np.log10(3.0 / 4.0))
    # nothing probeable -> None
    monkeypatch.setattr(routing, "_probe_stats",
                        lambda *a: None)
    assert routing.best_shrink_candidate(img, ("net_a",), 2) is None


def test_best_shrink_candidate_loo_penalizes_in_sample_luck(monkeypatch):
    """Selection scores are leave-one-out: a candidate whose correlation
    flips sign across crops (in-sample alpha looks fine pooled, but each
    held-out crop is hurt by the alpha the OTHER crops fit) must lose to
    a consistent candidate that pooled in-sample scoring would rank as a
    tie or worse."""
    import srs_tpu.models.routing as routing

    stats = {
        # consistent: every crop agrees (num/den identical) -> LOO == pooled
        "steady": (np.full(5, 4.0), np.full(5, 3.0),
                   np.full(5, 0.8), np.full(5, 2.0)),
        # erratic: num alternates sign with large magnitude; pooled num
        # sums to 0.9 (alpha ~0.09 looks harmless in-sample) but each
        # LOO alpha is fit against the crop's own sign
        "erratic": (np.full(5, 4.0), np.full(5, 3.0),
                    np.array([3.0, -2.5, 3.0, -2.6, 0.0]), np.full(5, 2.0)),
    }
    monkeypatch.setattr(
        routing, "_probe_stats",
        lambda img, name, scale, ckdir, crop: stats[name],
    )
    img = np.zeros((256, 256, 3), np.float32)
    name, _raw, alpha, loo = routing.best_shrink_candidate(
        img, ("erratic", "steady"), 2)
    assert name == "steady"
    assert alpha == pytest.approx(0.4)  # 0.8/2.0, all-crop serving fit
    # steady: m_loo = 3 - 2*.4*.8 + .16*2 = 2.68
    assert loo == pytest.approx(10 * np.log10(3.0 / 2.68))


def test_pipeline_shrink_serves_texture_candidate(tmp_path, monkeypatch):
    """When a texture-tier candidate wins the in-sample probe, the shrink
    route pins the ladder to it (routed model + its alpha recorded)."""
    import srs_tpu.models.routing as routing
    from srs_tpu.models.registry import is_pretrained
    from srs_tpu.pipeline import PipelineConfig, SuperResolutionPipeline

    if not is_pretrained("edsr_m", 2):
        pytest.skip("needs a second packaged x2 net")
    lr = _clean_lr(715, 64)
    monkeypatch.setattr(routing, "probe_sr_alpha",
                        lambda *a, **k: (-0.5, 0.3))
    monkeypatch.setattr(
        routing, "best_shrink_candidate",
        lambda img, models, scale, **k: ("edsr_m", -0.2, 0.61, 0.4),
    )
    cfg = PipelineConfig(block_size=64, target_resolution="128x128",
                         provider="quality", enable_qa=False,
                         sr_gain_route="shrink",
                         texture_models=("edsr_m",))
    pipe = SuperResolutionPipeline(cfg)
    r = pipe.process(lr, str(tmp_path / "tex.png"))
    assert r.success
    info = pipe.last_run_info
    assert info["provider"] == "shrink"
    assert info["model"] == "edsr_m"
    assert info["models"] == ["edsr_m"]
    assert info["sr_gain_alpha"] == pytest.approx(0.61)


def test_default_sr_gain_route_is_shrink():
    """The routed-panel acceptance (EVAL pipeline_x2.routed_panel_shrink:
    shrink mean +1.35 >= bicubic route +1.32, min +0.107 > 0.0) flipped
    the default; this pins the accepted configuration."""
    from srs_tpu.pipeline import PipelineConfig

    assert PipelineConfig().sr_gain_route == "shrink"


def test_pipeline_probe_routes_to_bicubic(tmp_path, monkeypatch):
    """When the SR-gain probe measures the net below the floor, the whole
    job serves the bicubic ladder and records why (VERDICT r4 #7)."""
    import srs_tpu.models.routing as routing
    from srs_tpu.pipeline import PipelineConfig, SuperResolutionPipeline

    lr = _clean_lr(711, 64)
    cfg = PipelineConfig(block_size=64, target_resolution="128x128",
                         provider="quality", enable_qa=False,
                         sr_gain_route="bicubic")
    monkeypatch.setattr(routing, "probe_sr_gain",
                        lambda *a, **k: -0.5)
    pipe = SuperResolutionPipeline(cfg)
    r = pipe.process(lr, str(tmp_path / "probe_bicubic.png"))
    assert r.success
    assert pipe.last_run_info["provider"] == "bicubic"
    assert pipe.last_run_info["sr_gain_probe"] == -0.5
    # above the floor: the quality provider serves as configured
    monkeypatch.setattr(routing, "probe_sr_gain",
                        lambda *a, **k: 1.5)
    pipe2 = SuperResolutionPipeline(cfg)
    r2 = pipe2.process(lr, str(tmp_path / "probe_net.png"))
    assert r2.success
    assert pipe2.last_run_info["provider"] == "quality"


def test_pipeline_routes_noisy_input(tmp_path):
    """End-to-end: a noisy input swaps the quality tier to the robust net
    (visible through the SR module's built apply-fns)."""
    from srs_tpu.models.registry import is_pretrained
    from srs_tpu.pipeline import PipelineConfig, SuperResolutionPipeline

    if not is_pretrained("edsr_l_robust", 2):
        pytest.skip("no packaged robust checkpoint")
    rng = np.random.default_rng(2)
    lr = _clean_lr(710, 64)  # one 64px tile: routing is the subject, not tiling
    noisy = np.clip(lr + rng.normal(0, 6, lr.shape), 0, 255).astype(np.float32)
    cfg = PipelineConfig(block_size=64, target_resolution="128x128",
                         provider="quality", enable_qa=False)
    pipe = SuperResolutionPipeline(cfg)
    out = str(tmp_path / "routed.png")
    r = pipe.process(noisy, out)
    assert r.success
    assert ("edsr_l_robust", 2) in pipe.sr_module._apply_fns
    # clean input keeps the configured net
    pipe2 = SuperResolutionPipeline(cfg)
    r2 = pipe2.process(lr, str(tmp_path / "clean.png"))
    assert r2.success
    assert ("edsr_l_robust", 2) not in pipe2.sr_module._apply_fns
