"""utils/tpu_guard + bench BENCH_LOCAL append plumbing."""

import pytest


def test_require_tpu_exits_3_on_cpu(monkeypatch):
    import jax

    from srs_tpu.utils import tpu_guard

    # tests force the CPU backend (conftest), so the guard must trip
    assert jax.default_backend() == "cpu"
    with pytest.raises(SystemExit) as e:
        tpu_guard.require_tpu()
    assert e.value.code == tpu_guard.TPU_MISSING_EXIT == 3


def test_require_tpu_passes_on_non_cpu(monkeypatch):
    import jax

    from srs_tpu.utils import tpu_guard

    class _Dev:
        device_kind = "TPU v5 lite"

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "devices", lambda: [_Dev()])
    tpu_guard.require_tpu()  # must not raise
