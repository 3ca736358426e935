"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's multi-node-without-cluster technique (SURVEY §4):
the reference fakes its agent cluster in-process; we fake a TPU pod slice
with ``--xla_force_host_platform_device_count=8`` so sharding/collective
paths compile and execute without TPU hardware. Must run before any jax
backend initialization.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache for the whole suite (not just tests that
# construct a pipeline, which enables it in __init__): the heavy tests are
# compile-dominated (shard_map programs on the 8-device mesh, zssr's
# training step), so a warm cache is the difference between a ~10 min and
# a ~3 min inner loop.
from srs_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs[:8]
