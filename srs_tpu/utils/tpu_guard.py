"""Guard against silent CPU-backend fallback in TPU fleet stages.

The axon TPU plugin holds a single-owner lease; when a stage starts the
same second the previous owner exits, JAX can initialize with the CPU
backend instead and the run proceeds SILENTLY ~50x slower (round-5
incident: train_lpips burned 70 min of a 90-min stage budget on
tf_XLAEigen threads with the TPU idle). Trainers call
:func:`require_tpu` right after argument parsing; exit code 3 tells the
fleet's ``stage`` helper to wait for the lease and retry.
"""

from __future__ import annotations

import sys

# Fleet contract: "the TPU lease was not available at startup — retry me".
TPU_MISSING_EXIT = 3


def require_tpu() -> None:
    """Exit(3) unless JAX initialized a non-CPU backend.

    Must run before any real work (the backend is fixed at first use, so
    an in-process wait cannot recover — the process has to restart).
    """
    import jax

    backend = jax.default_backend()
    if backend == "cpu":
        print(
            "FATAL: JAX initialized the CPU backend (TPU lease not "
            "attached — previous owner still releasing?). Exiting 3 for "
            "the fleet to retry.",
            file=sys.stderr, flush=True,
        )
        sys.exit(TPU_MISSING_EXIT)
    print(f"backend: {backend} ({jax.devices()[0].device_kind})", flush=True)
