"""Model registry: named SR model variants and their parameters.

The reference's "providers" are remote services chosen by name
(super_resolution_module.py:44-49, 1031-1082); here they are registry
entries mapping to flax model constructors. Parameters are deterministic
zero-residual inits (exact bicubic behavior) unless a trained checkpoint
exists under ``ModelConfig.checkpoint_dir`` — checked via orbax at first
build.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .nets import EDSR, ESPCN, RCAN

logger = logging.getLogger(__name__)

__all__ = ["ModelSpec", "MODEL_REGISTRY", "build_model", "clear_param_cache"]


@dataclass(frozen=True)
class ModelSpec:
    name: str
    ctor: Callable[..., Any]
    kwargs: Dict[str, Any] = field(default_factory=dict)
    description: str = ""


MODEL_REGISTRY: Dict[str, ModelSpec] = {
    "espcn": ModelSpec(
        "espcn", ESPCN, {}, "fast sub-pixel CNN (veImageX-analog provider)"
    ),
    "espcn_polish": ModelSpec(
        "espcn_polish", ESPCN, {"scale": 1}, "scale-1 polish pass (fast_sr 1.0x analog)"
    ),
    "edsr_m": ModelSpec(
        "edsr_m", EDSR, {"num_blocks": 8}, "medium quality net (Seedream-analog provider)"
    ),
    "edsr_l": ModelSpec(
        "edsr_l", EDSR, {"num_blocks": 16, "features": 96}, "large quality net"
    ),
    "edsr_xl": ModelSpec(
        "edsr_xl", EDSR, {"num_blocks": 16, "features": 128},
        "MXU-native flagship: 128 feature lanes fill the 128-wide systolic "
        "array that pads edsr_l's 96 channels anyway (+78% FLOPs for ~8% "
        "wall time, measured on-chip)",
    ),
    "rcan": ModelSpec(
        "rcan", RCAN, {"num_blocks": 10},
        "channel-attention quality net (highest-quality tier)",
    ),
    "edsr_l_robust": ModelSpec(
        "edsr_l_robust", EDSR, {"num_blocks": 16, "features": 96},
        "degradation-robust large quality net (random blur/noise training "
        "ladder; for noisy/soft/compressed inputs)",
    ),
    "edsr_l_tex": ModelSpec(
        "edsr_l_tex", EDSR, {"num_blocks": 16, "features": 96},
        "texture-tier large net (edsr_l fine-tuned on the 'tex' corpus "
        "mix of photographed stationary materials); served only when the "
        "per-image SR-gain probe measures it best (models/routing."
        "best_shrink_candidate) — never a static default",
    ),
}

# (name, scale, pretrained, checkpoint_dir, dtype) -> (module, params)
_CACHE: Dict[Tuple[str, int, bool, Optional[str], str], Tuple[Any, Any]] = {}
# (name, scale, checkpoint_dir) -> whether a trained checkpoint was loaded
_LOADED: Dict[Tuple[str, int, Optional[str]], bool] = {}


def clear_param_cache() -> None:
    _CACHE.clear()
    _LOADED.clear()


def is_pretrained(
    name: str,
    scale: int = 2,
    checkpoint_dir: Optional[str] = None,
    dtype: Any = jnp.bfloat16,
) -> bool:
    """Whether ``build_model(name, scale, checkpoint_dir)`` served trained
    weights (vs the zero-residual bicubic-exact init). Drives the IBP
    policy: iterative back-projection is the quality floor for untrained
    nets but pulls a trained net's learned deblurring back toward bicubic
    (measured -0.75 dB on the held-out panel). Callers with a custom
    ``checkpoint_dir``/``dtype`` must pass them so the probe build matches
    the build they will use (the cache is keyed on both)."""
    key = (name, scale, checkpoint_dir)
    if key not in _LOADED:
        build_model(name, scale, checkpoint_dir, dtype=dtype)
    return _LOADED.get(key, False)


# Pretrained weights shipped with the package (trained on the procedural
# corpus, scripts/pretrain.py; the on-device answer to the reference's
# pretrained remote services, super_resolution_module.py:561-711).
PACKAGED_CHECKPOINT_DIR = os.path.join(os.path.dirname(__file__), "checkpoints")


def _try_load_checkpoint(
    name: str,
    scale: int,
    checkpoint_dir: Optional[str],
    module,
    fallback_packaged: bool = True,
    init_fn: Optional[Callable[[], Any]] = None,
):
    """User checkpoint_dir first, then the packaged pretrained weights
    (``fallback_packaged=False`` restricts to checkpoint_dir only — the
    fine-tune warm-start must fail loudly on a wrong path, not silently
    adopt the packaged base).

    Restores against the module's abstract param tree (``jax.eval_shape``)
    so checkpoints written on one backend (the packaged ones were trained
    on TPU and embed TPU shardings) load on any — CPU tests, the virtual
    mesh, or a different chip. ``init_fn`` overrides the standard
    single-image-input init for modules with extra call arguments (e.g.
    the conditioned polish)."""
    if init_fn is None:
        def init_fn():
            return module.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
            )

    dirs = [checkpoint_dir] + ([PACKAGED_CHECKPOINT_DIR] if fallback_packaged else [])
    for d in dirs:
        if not d:
            continue
        path = os.path.join(os.path.expanduser(d), f"{name}_x{scale}")
        if not os.path.isdir(path):
            continue
        try:
            import orbax.checkpoint as ocp

            # ensure_compile_time_eval: build_model can be reached from
            # inside a jit trace (the fused ladder program / the mesh
            # dispatcher); without it the restore's device_put returns
            # tracers, orbax raises, and the except below silently marks a
            # PACKAGED net untrained for the rest of the process (observed
            # round 5: fusion members rcan/edsr_m/espcn dropped and the
            # provider served a poisoned member list).
            with jax.ensure_compile_time_eval():
                abstract = jax.eval_shape(init_fn)
                sharding = jax.sharding.SingleDeviceSharding(
                    jax.local_devices()[0])
                abstract = jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(
                        x.shape, x.dtype, sharding=sharding),
                    abstract,
                )
                ckptr = ocp.StandardCheckpointer()
                return ckptr.restore(os.path.abspath(path), abstract)
        except Exception:
            logger.warning(
                "checkpoint restore failed for %s_x%d under %s "
                "(falling through)", name, scale, d, exc_info=True,
            )
            continue
    return None


def build_model(
    name: str,
    scale: int = 2,
    checkpoint_dir: Optional[str] = None,
    dtype: Any = jnp.bfloat16,
    pretrained: bool = True,
) -> Tuple[Any, Any]:
    """(flax module, params) for a registry entry at a given scale.

    Params come from, in order: in-process cache, an orbax checkpoint under
    ``checkpoint_dir``, the packaged pretrained weights, or deterministic
    init (PRNGKey(0), zero residual = exact bicubic).
    ``pretrained=False`` skips all checkpoints (the bicubic-exact floor,
    used by parity tests and as the degradation-ladder fallback).
    """
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; registered: {sorted(MODEL_REGISTRY)}")
    spec = MODEL_REGISTRY[name]
    kwargs = dict(spec.kwargs)
    if "scale" not in kwargs:
        kwargs["scale"] = scale
    kwargs["dtype"] = dtype
    key = (name, kwargs["scale"], pretrained, checkpoint_dir, str(jnp.dtype(dtype)))
    if key in _CACHE:
        return _CACHE[key]
    module = spec.ctor(**kwargs)
    params = (
        _try_load_checkpoint(name, kwargs["scale"], checkpoint_dir, module)
        if pretrained
        else None
    )
    if pretrained:
        _LOADED[(name, kwargs["scale"], checkpoint_dir)] = params is not None
    if params is None:
        # build_model may be reached from inside a jit trace (e.g. the
        # mesh dispatcher jitting the whole SR ladder); force a concrete
        # init so tracers never leak into the global cache.
        with jax.ensure_compile_time_eval():
            dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
            params = module.init(jax.random.PRNGKey(0), dummy)
    _CACHE[key] = (module, params)
    return module, params
