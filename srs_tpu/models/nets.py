"""On-device super-resolution networks (flax).

These replace the reference's remote SR engines (reference:
super_resolution_module.py:561-711 `upscale_seedream` — diffusion API —
and :713-840 `upscale_veimagex` — CNN API) with TPU-resident conv +
pixel-shuffle models:

- :class:`ESPCN` — the "fast" provider (veImageX analog): 3 convs +
  depth-to-space, cheap enough for realtime prefilter/polish passes.
- :class:`EDSR` — the "quality" provider (Seedream analog): residual
  blocks with residual scaling + pixel-shuffle upsampler.

Both are *bicubic-residual* networks: the final conv is zero-initialized,
so an untrained model reproduces exact bicubic upsampling and training only
has to learn the residual detail. This guarantees the quality floor
(PSNR >= bicubic) regardless of training state — important because the
framework ships without pretrained weights (zero-egress build).

Compute in bfloat16 (MXU), parameters float32, channel-last NHWC. Inputs
and outputs are in the [0, 255] domain used throughout the pipeline;
normalization happens inside the model.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange

from ..ops.resize import resize_bicubic_up

__all__ = ["ESPCN", "EDSR", "depth_to_space", "back_project"]


def depth_to_space(x: jax.Array, scale: int) -> jax.Array:
    """Pixel shuffle: [N, H, W, C*s^2] -> [N, H*s, W*s, C]."""
    return rearrange(x, "n h w (s1 s2 c) -> n (h s1) (w s2) c", s1=scale, s2=scale)


class ESPCN(nn.Module):
    """Efficient sub-pixel CNN (Shi et al. 2016 architecture family).

    ``scale=1`` is the "polish" variant (identity at init) used for the
    hybrid ladder's stage 3 (reference: super_resolution_module.py:964-981
    fast_sr 1.0x quality polish).
    """

    scale: int = 2
    features: int = 64
    channels: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xn = (x.astype(jnp.float32) / 255.0 - 0.5).astype(self.dtype)
        base = (
            resize_bicubic_up(x.astype(jnp.float32), self.scale)
            if self.scale > 1
            else x.astype(jnp.float32)
        )
        h = nn.Conv(self.features, (5, 5), dtype=self.dtype, name="conv_in")(xn)
        h = nn.relu(h)
        h = nn.Conv(self.features // 2, (3, 3), dtype=self.dtype, name="conv_mid")(h)
        h = nn.relu(h)
        r = nn.Conv(
            self.channels * self.scale**2,
            (3, 3),
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="conv_out",
        )(h)
        r = depth_to_space(r, self.scale) if self.scale > 1 else r
        return base + r.astype(jnp.float32) * 255.0


class _ResBlock(nn.Module):
    features: int
    res_scale: float = 0.1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype)(h)
        return x + h * self.res_scale


class EDSR(nn.Module):
    """EDSR-style quality net (Lim et al. 2017 architecture family)."""

    scale: int = 2
    features: int = 64
    num_blocks: int = 8
    channels: int = 3
    res_scale: float = 0.1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xn = (x.astype(jnp.float32) / 255.0 - 0.5).astype(self.dtype)
        base = (
            resize_bicubic_up(x.astype(jnp.float32), self.scale)
            if self.scale > 1
            else x.astype(jnp.float32)
        )
        h0 = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="head")(xn)
        h = h0
        for i in range(self.num_blocks):
            h = _ResBlock(self.features, self.res_scale, self.dtype, name=f"block_{i}")(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="body_out")(h) + h0
        if self.scale > 1:
            h = nn.Conv(
                self.features * self.scale**2, (3, 3), dtype=self.dtype, name="up_conv"
            )(h)
            h = depth_to_space(h, self.scale)
        r = nn.Conv(
            self.channels,
            (3, 3),
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="tail",
        )(h)
        return base + r.astype(jnp.float32) * 255.0


def back_project(
    sr: jax.Array, lr: jax.Array, scale: int, steps: int = 10, strength: float = 0.5
) -> jax.Array:
    """Iterative back-projection refinement (Irani & Peleg 1991).

    Enforces downsample-consistency: sr <- sr + strength * Up(lr - Down(sr)).
    This is the on-device analog of the reference's "inference steps" knob
    (super_resolution_module.py:70 num_inference_steps): more steps, better
    LR-consistency. Down/Up are the cv2-parity bicubic kernels, so the
    fixed point is exactly "an SR image whose bicubic downsample is the
    input".
    """
    from ..ops.resize import resize_bicubic

    lh, lw = lr.shape[-3], lr.shape[-2]

    def body(_, u):
        residual = lr.astype(jnp.float32) - resize_bicubic(u, lh, lw)
        return u + strength * resize_bicubic_up(residual, scale)

    return jax.lax.fori_loop(0, steps, body, sr.astype(jnp.float32))
