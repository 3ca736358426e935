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

from ..ops.resize import resize_bicubic_up

__all__ = ["ESPCN", "EDSR", "RCAN", "depth_to_space", "back_project"]


def depth_to_space(x: jax.Array, scale: int) -> jax.Array:
    """Pixel shuffle: [N, H, W, C*s^2] -> [N, H*s, W*s, C].

    Layout-safe TPU implementation. The naive einops rearrange (and even a
    single 5-D transpose) materializes temps whose minor dims are the phase
    or channel counts; TPU (8, 128) tiling pads those 10-80x at print-grade
    sizes. Two regimes:

    - small output channels (< 8, i.e. the final RGB stage): two
      stack+reshape interleaves (W phases then H phases) — XLA fuses the
      stacked layout op into the producer. Measured on v5e at the x3
      tail's stage-2 shape (1536^2 x 27 -> 4608^2 x 3): 4.1 ms vs 30.3 ms
      for the previous lax.pad interior-padding accumulate (the pads +
      selects were 28% of the whole SR ladder's device time);
    - large channels: one 5-D transpose whose minor dim is s*c (>= 128),
      which tiles cleanly.

    Channel decomposition (s1, s2, c) matches the einops convention.
    """
    n, h, w, cc = x.shape
    s = scale
    c = cc // (s * s)
    if c < 8:
        from ..ops.interleave import interleave_axis

        rows = []
        for i in range(s):
            parts = [
                jax.lax.slice_in_dim(x, (i * s + j) * c, (i * s + j + 1) * c, axis=3)
                for j in range(s)
            ]
            rows.append(interleave_axis(parts, axis=2))
        return interleave_axis(rows, axis=1)
    x = x.reshape(n, h, w, s, s * c)
    x = x.transpose(0, 1, 3, 2, 4)  # n, h, s1, w, s2*c
    x = x.reshape(n, h * s, w * s, c)
    return x


def _shuffle_factors(scale: int) -> list:
    """Decompose a scale into {2, 3} pixel-shuffle stages (4 -> 2x2 etc.).

    Progressive upsampling caps the pre-shuffle channel count at
    features*9 instead of features*scale^2 — a single-conv x4 shuffle
    materializes features*16 channels at full pre-shuffle resolution,
    which is the HBM peak for large tiles.
    """
    factors = []
    s = scale
    while s % 2 == 0 and s > 1:
        factors.append(2)
        s //= 2
    while s % 3 == 0 and s > 1:
        factors.append(3)
        s //= 3
    if s != 1:
        raise ValueError(f"unsupported scale {scale}: must factor into 2s and 3s")
    return factors


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
        if self.scale > 1:
            factors = _shuffle_factors(self.scale)
            for i, f in enumerate(factors[:-1]):
                h = nn.Conv(
                    (self.features // 2) * f * f, (3, 3), dtype=self.dtype,
                    name=f"up_{i}",
                )(h)
                h = nn.relu(depth_to_space(h, f))
            # Final residual stage in pre-shuffle space (zero-init keeps
            # the exact bicubic floor); depth_to_space takes the
            # layout-safe lax.pad path for 3-channel outputs.
            f = factors[-1]
            r = nn.Conv(
                self.channels * f * f,
                (3, 3),
                dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                name="conv_out",
            )(h)
            r = depth_to_space(r, f)
        else:
            r = nn.Conv(
                self.channels, (3, 3), dtype=self.dtype,
                kernel_init=nn.initializers.zeros, name="conv_out",
            )(h)
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
            factors = _shuffle_factors(self.scale)
            for i, f in enumerate(factors[:-1]):
                h = nn.Conv(
                    self.features * f * f, (3, 3), dtype=self.dtype, name=f"up_conv_{i}"
                )(h)
                h = depth_to_space(h, f)
            # Final residual stage in pre-shuffle space (see ESPCN): the
            # tail conv runs at 1/f^2 of the output resolution, zero-init
            # keeps the exact bicubic floor, and the 3-channel shuffle uses
            # the layout-safe lax.pad path.
            f = factors[-1]
            r = nn.Conv(
                self.channels * f * f,
                (3, 3),
                dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                name="tail",
            )(h)
            r = depth_to_space(r, f)
        else:
            r = nn.Conv(
                self.channels,
                (3, 3),
                dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                name="tail",
            )(h)
        return base + r.astype(jnp.float32) * 255.0


class _CABlock(nn.Module):
    """Residual channel-attention block (RCAN family): conv-relu-conv with
    a squeeze-excite gate over channels. The global pool is a (1, 1, C)
    tensor, so the two 1x1 convs are negligible FLOPs; the gate lets the
    net re-weight feature maps per tile content (text vs texture vs flat),
    which plain EDSR blocks cannot."""

    features: int
    reduction: int = 8
    res_scale: float = 0.1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype)(h)
        s = jnp.mean(h.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(self.dtype)
        s = nn.Conv(self.features // self.reduction, (1, 1), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Conv(self.features, (1, 1), dtype=self.dtype)(s)
        s = nn.sigmoid(s)
        return x + h * s * self.res_scale


class RCAN(nn.Module):
    """Channel-attention quality net (Zhang et al. 2018 RCAN family,
    single-group variant) — the third on-device model family next to
    ESPCN (fast) and EDSR (quality), standing in for the reference's
    highest-quality remote tier (super_resolution_module.py:561-711).
    Bicubic-residual with a zero-init tail like the others, so untrained
    weights reproduce exact bicubic."""

    scale: int = 2
    features: int = 64
    num_blocks: int = 10
    reduction: int = 8
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
            h = _CABlock(
                self.features, self.reduction, self.res_scale, self.dtype,
                name=f"cab_{i}",
            )(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="body_out")(h) + h0
        if self.scale > 1:
            factors = _shuffle_factors(self.scale)
            for i, f in enumerate(factors[:-1]):
                h = nn.Conv(
                    self.features * f * f, (3, 3), dtype=self.dtype, name=f"up_conv_{i}"
                )(h)
                h = depth_to_space(h, f)
            f = factors[-1]
            r = nn.Conv(
                self.channels * f * f, (3, 3), dtype=self.dtype,
                kernel_init=nn.initializers.zeros, name="tail",
            )(h)
            r = depth_to_space(r, f)
        else:
            r = nn.Conv(
                self.channels, (3, 3), dtype=self.dtype,
                kernel_init=nn.initializers.zeros, name="tail",
            )(h)
        return base + r.astype(jnp.float32) * 255.0


def back_project(
    sr: jax.Array,
    lr: jax.Array,
    scale: int,
    steps: int = 10,
    strength: float = 0.5,
    degradation: str = "bicubic",
) -> jax.Array:
    """Iterative back-projection refinement (Irani & Peleg 1991).

    Enforces downsample-consistency: sr <- sr + strength * Up(lr - Down(sr)).
    This is the on-device analog of the reference's "inference steps" knob
    (super_resolution_module.py:70 num_inference_steps): more steps, better
    LR-consistency. ``degradation`` picks the Down operator the fixed point
    enforces — it must match how the LR was actually produced:
    "bicubic" = cv2-parity bicubic kernels; "area" = scale x scale box
    average (exact cv2.INTER_AREA for integer scales, the corpus/eval
    degradation protocol). A mismatched Down pulls the image toward the
    wrong fixed point and costs PSNR instead of adding it.
    """
    from ..ops.resize import resize_bicubic

    lh, lw = lr.shape[-3], lr.shape[-2]

    if degradation == "area":

        def down(u: jax.Array) -> jax.Array:
            b, h, w, c = u.shape
            return u.reshape(b, lh, scale, lw, scale, c).mean(axis=(2, 4))

    elif degradation == "bicubic":

        def down(u: jax.Array) -> jax.Array:
            return resize_bicubic(u, lh, lw)

    else:
        raise ValueError(f"unknown IBP degradation {degradation!r}")

    def body(_, u):
        residual = lr.astype(jnp.float32) - down(u)
        return u + strength * resize_bicubic_up(residual, scale)

    return jax.lax.fori_loop(0, steps, body, sr.astype(jnp.float32))
