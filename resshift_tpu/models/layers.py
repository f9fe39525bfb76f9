"""Basic NN building blocks (NHWC, Flax linen).

Numerical-parity notes vs the reference (zsyOAOA/ResShift):
  * GroupNorm32 computes statistics in float32 and casts back
    (models/basic_ops.py:15-17); torch GroupNorm default eps=1e-5, the LDM
    autoencoder's Normalize uses eps=1e-6 (ldm/modules/diffusionmodules/
    model.py:46-47).
  * timestep_embedding concatenates cos first, then sin
    (models/basic_ops.py:99-117).
  * ResBlock: GN-SiLU-conv3x3, FiLM scale-shift timestep injection, zero-init
    output conv (models/unet.py:110-206).
  * Downsample = stride-2 3x3 conv, Upsample = nearest 2x + 3x3 conv
    (models/unet.py:53-108).
"""

from __future__ import annotations

import math

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype


def group_norm_fold(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    num_groups: int = 32, eps: float = 1e-5):
    """Per-(image, channel) folded GroupNorm affine: returns f32 (B, C)
    `w, b` with `normalized = x*w + b`.  Float32 statistics regardless of
    compute dtype (reference basic_ops.py:15-17).

    TPU-layout-friendly: reduce into (B, C) keeping C on the lane dimension,
    then a tiny (C, G) one-hot matmul sums channels within each group — no
    (…, G, C/G) reshape, which would put C/G (often 6-20) on lanes and
    force relayout copies.  Shared by GroupNorm32 and the fused
    norm+silu+conv tail kernel (ops/tail_pallas.py).
    """
    c = x.shape[-1]
    g = min(num_groups, c)
    assert c % g == 0, f"channels {c} not divisible by groups {g}"
    shape = x.shape
    spatial = tuple(range(1, x.ndim - 1))
    n_per_group = (c // g) * int(np.prod([shape[i] for i in spatial])) if spatial else c // g
    onehot = jnp.asarray(np.repeat(np.eye(g, dtype=np.float32), c // g, axis=0))  # (C, G)
    xf32sum = jnp.sum(x.astype(jnp.float32), axis=spatial)            # (B, C)
    xf32sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=spatial)  # (B, C)
    sum_g = xf32sum @ onehot   # (B, G)
    sq_g = xf32sq @ onehot
    mean_g = sum_g / n_per_group
    var_g = jnp.maximum(sq_g / n_per_group - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = mean_g @ onehot.T  # (B, C)
    inv_c = inv_g @ onehot.T
    w = inv_c * scale[None].astype(jnp.float32)
    b = bias[None].astype(jnp.float32) - mean_c * w
    return w, b


class GroupNorm32(nn.Module):
    """GroupNorm(32) with float32 statistics regardless of compute dtype."""

    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        orig_dtype = x.dtype
        w, b = group_norm_fold(x, scale, bias, self.num_groups, self.eps)
        spatial = tuple(range(1, x.ndim - 1))
        expand = (slice(None),) + (None,) * len(spatial) + (slice(None),)
        out = x.astype(jnp.float32) * w[expand] + b[expand]
        return out.astype(orig_dtype)


class _GroupNormParams(nn.Module):
    """Parameter holder matching GroupNorm32's {scale, bias} tree, for paths
    that consume the norm through a fused op (ops/tail_pallas.py)."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        return scale, bias


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embeddings, cos-first ordering (basic_ops.py:99-117)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def zeros_init():
    return nn.initializers.zeros


class _Conv3x3Params(nn.Module):
    """Parameter holder matching nn.Conv's {kernel, bias} tree so checkpoint
    conversion is unchanged when the conv itself runs through a fused op."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


class Upsample(nn.Module):
    """Nearest 2x + optional 3x3 conv (models/unet.py:53-81).

    Executed as four low-res 2x2 phase convs (ops/upsample.py): same math,
    2.25x fewer MACs, and no 4x-size pre-conv intermediate in HBM."""

    channels: int
    use_conv: bool
    out_channels: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.use_conv:
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        from ..ops.upsample import upsample_nearest_conv3x3

        out_ch = self.out_channels or self.channels
        kernel, bias = _Conv3x3Params(out_ch, name="conv")(x.shape[-1])
        return upsample_nearest_conv3x3(x, kernel, bias, compute_dtype=self.dtype)


class Downsample(nn.Module):
    """Stride-2 3x3 conv (or 2x2 avg-pool) (models/unet.py:83-108)."""

    channels: int
    use_conv: bool
    out_channels: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv:
            return nn.Conv(self.out_channels or self.channels, (3, 3), strides=2,
                           padding=1, dtype=self.dtype, name="op")(x)
        assert (self.out_channels or self.channels) == self.channels
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    """UNet residual block with FiLM timestep injection (models/unet.py:110-206).

    Param names mirror the torch Sequential indices so the checkpoint
    converter is mechanical: in_layers.0 (GN), in_layers.2 (conv),
    emb_layers.1 (linear), out_layers.0 (GN), out_layers.3 (conv, zero-init),
    skip_connection.
    """

    channels: int
    emb_channels: int
    dropout: float = 0.0
    out_channels: int | None = None
    use_conv: bool = False
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.float32
    # profiling ablation (tools/profile_step_census.py): reduce the block to
    # its skip path (identity / pool / 1x1 skip conv) with unchanged shapes
    skip_only: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        out_ch = self.out_channels or self.channels
        if self.skip_only and not self.up:
            if self.down:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            if out_ch == self.channels:
                return x
            if self.use_conv:
                return nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                               name="skip_connection")(x)
            return nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                           name="skip_connection")(x)

        h = GroupNorm32(name="in_norm")(x)
        h = nn.silu(h)
        if self.up:
            # conv(nearest2x(h)) via the fused phase decomposition
            from ..ops.upsample import upsample_nearest_conv3x3

            kernel, bias = _Conv3x3Params(out_ch, name="in_conv")(h.shape[-1])
            h = upsample_nearest_conv3x3(h, kernel, bias, compute_dtype=self.dtype)
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        else:
            if self.down:
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(h)

        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype, name="emb_proj",
        )(nn.silu(emb))
        emb_out = emb_out[:, None, None, :].astype(h.dtype)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
        else:
            h = h + emb_out
            h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="out_conv")(h)

        if out_ch == self.channels:
            skip = x
        elif self.use_conv:
            skip = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="skip_connection")(x)
        else:
            skip = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="skip_connection")(x)
        return skip + h
