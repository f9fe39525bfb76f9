"""Swin window-attention stage (NHWC, Flax linen).

Mirrors the reference's `models/swin_transformer.py`:
  * `BasicLayer` = patch-embed 1x1 conv -> depth SwinTransformerBlocks
    (alternating shift 0 / ws//2) -> patch-unembed 1x1 conv (:348-450).
  * `WindowAttention` = W-MSA over ws*ws-token windows with a learned
    relative-position-bias table (:65-161).
  * Shifted-window masks are recomputed for the actual runtime resolution
    (:262-265) — here they are *baked at trace time* from the static shape,
    so each compiled tile shape carries its mask as a constant.
  * Norm layers are GroupNorm32 (not LayerNorm), and the MLP is two 1x1
    convs == Dense on the channel axis (:17-33, :197-205).
  * The shift/window size of a block is resolved from the *build-time*
    resolution (config image_size), NOT the runtime shape (:191-195); at
    runtime only the mask adapts.  GELU is exact (erf), matching torch.

TPU notes: window partition is a reshape+transpose XLA handles well; the
attention einsums run on the MXU batched over (B * num_windows).  A fused
Pallas kernel is provided in `resshift_tpu.ops.attention_pallas` and can be
enabled with `use_pallas=True`.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import GroupNorm32

Dtype = jnp.dtype


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C), row-major window order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=64)
def relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2ws-1)^2 bias table (swin:92-102)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=64)
def shifted_window_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws*ws, ws*ws) additive mask of 0 / -100.

    This replicates the reference's `calculate_mask` (swin:214-236)
    *bit-exactly, including its quirks*: the reference indexes an NCHW
    (1,1,H,W) tensor with NHWC-style `[:, h, w, :]` slices (so the region
    labels only partition the H axis), and flattens mask tokens w-major via
    `.permute(0,2,3,1)` (swin:230-231).  The shipped checkpoints were
    trained with this exact mask, so a textbook Swin mask would NOT be
    weight-compatible.
    """
    img = np.zeros((1, 1, h, w))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt  # faithful: hs hits the size-1 dim
            cnt += 1
    # reference window_partition on NCHW, then .permute(0,2,3,1).view(-1, N)
    win = img.reshape(1, 1, h // ws, ws, w // ws, ws)
    win = win.transpose(0, 2, 4, 3, 5, 1).reshape(-1, ws, ws, 1)
    win = win.transpose(0, 2, 3, 1).reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class _DenseParams(nn.Module):
    """Parameter holder matching nn.Dense's {kernel, bias} layout so the
    torch checkpoint converter stays unchanged."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
             if self.use_bias else jnp.zeros((self.features,), jnp.float32))
        return k, b


class WindowAttention(nn.Module):
    """W-MSA/SW-MSA over flattened windows (swin_transformer.py:65-161).

    Two execution paths sharing one parameter set:
      * `use_pallas=None` (auto) picks the fused Pallas TPU kernel
        (ops/swin_attention_pallas.py) on TPU — qkv proj, biased softmax and
        output proj in one VMEM-resident kernel;
      * the XLA einsum path everywhere else (and for parity tests).
    """

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: float | None = None
    dtype: Dtype = jnp.float32
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        from ..ops.swin_attention_pallas import (fused_window_attention,
                                                 pallas_available,
                                                 xla_window_attention)

        b_, n, c = x.shape
        nh = self.num_heads

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02 / 0.87962566103423978),
            ((2 * self.window_size - 1) ** 2, nh),
            jnp.float32,
        )
        wqkv, bqkv = _DenseParams(3 * c, use_bias=self.qkv_bias, name="qkv")(c)
        wproj, bproj = _DenseParams(c, name="proj")(c)

        # combined additive term: rel-pos bias (+ shifted-window mask)
        idx = jnp.asarray(relative_position_index(self.window_size).reshape(-1))
        bias = jnp.take(jnp.asarray(table), idx, axis=0)
        bias = bias.reshape(n, n, nh).transpose(2, 0, 1)  # (nh, N, N)
        if mask is not None:
            bias_mask = bias[None] + mask[:, None]  # (nW, nh, N, N)
        else:
            bias_mask = bias[None]  # (1, nh, N, N)
        if self.qk_scale is not None:
            # fold a custom qk scale into q via the kernel's hd**-0.5 default
            ratio = self.qk_scale / ((c // nh) ** -0.5)
            wqkv = wqkv.at[:, :c].multiply(ratio)
            if self.qkv_bias:
                bqkv = bqkv.at[:c].multiply(ratio)

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = pallas_available()
        fn = fused_window_attention if use_pallas else xla_window_attention
        return fn(x, wqkv.astype(self.dtype), bqkv.astype(self.dtype),
                  wproj.astype(self.dtype), bproj.astype(self.dtype),
                  bias_mask.astype(jnp.float32), nh)


class SwinTransformerBlock(nn.Module):
    """One Swin block: (S)W-MSA + channel MLP, GroupNorm32 norms
    (swin_transformer.py:163-281)."""

    dim: int
    build_resolution: tuple[int, int]  # config-time resolution (decides shift/ws)
    num_heads: int
    window_size: int = 8
    shift: bool = False  # odd blocks shift by ws//2
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        # build-time resolution fixes ws/shift (swin:191-195)
        ws = self.window_size
        shift_size = ws // 2 if self.shift else 0
        if min(self.build_resolution) <= ws:
            shift_size = 0
            ws = min(self.build_resolution)
        assert h % ws == 0 and w % ws == 0, f"{(h, w)} not divisible by window {ws}"

        shortcut = x
        x = GroupNorm32(name="norm1")(x)
        if shift_size > 0:
            x = jnp.roll(x, (-shift_size, -shift_size), axis=(1, 2))
            mask = jnp.asarray(shifted_window_mask(h, w, ws, shift_size))
        else:
            mask = None

        xw = window_partition(x, ws)
        xw = WindowAttention(
            dim=self.dim, window_size=ws, num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale, dtype=self.dtype,
            name="attn",
        )(xw, mask)
        x = window_reverse(xw, ws, h, w)

        if shift_size > 0:
            x = jnp.roll(x, (shift_size, shift_size), axis=(1, 2))

        x = shortcut + x
        # MLP with exact GELU (torch nn.GELU default), 1x1 convs == Dense
        y = GroupNorm32(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class BasicLayer(nn.Module):
    """Patch-embed -> depth Swin blocks -> patch-unembed
    (swin_transformer.py:348-450). patch_size=1 in all shipped configs."""

    in_chans: int
    embed_dim: int
    num_heads: int
    window_size: int
    depth: int = 2
    build_resolution: int = 64  # config img_size at this UNet level
    patch_size: int = 1
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    patch_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=p, dtype=self.dtype,
                    name="patch_embed_proj")(x)
        if self.patch_norm:
            x = GroupNorm32(name="patch_embed_norm")(x)
        res = (self.build_resolution // p, self.build_resolution // p)
        for i in range(self.depth):
            x = SwinTransformerBlock(
                dim=self.embed_dim,
                build_resolution=res,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift=(i % 2 == 1),
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                dtype=self.dtype,
                name=f"block{i}",
            )(x)
        x = nn.Conv(self.in_chans, (1, 1), dtype=self.dtype, name="patch_unembed_proj")(x)
        if self.patch_norm:
            x = GroupNorm32(name="patch_unembed_norm")(x)
        return x
