"""Alternative denoiser architectures kept by the reference for ablations.

  * `UNetModel` — the guided-diffusion UNet with *global* QKV attention at
    the attention resolutions, optional class conditioning `y`, and
    pixel-unshuffle LQ concatenation (models/unet.py:346-601, AttentionBlock
    :224-263, QKVAttention[Legacy] :265-344).
  * `UNetModelConv` — norm-free all-conv UNet (models/unet.py:914-1180);
    note its quirk: with use_scale_shift_norm the FiLM is applied after a
    SiLU (out_layers[0] is the activation, :997-1001).

Shipped ResShift configs use UNetModelSwin; these exist for capability
parity and ablation experiments.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Downsample, GroupNorm32, ResBlock, Upsample, timestep_embedding

Dtype = jnp.dtype


def pixel_unshuffle(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """F.pixel_unshuffle for NHWC: (B, H, W, C) -> (B, H/f, W/f, C*f*f).

    Channel ordering matches torch: out[..., c*f*f + fy*f + fx].
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


class GlobalAttentionBlock(nn.Module):
    """AttentionBlock: GN -> 1x1 qkv -> multi-head global attention ->
    zero-init 1x1 proj, residual (unet.py:224-263)."""

    channels: int
    num_heads: int = 1
    num_head_channels: int = -1
    use_new_attention_order: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        nh = (self.num_heads if self.num_head_channels == -1
              else c // self.num_head_channels)
        hd = c // nh
        xn = GroupNorm32(name="norm")(x).reshape(b, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(xn)  # (B, T, 3C)
        if self.use_new_attention_order:
            # layout [q_allheads | k | v] (QKVAttention, unet.py:306-344)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, h * w, nh, hd)
            k = k.reshape(b, h * w, nh, hd)
            v = v.reshape(b, h * w, nh, hd)
        else:
            # layout [head0(q,k,v) | head1(q,k,v) | ...] (Legacy, :265-304)
            qkv = qkv.reshape(b, h * w, nh, 3 * hd)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1 / jnp.sqrt(jnp.sqrt(jnp.asarray(hd, jnp.float32))).astype(x.dtype)
        attn = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                       name="proj_out")(out)
        return x + out.reshape(b, h, w, c)


class UNetModel(nn.Module):
    """Plain guided-diffusion UNet (models/unet.py:346-601)."""

    image_size: int = 64
    in_channels: int = 3
    model_channels: int = 160
    out_channels: int = 3
    num_res_blocks: Sequence[int] | int = 2
    attention_resolutions: Sequence[int] = (32, 16, 8)
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: int | None = None
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    cond_lq: bool = False
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def _nrb(self):
        n = self.num_res_blocks
        return [n] * len(self.channel_mult) if isinstance(n, int) else list(n)

    def _attn(self, ch, name):
        return GlobalAttentionBlock(
            channels=ch, num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            use_new_attention_order=self.use_new_attention_order,
            dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, timesteps, y=None, lq=None):
        nrb = self._nrb()
        mc = self.model_channels
        ted = mc * 4
        emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_0")(emb)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))
        if self.num_classes is not None:
            assert y is not None
            emb = emb + nn.Embed(self.num_classes, ted, name="label_emb")(y)

        if lq is not None:
            assert self.cond_lq
            if lq.shape[1:3] != x.shape[1:3]:
                lq = pixel_unshuffle(lq, 2)  # unet.py:569-573
            x = jnp.concatenate([x, lq.astype(x.dtype)], axis=-1)

        h = x.astype(self.dtype)
        ch = int(self.channel_mult[0] * mc)
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(h)
        hs = [h]
        ds = self.image_size
        for level, mult in enumerate(self.channel_mult):
            for jj in range(nrb[level]):
                h = ResBlock(channels=ch, emb_channels=ted, dropout=self.dropout,
                             out_channels=int(mult * mc),
                             use_scale_shift_norm=self.use_scale_shift_norm,
                             dtype=self.dtype, name=f"in_l{level}_b{jj}_res")(h, emb)
                ch = int(mult * mc)
                if ds in self.attention_resolutions:
                    h = self._attn(ch, f"in_l{level}_b{jj}_attn")(h)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = ResBlock(channels=ch, emb_channels=ted, out_channels=ch,
                                 use_scale_shift_norm=self.use_scale_shift_norm,
                                 down=True, dtype=self.dtype,
                                 name=f"in_l{level}_down")(h, emb)
                else:
                    h = Downsample(ch, self.conv_resample, out_channels=ch,
                                   dtype=self.dtype, name=f"in_l{level}_down")(h)
                hs.append(h)
                ds //= 2

        h = ResBlock(channels=ch, emb_channels=ted,
                     use_scale_shift_norm=self.use_scale_shift_norm,
                     dtype=self.dtype, name="mid_res0")(h, emb)
        h = self._attn(ch, "mid_attn")(h)
        h = ResBlock(channels=ch, emb_channels=ted,
                     use_scale_shift_norm=self.use_scale_shift_norm,
                     dtype=self.dtype, name="mid_res1")(h, emb)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(nrb[level] + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(channels=ch + skip.shape[-1], emb_channels=ted,
                             out_channels=int(mult * mc),
                             use_scale_shift_norm=self.use_scale_shift_norm,
                             dtype=self.dtype, name=f"out_l{level}_b{i}_res")(h, emb)
                ch = int(mult * mc)
                if ds in self.attention_resolutions:
                    h = self._attn(ch, f"out_l{level}_b{i}_attn")(h)
                if level and i == nrb[level]:
                    if self.resblock_updown:
                        h = ResBlock(channels=ch, emb_channels=ted, out_channels=ch,
                                     use_scale_shift_norm=self.use_scale_shift_norm,
                                     up=True, dtype=self.dtype,
                                     name=f"out_l{level}_up")(h, emb)
                    else:
                        h = Upsample(ch, self.conv_resample, out_channels=ch,
                                     dtype=self.dtype, name=f"out_l{level}_up")(h)
                    ds *= 2

        h = h.astype(x.dtype)
        h = GroupNorm32(name="out_norm")(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                       name="out_conv")(nn.silu(h))


class ResBlockConv(nn.Module):
    """Norm-free residual block (unet.py:914-1004).  Quirk preserved: with
    scale-shift conditioning, FiLM applies AFTER the SiLU."""

    channels: int
    emb_channels: int
    out_channels: int | None = None
    use_conv: bool = False
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        out_ch = self.out_channels or self.channels
        h = nn.silu(x)
        if self.up:
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(h)
        emb_out = nn.Dense(2 * out_ch if self.use_scale_shift_norm else out_ch,
                           dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        emb_out = emb_out[:, None, None, :].astype(h.dtype)
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = nn.silu(h) * (1 + scale) + shift
        else:
            h = nn.silu(h + emb_out)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="out_conv")(h)
        if out_ch == self.channels:
            skip = x
        elif self.use_conv:
            skip = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                           name="skip_connection")(x)
        else:
            skip = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="skip_connection")(x)
        return skip + h


class UNetModelConv(nn.Module):
    """Norm-free all-conv UNet, no attention (unet.py:1006-1180)."""

    in_channels: int = 3
    model_channels: int = 160
    out_channels: int = 3
    num_res_blocks: Sequence[int] | int = 2
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    cond_lq: bool = True
    dtype: Dtype = jnp.float32

    def _nrb(self):
        n = self.num_res_blocks
        return [n] * len(self.channel_mult) if isinstance(n, int) else list(n)

    @nn.compact
    def __call__(self, x, timesteps, lq=None):
        nrb = self._nrb()
        mc = self.model_channels
        ted = mc * 4
        emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_0")(emb)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))
        if lq is not None:
            assert self.cond_lq
            if lq.shape[1:3] != x.shape[1:3]:
                lq = pixel_unshuffle(lq, 2)
            x = jnp.concatenate([x, lq.astype(x.dtype)], axis=-1)

        rb = lambda ch, out, name, **kw: ResBlockConv(
            channels=ch, emb_channels=ted, out_channels=out,
            use_scale_shift_norm=self.use_scale_shift_norm, dtype=self.dtype,
            name=name, **kw)

        h = x.astype(self.dtype)
        ch = int(self.channel_mult[0] * mc)
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(h)
        hs = [h]
        for level, mult in enumerate(self.channel_mult):
            for jj in range(nrb[level]):
                h = rb(ch, int(mult * mc), f"in_l{level}_b{jj}_res")(h, emb)
                ch = int(mult * mc)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = rb(ch, ch, f"in_l{level}_down", down=True)(h, emb)
                else:
                    h = Downsample(ch, self.conv_resample, out_channels=ch,
                                   dtype=self.dtype, name=f"in_l{level}_down")(h)
                hs.append(h)

        h = rb(ch, None, "mid_res0")(h, emb)
        h = rb(ch, None, "mid_res1")(h, emb)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(nrb[level] + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = rb(ch + skip.shape[-1], int(mult * mc),
                       f"out_l{level}_b{i}_res")(h, emb)
                ch = int(mult * mc)
                if level and i == nrb[level]:
                    if self.resblock_updown:
                        h = rb(ch, ch, f"out_l{level}_up", up=True)(h, emb)
                    else:
                        h = Upsample(ch, self.conv_resample, out_channels=ch,
                                     dtype=self.dtype, name=f"out_l{level}_up")(h)

        h = h.astype(x.dtype)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                       name="out_conv")(nn.silu(h))
