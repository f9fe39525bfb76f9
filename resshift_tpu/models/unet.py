"""UNetModelSwin — the ResShift denoiser (NHWC, Flax linen).

Architecture parity with the reference `models/unet.py:603-912`:
  * conv-in -> per-level [ResBlock xN, Swin BasicLayer on the first block of
    each level whose resolution is in `attention_resolutions`] -> Downsample;
  * middle = ResBlock, BasicLayer, ResBlock;
  * decoder mirrors with skip-concat and Upsample;
  * timestep MLP: sinusoidal(model_channels) -> Dense(4x) -> SiLU -> Dense;
  * LQ conditioning: the LQ image (plus optional mask channel) goes through a
    strided-conv `feature_extractor` when lq_size > image_size, else identity,
    then is channel-concatenated with x_t (:689-705, :876-882).

The block sequence is recorded in `input_specs`/`output_specs` so the
checkpoint converter can walk torch's `input_blocks.N.M` indices one-to-one.
"""

from __future__ import annotations

import math
from dataclasses import field
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import Downsample, GroupNorm32, ResBlock, Upsample, timestep_embedding
from .swin import BasicLayer

Dtype = jnp.dtype


class UNetModelSwin(nn.Module):
    image_size: int = 64
    in_channels: int = 3
    model_channels: int = 160
    out_channels: int = 3
    num_res_blocks: Sequence[int] | int = (2, 2, 2, 2)
    attention_resolutions: Sequence[int] = (64, 32, 16, 8)
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 2, 4)
    conv_resample: bool = True
    num_heads: int = 1
    num_head_channels: int = 32
    use_scale_shift_norm: bool = True
    resblock_updown: bool = False
    swin_depth: int = 2
    swin_embed_dim: int = 192
    window_size: int = 8
    mlp_ratio: float = 4.0
    patch_norm: bool = False
    cond_lq: bool = True
    cond_mask: bool = False
    lq_size: int = 64
    dtype: Dtype = jnp.float32
    # Swin-kernel switch, threaded to every BasicLayer: True/False pin the
    # Pallas/XLA path for all traces of this module instance (the trainer
    # pins False — under AD the custom VJPs recompute the XLA composition,
    # making the Pallas forward pure extra work); None = auto at trace time
    use_pallas: bool | None = None

    def _nrb(self) -> list[int]:
        n = self.num_res_blocks
        return [n] * len(self.channel_mult) if isinstance(n, int) else list(n)

    def _swin_heads(self) -> int:
        if self.num_head_channels == -1:
            return self.num_heads
        return self.swin_embed_dim // self.num_head_channels

    def _basic_layer(self, ch: int, ds: int, name: str) -> BasicLayer:
        return BasicLayer(
            in_chans=ch,
            embed_dim=self.swin_embed_dim,
            num_heads=self._swin_heads(),
            window_size=self.window_size,
            depth=self.swin_depth,
            build_resolution=ds,
            patch_size=1,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=True,
            patch_norm=self.patch_norm,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray | None,
        timesteps: jnp.ndarray | None,
        lq: jnp.ndarray | None = None,
        mask: jnp.ndarray | None = None,
        lq_feat: jnp.ndarray | None = None,
        features_only: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """`lq_feat` / `features_only`: the LQ conditioning features are
        timestep-invariant, so samplers compute them ONCE per call
        (`features_only=True`, x/timesteps may be None) and feed them back
        via `lq_feat` for every denoising step — the reference re-runs the
        pyramid each step (unet.py:692-702)."""
        nrb = self._nrb()
        mc = self.model_channels
        ted = mc * 4

        if lq is not None and lq_feat is None:
            assert self.cond_lq
            if mask is not None:
                assert self.cond_mask
                lq = jnp.concatenate([lq, mask], axis=-1)
            lq = lq.astype(self.dtype)
            if self.lq_size != self.image_size:
                # strided conv feature pyramid (unet.py:692-702)
                base_chn = 16
                for ii in range(int(math.log2(self.lq_size / self.image_size))):
                    lq = nn.Conv(base_chn, (3, 3), padding=1, dtype=self.dtype,
                                 name=f"fe_conv{ii}")(lq)
                    lq = nn.silu(lq)
                    lq = Downsample(base_chn, True, out_channels=base_chn * 2,
                                    dtype=self.dtype, name=f"fe_down{ii}")(lq)
                    base_chn *= 2
            lq_feat = lq
        if features_only:
            return lq_feat

        emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_0")(emb)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        in_dtype = x.dtype
        if lq_feat is not None:
            x = jnp.concatenate([x.astype(self.dtype),
                                 lq_feat.astype(self.dtype)], axis=-1)

        h = x.astype(self.dtype)
        ch = int(self.channel_mult[0] * mc)
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(h)
        hs = [h]

        ds = self.image_size
        # ---- encoder ----
        for level, mult in enumerate(self.channel_mult):
            for jj in range(nrb[level]):
                h = ResBlock(
                    channels=ch, emb_channels=ted, dropout=self.dropout,
                    out_channels=int(mult * mc),
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype, name=f"in_l{level}_b{jj}_res",
                )(h, emb, deterministic=deterministic)
                ch = int(mult * mc)
                if ds in self.attention_resolutions and jj == 0:
                    h = self._basic_layer(ch, ds, f"in_l{level}_b{jj}_swin")(h)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = ResBlock(
                        channels=ch, emb_channels=ted, dropout=self.dropout,
                        out_channels=ch, use_scale_shift_norm=self.use_scale_shift_norm,
                        down=True, dtype=self.dtype, name=f"in_l{level}_down",
                    )(h, emb, deterministic=deterministic)
                else:
                    h = Downsample(ch, self.conv_resample, out_channels=ch,
                                   dtype=self.dtype, name=f"in_l{level}_down")(h)
                hs.append(h)
                ds //= 2

        # ---- middle ----
        h = ResBlock(channels=ch, emb_channels=ted, dropout=self.dropout,
                     use_scale_shift_norm=self.use_scale_shift_norm,
                     dtype=self.dtype, name="mid_res0")(h, emb, deterministic=deterministic)
        h = self._basic_layer(ch, ds, "mid_swin")(h)
        h = ResBlock(channels=ch, emb_channels=ted, dropout=self.dropout,
                     use_scale_shift_norm=self.use_scale_shift_norm,
                     dtype=self.dtype, name="mid_res1")(h, emb, deterministic=deterministic)

        # ---- decoder ----
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(nrb[level] + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(
                    channels=ch + skip.shape[-1], emb_channels=ted,
                    dropout=self.dropout, out_channels=int(mult * mc),
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype, name=f"out_l{level}_b{i}_res",
                )(h, emb, deterministic=deterministic)
                ch = int(mult * mc)
                if ds in self.attention_resolutions and i == 0:
                    h = self._basic_layer(ch, ds, f"out_l{level}_b{i}_swin")(h)
                if level and i == nrb[level]:
                    if self.resblock_updown:
                        h = ResBlock(
                            channels=ch, emb_channels=ted, dropout=self.dropout,
                            out_channels=ch,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            up=True, dtype=self.dtype, name=f"out_l{level}_up",
                        )(h, emb, deterministic=deterministic)
                    else:
                        h = Upsample(ch, self.conv_resample, out_channels=ch,
                                     dtype=self.dtype, name=f"out_l{level}_up")(h)
                    ds *= 2

        # ---- head (kept in the input dtype like the reference :893-895) ----
        # out_norm -> silu -> out_conv(C -> 3) through ops/tail_pallas.py —
        # the XLA composition by default (the fused kernel measured slower;
        # PERF.md ledger), the Pallas kernel only when use_pallas is pinned
        # True; same param names, so checkpoints are unchanged
        from ..ops.tail_pallas import gn_silu_conv3x3
        from .layers import _Conv3x3Params, _GroupNormParams

        h = h.astype(in_dtype)
        n_scale, n_bias = _GroupNormParams(name="out_norm")(h.shape[-1])
        ck, cb = _Conv3x3Params(self.out_channels, name="out_conv")(h.shape[-1])
        return gn_silu_conv3x3(h.astype(jnp.float32), n_scale, n_bias, ck, cb,
                               eps=1e-5, use_pallas=self.use_pallas)
