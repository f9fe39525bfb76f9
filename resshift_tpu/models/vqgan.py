"""VQGAN autoencoder (f4/f8) — NHWC Flax linen.

Parity with the reference's LDM modules:
  * Encoder/Decoder conv backbones — `ldm/modules/diffusionmodules/model.py`
    (Encoder :452-547, Decoder :550-660, ResnetBlock :90-149, AttnBlock
    :152-203, Up/Downsample :50-88).  GroupNorm eps=1e-6 (:46-47), swish
    nonlinearity, asymmetric (0,1) padding on the strided downsample conv.
  * NOTE: even with `attn_resolutions: []` both Encoder and Decoder keep one
    full self-attention block at the bottleneck (`mid.attn_1`, :505-509,
    :594-600).  For large tiles this is computed with a query-chunked
    (flash-style) softmax so memory stays O(N).
  * VectorQuantizer2 — `ldm/modules/vqvae/quantize.py:213-329`: L2-nearest
    codebook lookup with straight-through gradients.  `VQModel.encode`
    returns the *pre-quantization* continuous latent; quantization happens
    inside `decode` (ldm/models/autoencoder.py:28-40).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype


from .layers import GroupNorm32


def _norm(name: str):
    # LDM's Normalize: GroupNorm(32, eps=1e-6) computed in f32 (model.py:46-47)
    return GroupNorm32(eps=1e-6, name=name)


def _conv(quant, features, kernel_size=(3, 3), *, strides=(1, 1), padding=1,
          dtype=jnp.float32, name):
    """nn.Conv, or its int8-quantized drop-in when quant == 'int8'
    (ops/quant.py — identical param names/shapes, so checkpoints load
    unchanged).  EXPERIMENTAL: isolated conv chains gain 1.6-1.7x on v5e
    but the composed VQGAN phases measured net-negative (PERF.md)."""
    if quant == "int8":
        from ..ops.quant import QConv

        return QConv(features, kernel_size, strides=strides, padding=padding,
                     dtype=dtype, name=name)
    return nn.Conv(features, kernel_size, strides=strides, padding=padding,
                   dtype=dtype, name=name)


class ResnetBlock(nn.Module):
    in_channels: int
    out_channels: int | None = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    quant: str | None = None  # 'int8' = serving-only quantized convs
    # census ablation (tools/profile_decoder_census.py): collapse the block
    # to its skip path (shape-preserving); never set in production configs.
    skip_only: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        out_ch = self.out_channels or self.in_channels
        if self.skip_only:
            if self.in_channels != out_ch:
                return nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                               name="nin_shortcut")(x)
            return x
        h = _norm("norm1")(x)
        h = nn.silu(h)
        h = _conv(self.quant, out_ch, dtype=self.dtype, name="conv1")(h)
        h = _norm("norm2")(h)
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = _conv(self.quant, out_ch, dtype=self.dtype, name="conv2")(h)
        if self.in_channels != out_ch:
            x = _conv(self.quant, out_ch, (1, 1), padding=0, dtype=self.dtype,
                      name="nin_shortcut")(x)
        return x + h


def _chunked_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Query-chunked softmax attention: O(chunk*N) memory.  q,k,v: (B,N,C)."""
    b, n, c = q.shape
    scale = c**-0.5
    pad = (-n) % chunk
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    nq = qp.shape[1] // chunk
    qc = qp.reshape(b, nq, chunk, c)

    def body(carry, qi):
        w = jnp.einsum("bqc,bkc->bqk", qi * scale, k)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(v.dtype)
        return carry, jnp.einsum("bqk,bkc->bqc", w, v)

    _, out = jax.lax.scan(body, None, qc.transpose(1, 0, 2, 3))
    out = out.transpose(1, 0, 2, 3).reshape(b, nq * chunk, c)
    return out[:, :n]


class AttnBlock(nn.Module):
    """Single-head full self-attention over all pixels (model.py:152-203)."""

    in_channels: int
    dtype: Dtype = jnp.float32
    chunk_threshold: int = 16384  # switch to chunked softmax above this token count
    identity: bool = False        # census ablation: skip the whole block
    # tri-state kernel switch (same contract as UNetModelSwin.use_pallas):
    # True/False pin the flash-kernel/XLA path and are part of the module
    # (hence of any jit cache key); None = auto via flash_available().  The
    # tensor-parallel sampler pins False — GSPMD can partition the XLA
    # composition but not the Pallas custom call.
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.identity:
            return x
        b, h, w, c = x.shape
        hn = _norm("norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn).reshape(b, h * w, c)

        n = h * w
        from ..ops.flash_attention_pallas import flash_attention_1h, flash_available

        ok = flash_available(n, c) if self.use_pallas is None else (
            self.use_pallas and flash_available(n, c))
        if ok and n >= 512:
            out = flash_attention_1h(q, k, v)
        elif n > self.chunk_threshold:
            out = _chunked_attention(q, k, v, chunk=4096)
        else:
            attn = jnp.einsum("bqc,bkc->bqk", q * (c**-0.5), k)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
            out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = out.reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    """Asymmetric-pad stride-2 conv (model.py:68-88)."""

    in_channels: int
    with_conv: bool = True
    dtype: Dtype = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return _conv(self.quant, self.in_channels, strides=(2, 2),
                         padding=((0, 0), (0, 0)), dtype=self.dtype,
                         name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    """Nearest 2x + 3x3 conv (model.py:50-66), run as four low-res 2x2 phase
    convs (ops/upsample.py) — same math, 2.25x fewer MACs."""

    in_channels: int
    with_conv: bool = True
    dtype: Dtype = jnp.float32
    cheap: bool = False  # census ablation: conv-free nearest repeat

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.with_conv or self.cheap:
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        from ..ops.upsample import upsample_nearest_conv3x3
        from .layers import _Conv3x3Params

        kernel, bias = _Conv3x3Params(self.in_channels, name="conv")(x.shape[-1])
        return upsample_nearest_conv3x3(x, kernel, bias, compute_dtype=self.dtype)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: Sequence[int] | int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    in_channels: int = 3
    z_channels: int = 3
    double_z: bool = False
    dropout: float = 0.0
    resamp_with_conv: bool = True
    dtype: Dtype = jnp.float32
    quant: str | None = None  # 'int8' serving mode: quantize all interior convs
    use_pallas: bool | None = None  # threaded to AttnBlock (TP pins False)

    def _nrb(self) -> list[int]:
        n = self.num_res_blocks
        return [n] * len(self.ch_mult) if isinstance(n, int) else list(n)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        nrb = self._nrb()
        h = _conv(self.quant, self.ch, dtype=self.dtype, name="conv_in")(x)
        curr_res = self.resolution
        in_ch_mult = (1,) + tuple(self.ch_mult)
        for i_level in range(len(self.ch_mult)):
            block_in = self.ch * in_ch_mult[i_level]
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(nrb[i_level]):
                h = ResnetBlock(in_channels=block_in, out_channels=block_out,
                                dropout=self.dropout, dtype=self.dtype,
                                quant=self.quant,
                                name=f"down{i_level}_block{i_block}")(h)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(block_in, dtype=self.dtype,
                                  use_pallas=self.use_pallas,
                                  name=f"down{i_level}_attn{i_block}")(h)
            if i_level != len(self.ch_mult) - 1:
                h = Downsample(block_in, self.resamp_with_conv, dtype=self.dtype,
                               quant=self.quant,
                               name=f"down{i_level}_downsample")(h)
                curr_res //= 2

        h = ResnetBlock(in_channels=block_in, dropout=self.dropout,
                        dtype=self.dtype, quant=self.quant, name="mid_block1")(h)
        h = AttnBlock(block_in, dtype=self.dtype,
                      use_pallas=self.use_pallas, name="mid_attn1")(h)
        h = ResnetBlock(in_channels=block_in, dropout=self.dropout,
                        dtype=self.dtype, quant=self.quant, name="mid_block2")(h)

        h = _norm("norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: Sequence[int] | int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    z_channels: int = 3
    dropout: float = 0.0
    resamp_with_conv: bool = True
    tanh_out: bool = False
    dtype: Dtype = jnp.float32
    quant: str | None = None  # 'int8' serving mode (conv_out stays exact)
    use_pallas: bool | None = None  # threaded to AttnBlock (TP pins False)

    def _nrb(self) -> list[int]:
        n = self.num_res_blocks
        return [n] * len(self.ch_mult) if isinstance(n, int) else list(n)

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        nrb = self._nrb()
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_res - 1]
        curr_res = self.resolution // 2 ** (num_res - 1)

        h = _conv(self.quant, block_in, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(in_channels=block_in, dropout=self.dropout,
                        dtype=self.dtype, quant=self.quant, name="mid_block1")(h)
        h = AttnBlock(block_in, dtype=self.dtype,
                      use_pallas=self.use_pallas, name="mid_attn1")(h)
        h = ResnetBlock(in_channels=block_in, dropout=self.dropout,
                        dtype=self.dtype, quant=self.quant, name="mid_block2")(h)

        for i_level in reversed(range(num_res)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(nrb[i_level] + 1):
                h = ResnetBlock(in_channels=block_in, out_channels=block_out,
                                dropout=self.dropout, dtype=self.dtype,
                                quant=self.quant,
                                name=f"up{i_level}_block{i_block}")(h)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(block_in, dtype=self.dtype,
                                  use_pallas=self.use_pallas,
                                  name=f"up{i_level}_attn{i_block}")(h)
            if i_level != 0:
                h = Upsample(block_in, self.resamp_with_conv, dtype=self.dtype,
                             name=f"up{i_level}_upsample")(h)
                curr_res *= 2

        # tail: norm_out -> silu -> conv_out(C -> 3) through
        # ops/tail_pallas.py — the XLA composition by default (the fused
        # kernel measured slower; PERF.md ledger), the Pallas kernel only
        # when use_pallas is pinned True; params keep the standard names so
        # checkpoints are unchanged
        from ..ops.tail_pallas import gn_silu_conv3x3
        from .layers import _Conv3x3Params, _GroupNormParams

        n_scale, n_bias = _GroupNormParams(name="norm_out")(h.shape[-1])
        ck, cb = _Conv3x3Params(self.out_ch, name="conv_out")(h.shape[-1])
        h = gn_silu_conv3x3(h, n_scale, n_bias, ck, cb, eps=1e-6,
                            use_pallas=self.use_pallas)
        return jnp.tanh(h) if self.tanh_out else h


class VectorQuantizer(nn.Module):
    """L2-nearest codebook with straight-through grads (quantize.py:213-329)."""

    n_e: int = 8192
    e_dim: int = 3
    beta: float = 0.25  # commitment weight (quantize.py:222, legacy=True)
    use_pallas: bool | None = None  # None = auto (TPU); False = XLA argmin

    @nn.compact
    def __call__(self, z: jnp.ndarray, return_loss: bool = False):
        emb = self.param(
            "embedding",
            nn.initializers.uniform(scale=2.0 / self.n_e),  # ~U(-1/n, 1/n) after shift
            (self.n_e, self.e_dim), jnp.float32,
        )
        zf = z.astype(jnp.float32)
        flat = zf.reshape(-1, self.e_dim)
        # nearest-codebook search: Pallas index-only kernel on TPU (avoids
        # the (rows, n_e) distance-matrix HBM round trip), XLA elsewhere
        from ..ops.vq_pallas import (nearest_codebook_indices,
                                     nearest_codebook_indices_xla)

        if self.use_pallas is False:
            idx = nearest_codebook_indices_xla(flat, emb)
        else:
            idx = nearest_codebook_indices(flat, emb)
        z_q_raw = emb[idx].reshape(zf.shape)  # grads flow into the codebook
        # straight-through estimator
        z_q = zf + jax.lax.stop_gradient(z_q_raw - zf)
        if return_loss:
            # VQ-VAE loss, legacy form (quantize.py:293-295): codebook term
            # pulls selected codes toward the (frozen) encoder output, the
            # beta-weighted commitment term pulls the encoder toward the
            # (frozen) codes.  Needed only for AE pretraining — the shipped
            # diffusion configs use a frozen, already-trained first stage.
            loss = (jnp.mean((jax.lax.stop_gradient(zf) - z_q_raw) ** 2)
                    + self.beta * jnp.mean(
                        (jax.lax.stop_gradient(z_q_raw) - zf) ** 2))
            return z_q.astype(z.dtype), loss
        return z_q.astype(z.dtype)


class AutoencoderKL(nn.Module):
    """KL-regularized autoencoder (ldm/models/autoencoder.py:52-86
    AutoencoderKLTorch): encode -> (mean, logvar) moments -> sample/mode."""

    ddconfig: dict
    embed_dim: int = 4
    dtype: Dtype = jnp.float32
    quant: str | None = None
    use_pallas: bool | None = None

    def setup(self):
        dd = dict(self.ddconfig)
        dd.pop("double_z", None)
        dd.pop("padding_mode", None)
        out_ch = dd.pop("out_ch", 3)
        in_channels = dd.pop("in_channels", 3)
        self.encoder = Encoder(in_channels=in_channels, double_z=True,
                               dtype=self.dtype, quant=self.quant,
                               use_pallas=self.use_pallas, **dd)
        self.decoder = Decoder(out_ch=out_ch, dtype=self.dtype,
                               quant=self.quant,
                               use_pallas=self.use_pallas, **dd)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.ddconfig["z_channels"], (1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def encode(self, x, key=None, sample_posterior=True, return_moments=False):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        if sample_posterior and key is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, dtype=jnp.float32).astype(mean.dtype)
        else:
            z = mean  # mode (distributions.py:24-62)
        return (z, moments) if return_moments else z

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key=None):
        return self.decode(self.encode(x, key))


class IdentityFirstStage(nn.Module):
    """No-op first stage (ldm/models/autoencoder.py:114-131) — pixel-space
    diffusion (latent_flag: False configs)."""

    def encode(self, x):
        return x

    def decode(self, x):
        return x

    def __call__(self, x):
        return x


class VQModel(nn.Module):
    """VQModelTorch equivalent (ldm/models/autoencoder.py:12-50): encode
    returns the pre-quantization latent; decode quantizes first."""

    ddconfig: dict
    n_embed: int = 8192
    embed_dim: int = 3
    dtype: Dtype = jnp.float32
    quant: str | None = None  # 'int8' serving mode for both conv backbones
    use_pallas: bool | None = None  # tri-state, same contract as UNetModelSwin

    def setup(self):
        dd = dict(self.ddconfig)
        dd.pop("double_z", None)
        dd.pop("padding_mode", None)
        out_ch = dd.pop("out_ch", 3)
        in_channels = dd.pop("in_channels", 3)
        self.encoder = Encoder(in_channels=in_channels, double_z=False,
                               dtype=self.dtype, quant=self.quant,
                               use_pallas=self.use_pallas, **dd)
        self.decoder = Decoder(out_ch=out_ch, dtype=self.dtype,
                               quant=self.quant,
                               use_pallas=self.use_pallas, **dd)
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim,
                                        use_pallas=self.use_pallas)
        self.quant_conv = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.ddconfig["z_channels"], (1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.quant_conv(self.encoder(x))

    def decode(self, h: jnp.ndarray, force_not_quantize: bool = False) -> jnp.ndarray:
        quant = h if force_not_quantize else self.quantize(h)
        return self.decoder(self.post_quant_conv(quant))

    def __call__(self, x: jnp.ndarray, force_not_quantize: bool = False) -> jnp.ndarray:
        return self.decode(self.encode(x), force_not_quantize)

    def training_recon(self, x: jnp.ndarray):
        """Full autoencode with the VQ training loss terms: returns
        (reconstruction, vq_loss).  Used by `tools/vqgan_pretrain.py` to fit
        a first stage from scratch (the reference ships pretrained LDM
        weights and has no AE training code; the loss matches the taming/LDM
        recipe its checkpoints were trained with, quantize.py:290-298)."""
        h = self.encode(x)
        quant, vq_loss = self.quantize(h, return_loss=True)
        recon = self.decoder(self.post_quant_conv(quant))
        return recon, vq_loss
