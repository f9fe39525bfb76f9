"""Int8 quantized convolution — EXPERIMENTAL opt-in mode for the VQGAN.

The v5e MXU runs int8 at 2x the bf16 rate (394 vs 197 Tops/s peak), and
isolated chained compute-bound 3x3 convs measure 1.6-1.7x on the real chip
(512ch@64^2 1.64x, 256ch@128^2 1.70x, 128ch@256^2 1.63x; the UNet's
small-spatial shapes do not gain — 320ch@32^2 1.05x).

**Composed-pipeline result (tools/profile_quant.py, real chip): NEGATIVE.**
In the actual VQGAN halves the win does not survive composition: decode
1.08x, encode 0.82x (slower), int8-vs-bf16 full-sampler fidelity 31 dB.
The GroupNorm-f32 chains between convs, the dynamic activation abs-max
reduction (an extra serialized HBM pass per conv), and the per-call weight
quantization (weights are call-time args, not trace constants — XLA does
not hoist the requantize out of the caller's scan) together erase the MXU
gain.  See PERF.md "Negative result: int8 VQGAN serving mode".  Kept as an
opt-in experiment (`quant_vqgan='int8'`) and a building block; NOT a
recommended operating point — the exact bf16 path is faster AND exact.
Quantization is only ever offered for the ONE-SHOT VQGAN encode/decode
halves, never for the 15/4-step denoiser loop where error would compound.

Scheme (standard symmetric post-training quantization):
  * weights:     per-output-channel scale  s_c = max|w_c| / 127
  * activations: dynamic per-tensor scale  s_x = max|x|  / 127
    (the abs-max reduce fuses into the producing op's loop; the int8
    rewrite then HALVES the conv's activation read traffic)
  * accumulate in int32 on the MXU, dequantize into the f32 epilogue.

No calibration data needed; weights stay f32 in the checkpoint and are
quantized per call (they are call-time args — this is one of the measured
reasons the composed mode loses; see module docstring above).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

__all__ = ["quantize_weight", "qconv", "QConv"]


def quantize_weight(w: jnp.ndarray):
    """Symmetric per-output-channel int8 quantization of an HWIO kernel."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return wq, scale.reshape(-1)  # (Cout,)


def qconv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
          strides: Sequence[int] = (1, 1),
          padding=((1, 1), (1, 1))) -> jnp.ndarray:
    """int8 x int8 -> int32 convolution with f32 dequantized output.

    Drop-in for lax.conv_general_dilated(NHWC, HWIO) + bias at inference.
    """
    x32 = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    wq, sw = quantize_weight(w)
    y = lax.conv_general_dilated(
        xq, wq, tuple(strides), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sw)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


class QConv(nn.Module):
    """nn.Conv-compatible quantized conv: same param names/shapes ("kernel"
    HWIO + "bias"), so converted checkpoints load unchanged."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: int | str | Sequence = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        return qconv(x, kernel, bias, self.strides, pad)
