"""Subpixel (phase-decomposed) nearest-2x-upsample + 3x3 conv.

Both UNet and VQGAN decoders upsample by `nearest 2x -> 3x3 conv`
(reference models/unet.py:53-81, ldm/modules/diffusionmodules/model.py:50-66).
Computed literally, that conv runs at the upsampled resolution: 36
MAC/pixel/channel-pair and a 4x-size intermediate written to and re-read
from HBM.

Because nearest upsampling repeats pixels, each of the four output phases
(di, dj) in {0,1}^2 sees the 3x3 taps collapse onto a 2x2 low-res
neighborhood:

    y[2i+di, 2j+dj] = sum_{a,b} w[a,b] * x[(2i+di+a-1)//2, (2j+dj+b-1)//2]

  di=0 rows: {i-1: w[0], i: w[1]+w[2]}     di=1 rows: {i: w[0]+w[1], i+1: w[2]}
  (columns identical with dj)

So the whole op is FOUR stride-1 2x2 convs at the LOW resolution (16
MAC/pixel vs 36 — 2.25x fewer FLOPs) followed by a phase interleave, and
the 4x-size pre-conv intermediate never exists.  Weight collapse is exact
up to one extra f32 addition per tap pair; outputs match the literal
composition to f32 rounding (tested in tests/test_pallas_kernels.py).

Zero-padding equivalence at the borders: the literal conv pads the
UPSAMPLED image with one zero ring; phase (0,0) at i=0 reads x[-1] == 0
under its ((1,0),(1,0)) padding — the same zeros, row by row.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax

__all__ = ["upsample_nearest_conv3x3"]


def _collapse(w32: jnp.ndarray, d: int, axis: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Collapse one spatial axis of a (3,3,Cin,Cout) kernel for phase d.

    Returns the two 2-tap slices along `axis` (tap order: nearer, farther)."""
    taps = [lax.index_in_dim(w32, i, axis=axis, keepdims=True) for i in range(3)]
    if d == 0:
        return taps[0], taps[1] + taps[2]
    return taps[0] + taps[1], taps[2]


def upsample_nearest_conv3x3(x: jnp.ndarray, w: jnp.ndarray,
                             b: jnp.ndarray | None = None,
                             compute_dtype=None) -> jnp.ndarray:
    """nearest-2x upsample + SAME 3x3 conv, as four low-res 2x2 phase convs.

    x: (B, H, W, Cin) NHWC;  w: (3, 3, Cin, Cout) HWIO;  b: (Cout,) or None.
    Returns (B, 2H, 2W, Cout).  `compute_dtype` defaults to x.dtype.
    """
    if os.environ.get("RSTPU_NO_PHASE_UPSAMPLE"):
        y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        y = lax.conv_general_dilated(
            y, w.astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y if b is None else y + b.astype(y.dtype)

    dt = compute_dtype or x.dtype
    n, h, wd, _ = x.shape
    cout = w.shape[-1]
    # collapse in f32 so tap sums don't round in bf16
    w32 = w.astype(jnp.float32)
    xc = x.astype(dt)

    phases = []
    for di in (0, 1):
        r0, r1 = _collapse(w32, di, axis=0)
        for dj in (0, 1):
            k = jnp.concatenate(
                [jnp.concatenate(_collapse(r0, dj, axis=1), axis=1),
                 jnp.concatenate(_collapse(r1, dj, axis=1), axis=1)], axis=0)
            # phase (0,*) taps rows (i-1, i) -> pad top; (1,*) taps (i, i+1)
            pad = ((1 - di, di), (1 - dj, dj))
            phases.append(lax.conv_general_dilated(
                xc, k.astype(dt), (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
    # phases indexed [di*2+dj]; interleave to (B, 2H, 2W, Cout)
    y = jnp.stack(phases, axis=3)                    # (B, H, W, 4, Cout)
    y = y.reshape(n, h, wd, 2, 2, cout)              # (..., di, dj, C)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * wd, cout)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
