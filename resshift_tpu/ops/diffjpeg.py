"""Differentiable JPEG in JAX (NHWC).

Parity with the reference's `basicsr/utils/diffjpeg.py` (:14-515): RGB ->
YCbCr (JPEG matrix), 2x2 mean chroma subsampling, 8x8 block DCT, quality-
scaled quantization with the standard luma/chroma tables + rounding,
inverse chain, pad-to-16 with zeros and crop back.  Per-sample quality
factors supported.  `differentiable=True` uses the cubic straight-through
rounding (x -> round(x) + (x - round(x))^3).

TPU notes: the 8x8 DCT is expressed as two 8x8 matmuls per block (MXU
friendly) rather than the reference's rank-4 tensordot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["diff_jpeg", "quality_to_factor"]

_Y_TABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float32).T  # reference transposes (diffjpeg.py:14-18)

_C_TABLE = np.full((8, 8), 99, dtype=np.float32)
_C_TABLE[:4, :4] = np.array(
    [[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99], [47, 66, 99, 99]]
).T

# JPEG color matrices (diffjpeg.py:55-58, :?)
_RGB2YCC = np.array([
    [0.299, 0.587, 0.114],
    [-0.168736, -0.331264, 0.5],
    [0.5, -0.418688, -0.081312],
], dtype=np.float32).T
_YCC_SHIFT = np.array([0.0, 128.0, 128.0], dtype=np.float32)
_YCC2RGB = np.array([
    [1.0, 0.0, 1.402],
    [1.0, -0.344136, -0.714136],
    [1.0, 1.772, 0.0],
], dtype=np.float32).T


@functools.lru_cache(maxsize=1)
def _dct_mat() -> np.ndarray:
    """1-D DCT-II basis C with block DCT = C @ (X - 128) @ C.T (scaled)."""
    c = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        alpha = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            c[u, x] = alpha * np.cos((2 * x + 1) * u * np.pi / 16) * 0.5
    return c.astype(np.float32)


def quality_to_factor(quality: jnp.ndarray) -> jnp.ndarray:
    """quality in (0,100] -> compression factor (diffjpeg.py:32-44)."""
    q = jnp.asarray(quality, jnp.float32)
    return jnp.where(q < 50, 5000.0 / q, 200.0 - q * 2.0) / 100.0


def _blocks(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) -> (B, H/8*W/8, 8, 8)."""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, -1, 8, 8)


def _merge(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h, w)


def _dct(x: jnp.ndarray) -> jnp.ndarray:
    c = jnp.asarray(_dct_mat())
    x = x - 128.0
    return jnp.einsum("ux,bnxy,vy->bnuv", c, x, c, precision="highest")


def _idct(x: jnp.ndarray) -> jnp.ndarray:
    # contract C on its frequency index: X[x,y] = sum_uv C[u,x] D[u,v] C[v,y]
    c = jnp.asarray(_dct_mat())
    return jnp.einsum("ux,bnuv,vy->bnxy", c, x, c, precision="highest") + 128.0


def diff_jpeg(x: jnp.ndarray, quality: jnp.ndarray, differentiable: bool = False) -> jnp.ndarray:
    """JPEG round-trip on NHWC RGB [0,1]; `quality` scalar or per-sample (B,)."""
    b, h, w, _ = x.shape
    factor = quality_to_factor(jnp.broadcast_to(jnp.asarray(quality, jnp.float32), (b,)))
    factor = factor[:, None, None, None]

    if differentiable:
        rnd = lambda v: jnp.round(v) + (v - jnp.round(v)) ** 3
    else:
        rnd = jnp.round

    h_pad = (-h) % 16
    w_pad = (-w) % 16
    xp = jnp.pad(x, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
    hp, wp = h + h_pad, w + w_pad

    # compress: *255, RGB->YCbCr, chroma subsample
    ycc = (xp * 255.0) @ jnp.asarray(_RGB2YCC) + jnp.asarray(_YCC_SHIFT)
    y = ycc[..., 0]
    cb = ycc[..., 1].reshape(b, hp // 2, 2, wp // 2, 2).mean(axis=(2, 4))
    cr = ycc[..., 2].reshape(b, hp // 2, 2, wp // 2, 2).mean(axis=(2, 4))

    yt = jnp.asarray(_Y_TABLE)
    ct = jnp.asarray(_C_TABLE)
    comps = {}
    for name, comp, table in (("y", y, yt), ("cb", cb, ct), ("cr", cr, ct)):
        d = _dct(_blocks(comp))
        q = rnd(d / (table[None, None] * factor))
        comps[name] = q * (table[None, None] * factor)  # dequantize

    y_r = _merge(_idct(comps["y"]), hp, wp)
    cb_r = _merge(_idct(comps["cb"]), hp // 2, wp // 2)
    cr_r = _merge(_idct(comps["cr"]), hp // 2, wp // 2)
    cb_r = jnp.repeat(jnp.repeat(cb_r, 2, axis=1), 2, axis=2)
    cr_r = jnp.repeat(jnp.repeat(cr_r, 2, axis=1), 2, axis=2)

    ycc_r = jnp.stack([y_r, cb_r, cr_r], axis=-1)
    rgb = (ycc_r + jnp.asarray([-0.0, -128.0, -128.0])) @ jnp.asarray(_YCC2RGB)
    rgb = jnp.clip(rgb, 0.0, 255.0) / 255.0
    return rgb[:, :h, :w, :]
