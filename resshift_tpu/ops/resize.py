"""Separable image resizing with exact PyTorch / MATLAB semantics.

Everything is expressed as two dense 1-D resampling matrices (H_out x H_in
and W_out x W_in) applied as matmuls — the TPU-native formulation: static
shapes, MXU-friendly, trivially fusable by XLA, and bit-faithful to the
per-pixel weight math of the originals.

Parity targets (zsyOAOA/ResShift):
  * ``F.interpolate(mode='bicubic', align_corners=False)`` — used to
    upsample LQ before VQGAN encode (models/gaussian_diffusion.py:503-504).
    Cubic convolution kernel a=-0.75, replicate border, no weight
    renormalization, no antialias.
  * MATLAB ``imresize`` (utils/util_image.py:314-447) — defines the bicsr
    task LQ. Cubic kernel a=-0.5, antialias when downscaling, symmetric
    border, weights renormalized.
  * ``F.interpolate(mode='area')`` == adaptive average pooling — used by the
    RealESRGAN degradation pipeline (trainer.py:560-575).
  * ``F.interpolate(mode='bilinear'|'nearest')``.

The matrices are built on host in float64 and cached per
(in_size, out_size, mode) so jitted callers see constants.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

__all__ = ["resize", "resize_matrix", "upsample_nearest"]


def _cubic_torch(x: np.ndarray) -> np.ndarray:
    """Cubic convolution kernel with a = -0.75 (PyTorch's bicubic)."""
    a = -0.75
    ax = np.abs(x)
    ax2, ax3 = ax**2, ax**3
    return np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )


def _cubic_matlab(x: np.ndarray) -> np.ndarray:
    """MATLAB's bicubic kernel, a = -0.5 (util_image.py:449 `cubic`)."""
    ax = np.abs(x)
    ax2, ax3 = ax**2, ax**3
    return (1.5 * ax3 - 2.5 * ax2 + 1) * (ax <= 1) + (
        -0.5 * ax3 + 2.5 * ax2 - 4 * ax + 2
    ) * ((1 < ax) & (ax <= 2))


def _linear(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.maximum(1.0 - ax, 0.0)


_KERNELS = {
    "bicubic_torch": (_cubic_torch, 2.0),
    "bicubic_matlab": (_cubic_matlab, 2.0),
    "bilinear": (_linear, 1.0),
}


def _reflect_index(idx: np.ndarray, n: int) -> np.ndarray:
    """MATLAB-style symmetric boundary: ...2,1,0 | 0,1,2... | n-1,n-2..."""
    idx = np.where(idx < 0, -idx - 1, idx)
    idx = np.where(idx >= n, 2 * n - idx - 1, idx)
    # repeat once more in case of very small n
    idx = np.where(idx < 0, -idx - 1, idx)
    return np.clip(idx, 0, n - 1)


@functools.lru_cache(maxsize=256)
def _resize_matrix_np(
    in_size: int,
    out_size: int,
    mode: str,
    antialias: bool,
) -> np.ndarray:
    """Dense (out_size, in_size) float64 resampling matrix."""
    scale = out_size / in_size

    if mode == "nearest":
        # torch 'nearest': src = floor(dst * in/out)
        m = np.zeros((out_size, in_size))
        src = np.floor(np.arange(out_size) * (in_size / out_size)).astype(int)
        m[np.arange(out_size), np.clip(src, 0, in_size - 1)] = 1.0
        return m

    if mode == "area":
        # adaptive_avg_pool1d semantics: bin i = [floor(i*in/out), ceil((i+1)*in/out))
        m = np.zeros((out_size, in_size))
        for i in range(out_size):
            lo = (i * in_size) // out_size
            hi = -((-(i + 1) * in_size) // out_size)  # ceil
            m[i, lo:hi] = 1.0 / (hi - lo)
        return m

    kernel, support = _KERNELS[mode]
    aa = antialias and scale < 1.0
    if mode == "bicubic_torch" and aa:
        # torch's antialiased bicubic is the PIL port: a=-0.5 kernel,
        # clipped+renormalized borders (not the a=-0.75 non-aa kernel).
        kernel = _cubic_matlab
    # torch/MATLAB coordinate mapping (align_corners=False):
    u = (np.arange(out_size, dtype=np.float64) + 0.5) / scale - 0.5
    kscale = min(scale, 1.0) if aa else 1.0
    ksupport = support / kscale
    # taps: indices within [u - ksupport, u + ksupport]
    left = np.floor(u - ksupport).astype(int) + 1
    p = int(math.ceil(2 * ksupport)) + 2
    idx = left[:, None] + np.arange(p)[None, :]  # (out, p)
    w = kernel((u[:, None] - idx) * kscale) * kscale  # (out, p)

    if mode == "bicubic_matlab":
        w = w / w.sum(axis=1, keepdims=True)
        idx_b = _reflect_index(idx, in_size)
    elif aa:
        # PIL/torch-aa border: drop out-of-range taps, renormalize the rest
        valid = (idx >= 0) & (idx < in_size)
        w = np.where(valid, w, 0.0)
        w = w / w.sum(axis=1, keepdims=True)
        idx_b = np.clip(idx, 0, in_size - 1)
    else:
        # torch non-aa: replicate border, keep raw weights (they sum to 1
        # already for the cubic/linear convolution kernels)
        idx_b = np.clip(idx, 0, in_size - 1)

    m = np.zeros((out_size, in_size))
    np.add.at(m, (np.repeat(np.arange(out_size), p), idx_b.ravel()), w.ravel())
    return m


def resize_matrix(in_size: int, out_size: int, mode: str, antialias: bool = False) -> jnp.ndarray:
    """f32 device constant (out_size, in_size) resampling matrix."""
    return jnp.asarray(_resize_matrix_np(in_size, out_size, mode, antialias), dtype=jnp.float32)


def resize(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    mode: str = "bicubic_torch",
    antialias: bool = False,
) -> jnp.ndarray:
    """Resize NHWC (or HWC / HW) images to ``out_hw``.

    mode: 'bicubic_torch' | 'bicubic_matlab' | 'bilinear' | 'nearest' | 'area'.
    MATLAB mode implies antialias (its default) when downscaling.
    """
    if mode == "bicubic_matlab":
        antialias = True
    squeeze = []
    if x.ndim == 2:
        x = x[None, :, :, None]
        squeeze = [0, -1]
    elif x.ndim == 3:
        x = x[None]
        squeeze = [0]
    n, h, w, c = x.shape
    oh, ow = out_hw
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if h != oh:
        mh = resize_matrix(h, oh, mode, antialias)
        xf = jnp.einsum("oh,nhwc->nowc", mh, xf, precision="highest")
    if w != ow:
        mw = resize_matrix(w, ow, mode, antialias)
        xf = jnp.einsum("ow,nhwc->nhoc", mw, xf, precision="highest")
    out = xf.astype(dtype)
    if squeeze == [0, -1]:
        out = out[0, :, :, 0]
    elif squeeze == [0]:
        out = out[0]
    return out


def resize_np(x: np.ndarray, out_hw: tuple[int, int], mode: str = "bicubic_matlab",
              antialias: bool = False) -> np.ndarray:
    """Pure-numpy resize (same matrices) for host-side data loading.
    x: HWC or HW float array."""
    if mode == "bicubic_matlab":
        antialias = True
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    h, w, c = x.shape
    oh, ow = out_hw
    out = x.astype(np.float64)
    if h != oh:
        out = np.einsum("oh,hwc->owc", _resize_matrix_np(h, oh, mode, antialias), out)
    if w != ow:
        out = np.einsum("ow,hwc->hoc", _resize_matrix_np(w, ow, mode, antialias), out)
    out = out.astype(x.dtype)
    return out[..., 0] if squeeze else out


def imresize_matlab(x: np.ndarray, scale: float) -> np.ndarray:
    """MATLAB imresize(im, scale) equivalent (util_image.py:314-447): output
    size = ceil(in * scale), antialiased a=-0.5 cubic, symmetric border."""
    h, w = x.shape[:2]
    oh, ow = int(np.ceil(h * scale)), int(np.ceil(w * scale))
    return resize_np(x, (oh, ow), "bicubic_matlab")


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest 2x upsample for NHWC (torch F.interpolate nearest, integer factor)."""
    n, h, w, c = x.shape
    x = jnp.repeat(x, factor, axis=1)
    x = jnp.repeat(x, factor, axis=2)
    return x
