"""Batched image filtering (NHWC, JAX).

Parity with `basicsr/utils/img_process_util.py`:
  * filter2D (:7-31): per-sample KxK kernel, reflect padding, implemented as
    a grouped depthwise convolution (feature_group_count = B*C after folding
    batch into channels — the same trick the reference uses with
    torch groups=b*c).
  * USMSharp (:63-85): unsharp masking with a Gaussian-blur kernel
    (cv2.getGaussianKernel(radius, 0) equivalent) and a thresholded soft mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["filter2d", "usm_sharp", "gaussian_kernel2d"]


def filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """cv2.filter2D equivalent.  img: (B,H,W,C); kernel: (B,k,k) or (1,k,k).

    NOTE: like cv2/torch conv2d here, this is *correlation* in torch's
    conv2d sense — the reference passes symmetric kernels so orientation
    does not matter, but we match torch.conv2d exactly (no kernel flip).
    """
    b, h, w, c = img.shape
    kb, k, _ = kernel.shape
    assert k % 2 == 1, "kernel size must be odd"
    p = k // 2
    x = jnp.pad(img, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")

    if kb == 1:
        # same kernel for the whole batch: plain depthwise conv over C
        rhs = jnp.broadcast_to(kernel[0][..., None, None], (k, k, 1, c))
        out = jax.lax.conv_general_dilated(
            x, rhs, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        return out

    # per-sample kernels: fold batch into channels -> groups = B*C
    x2 = x.transpose(1, 2, 0, 3).reshape(1, h + 2 * p, w + 2 * p, b * c)
    rhs = jnp.broadcast_to(kernel[:, None, :, :], (b, c, k, k))
    rhs = rhs.reshape(b * c, k, k).transpose(1, 2, 0)[..., None, :]  # (k,k,1,B*C)
    out = jax.lax.conv_general_dilated(
        x2, rhs, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
    )
    return out.reshape(h, w, b, c).transpose(2, 0, 1, 3)


@functools.lru_cache(maxsize=8)
def gaussian_kernel2d(radius: int = 51, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel(radius, sigma) outer product; sigma<=0 uses
    cv2's auto rule sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    if sigma <= 0:
        sigma = 0.3 * ((radius - 1) * 0.5 - 1) + 0.8
    ax = np.arange(radius, dtype=np.float64) - (radius - 1) / 2.0
    k = np.exp(-(ax**2) / (2 * sigma**2))
    k /= k.sum()
    return np.outer(k, k).astype(np.float32)


def usm_sharp(img: jnp.ndarray, weight: float = 0.5, radius: int = 50,
              threshold: float = 10.0) -> jnp.ndarray:
    """USMSharp.forward equivalent (NHWC [0,1])."""
    if radius % 2 == 0:
        radius += 1
    kern = jnp.asarray(gaussian_kernel2d(radius, 0.0))[None]
    blur = filter2d(img, kern)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = filter2d(mask, kern)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1 - soft_mask) * img
