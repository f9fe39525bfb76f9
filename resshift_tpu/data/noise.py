"""Device-side noise injection (JAX, NHWC) for the degradation pipeline.

Parity with the batched torch variants in `basicsr/data/degradations.py`:
  * Gaussian noise with per-sample sigma and per-sample gray blending
    (:460-513, :536-556);
  * Poisson (shot) noise with the reference's data-dependent `vals =
    2^ceil(log2(#unique levels))` rule (:609-683, :706-729) — the unique
    count is computed on-device via a 256-bin histogram (the image is
    8-bit-rounded first, exactly as the reference does);
  * gray conversion uses torchvision's rgb_to_grayscale coefficients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["add_gaussian_noise", "add_poisson_noise"]

_GRAY = jnp.array([0.2989, 0.587, 0.114], jnp.float32)


def _to_gray(img: jnp.ndarray) -> jnp.ndarray:
    return (img * _GRAY).sum(-1, keepdims=True)


def add_gaussian_noise(key: jax.Array, img: jnp.ndarray, sigma: jnp.ndarray,
                       gray: jnp.ndarray, clip: bool = True) -> jnp.ndarray:
    """img (B,H,W,3) [0,1]; sigma (B,) in [0,255]-ish units; gray (B,) 0/1."""
    b, h, w, c = img.shape
    kc, kg = jax.random.split(key)
    sigma = sigma.reshape(b, 1, 1, 1) / 255.0
    noise = jax.random.normal(kc, img.shape, jnp.float32) * sigma
    gray_noise = jax.random.normal(kg, (b, h, w, 1), jnp.float32) * sigma
    g = gray.reshape(b, 1, 1, 1).astype(jnp.float32)
    noise = noise * (1 - g) + jnp.broadcast_to(gray_noise, img.shape) * g
    out = img + noise
    return jnp.clip(out, 0.0, 1.0) if clip else out


def _vals_from_unique(img01: jnp.ndarray) -> jnp.ndarray:
    """Per-sample 2^ceil(log2(#unique 8-bit levels)) (degradations.py:633-649)."""
    b = img01.shape[0]
    levels = jnp.clip(jnp.round(img01 * 255.0), 0, 255).astype(jnp.int32)
    flat = levels.reshape(b, -1)
    one_hot_counts = jax.vmap(lambda v: jnp.bincount(v, length=256))(flat)
    uniq = jnp.sum(one_hot_counts > 0, axis=1).astype(jnp.float32)
    return jnp.exp2(jnp.ceil(jnp.log2(uniq)))


def add_poisson_noise(key: jax.Array, img: jnp.ndarray, scale: jnp.ndarray,
                      gray: jnp.ndarray, clip: bool = True) -> jnp.ndarray:
    """Shot noise: poisson(img*vals)/vals - img, scaled per sample."""
    b, h, w, c = img.shape
    kc, kg = jax.random.split(key)
    g = gray.reshape(b, 1, 1, 1).astype(jnp.float32)
    scale = scale.reshape(b, 1, 1, 1)

    imgq = jnp.clip(jnp.round(img * 255.0), 0, 255) / 255.0
    vals = _vals_from_unique(imgq).reshape(b, 1, 1, 1)
    out = jax.random.poisson(kc, imgq * vals, dtype=jnp.int32).astype(jnp.float32) / vals
    noise = out - imgq

    img_gray = jnp.clip(jnp.round(_to_gray(img) * 255.0), 0, 255) / 255.0
    vals_g = _vals_from_unique(img_gray).reshape(b, 1, 1, 1)
    out_g = jax.random.poisson(kg, img_gray * vals_g, dtype=jnp.int32).astype(jnp.float32) / vals_g
    noise_g = jnp.broadcast_to(out_g - img_gray, img.shape)

    noise = noise * (1 - g) + noise_g * g
    out = img + noise * scale
    return jnp.clip(out, 0.0, 1.0) if clip else out
