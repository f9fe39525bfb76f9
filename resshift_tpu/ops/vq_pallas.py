"""Nearest-codebook search — Pallas TPU kernel.

The VQ quantizer's L2-nearest lookup (reference
ldm/modules/vqvae/quantize.py:213-329) computes a (rows, n_embed) distance
matrix and argmins it.  At the realsr decode point that matrix is
(262144, 8192) f32 = 8.6 GB of HBM round trip — measured 15.4 ms/batch on
v5e, all bandwidth.  This kernel streams row blocks through VMEM, computes
the distances against the resident codebook and writes ONLY the winning
indices (argmin of |z|^2 - 2 z.e + |e|^2, with |z|^2 constant per row so it
drops out of the argmin).  Traffic: read z once + write one int32 per row.

The embedding gather (`emb[idx]`) and the straight-through estimator stay
in XLA — tiny and autodiff-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

__all__ = ["nearest_codebook_indices", "nearest_codebook_indices_xla",
           "pallas_available"]


def pallas_available() -> bool:
    if not _PALLAS_OK:
        return False
    import os

    if os.environ.get("RSTPU_NO_PALLAS"):
        return False
    try:
        dd = jax.config.jax_default_device
        if dd is not None:
            return getattr(dd, "platform", None) == "tpu"
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def nearest_codebook_indices_xla(flat: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
    """Reference path: full distance matrix + argmin (quantize.py:233-243)."""
    d = (
        jnp.sum(flat**2, axis=1, keepdims=True)
        + jnp.sum(emb**2, axis=1)[None]
        - 2.0 * flat @ emb.T
    )
    return jnp.argmin(d, axis=1)


def _kernel(z_ref, embt_ref, e2_ref, idx_ref):
    z = z_ref[:].astype(jnp.float32)              # (TB, D)
    # scores = -2 z . e + |e|^2  (|z|^2 is row-constant, argmin-invariant)
    s = -2.0 * jnp.dot(z, embt_ref[:], preferred_element_type=jnp.float32)
    s = s + e2_ref[:]
    idx_ref[:, 0] = jnp.argmin(s, axis=1).astype(jnp.int32)


@jax.custom_vjp
def _nearest_pallas(zf: jnp.ndarray, embt: jnp.ndarray, e2: jnp.ndarray) -> jnp.ndarray:
    tb = 256 if embt.shape[1] >= 4096 else 512
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((zf.shape[0], 1), jnp.int32),
        grid=(zf.shape[0] // tb,),
        in_specs=[
            pl.BlockSpec((tb, zf.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(embt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(e2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(zf, embt, e2)


def _nearest_fwd(zf, embt, e2):
    return _nearest_pallas(zf, embt, e2), (zf.shape, embt.shape, e2.shape)


def _nearest_bwd(shapes, g):
    # argmin indices are piecewise-constant: zero cotangent everywhere.
    # (Needed so the VQ-training path — codebook/commitment losses through
    # `emb[idx]` — can differentiate past the Pallas search kernel; the
    # useful gradients flow through the gather, not through the index op.)
    del g
    zs, es, e2s = shapes
    return (jnp.zeros(zs, jnp.float32), jnp.zeros(es, jnp.float32),
            jnp.zeros(e2s, jnp.float32))


_nearest_pallas.defvjp(_nearest_fwd, _nearest_bwd)


def nearest_codebook_indices(flat: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
    """flat: (M, D) rows; emb: (K, D) codebook -> (M,) int32 argmin indices.

    Pallas on TPU (index-only output), XLA elsewhere.  Ties resolve to the
    first minimum in both paths (jnp.argmin semantics).
    """
    if not pallas_available():
        return nearest_codebook_indices_xla(flat, emb)
    m, d = flat.shape
    k = emb.shape[0]
    # (tb, K) f32 score block must fit VMEM alongside double-buffered IO
    tb = 256 if k >= 4096 else 512
    pad = (-m) % tb
    zf = flat.astype(jnp.float32)
    if pad:
        zf = jnp.concatenate([zf, jnp.zeros((pad, d), jnp.float32)], axis=0)
    embt = emb.astype(jnp.float32).T              # (D, K)
    e2 = jnp.sum(emb.astype(jnp.float32) ** 2, axis=1)[None]  # (1, K)
    idx = _nearest_pallas(zf, embt, e2)
    return idx[:m, 0]
