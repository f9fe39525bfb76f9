"""Fused Swin window attention — Pallas TPU kernel.

One `pallas_call` computes, entirely in VMEM per block of TM windows:
    qkv projection (MXU)  ->  per-head windowed scores + rel-pos bias
    (+ shifted mask)      ->  f32 softmax (VPU)  ->  attention-weighted
    values               ->  output projection (MXU)

The XLA path materializes qkv (3x tokens), the per-head score tensors and
the attention output in HBM, plus several layout transposes for the
(B_, heads, N, hd) einsums — at N=64 tokens/window those round-trips cost
~8x the FLOP time (measured ~9.2ms for 4096 windows of C=192 on v5e vs
<2ms here).  This kernel reads each token once and writes once.

Gradients: `fused_window_attention` carries a custom VJP whose backward
recomputes through the plain XLA attention (the kernel is inference-hot;
training uses the same math via the fallback, so values match).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:  # pallas TPU backend is unavailable on CPU test runs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

__all__ = ["fused_window_attention", "pallas_available", "xla_window_attention"]

_TM = 16  # windows per kernel block (tuned on v5e: 16 beats 8 by ~6%)


def pallas_available() -> bool:
    if not _PALLAS_OK:
        return False
    if os.environ.get("RSTPU_NO_PALLAS"):  # global kill switch (perf A/B)
        return False
    try:
        # honor an active jax.default_device(...) override (e.g. params are
        # initialized on host CPU while the model later runs on TPU)
        dd = jax.config.jax_default_device
        if dd is not None:
            return getattr(dd, "platform", None) == "tpu"
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def xla_window_attention(xw, wqkv, bqkv, wproj, bproj, bias_mask, num_heads):
    """Reference XLA implementation (matches models/swin.py math).

    xw: (M, N, C); bias_mask: (nW or 1, nh, N, N) combined rel-pos bias +
    shifted-window mask, already f32.
    """
    m, n, c = xw.shape
    nh = num_heads
    hd = c // nh
    qkv = xw @ wqkv.astype(xw.dtype) + bqkv.astype(xw.dtype)
    qkv = qkv.reshape(m, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd**-0.5), k)
    nw = bias_mask.shape[0]
    attn = attn.reshape(m // nw, nw, nh, n, n) + bias_mask[None].astype(attn.dtype)
    attn = attn.reshape(m, nh, n, n)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(xw.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(m, n, c)
    return out @ wproj.astype(xw.dtype) + bproj.astype(xw.dtype)


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bm_ref, o_ref,
            *, num_heads: int, tm: int, gw: int):
    """Mosaic-friendly formulation.

    Two tricks keep the MXU fed despite the tiny (N=64, hd=32) window shapes:
      * heads are selected by multiplying K/V with per-head channel masks and
        contracting over the FULL width C, so no reshape ever puts head_dim
        (<128) on the lane axis — scores_h = Q @ (K*m_h)^T equals q_h k_h^T
        exactly because off-head columns contribute zero;
      * `gw` windows are fused into one "super-window" of gw*N tokens so each
        score matmul is (gw*N, C)x(C, gw*N) — at gw=2, N=64 that is a full
        128x128 MXU tile instead of four quarter-filled 64x64 ones.  The
        cross-window quadrants are killed by a -1e9 additive mask baked into
        `bm_ref`, so the softmax result is bit-identical to per-window
        attention.
    """
    n = x_ref.shape[1]
    c = x_ref.shape[2]
    nh = num_heads
    hd = c // nh
    scale = hd**-0.5
    ng = tm // gw          # super-windows per block
    ns = gw * n            # tokens per super-window

    x = x_ref[:].reshape(tm * n, c)
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)
    q = qkv[:, :c].reshape(ng, ns, c)
    k = qkv[:, c:2 * c].reshape(ng, ns, c)
    v = qkv[:, 2 * c:].reshape(ng, ns, c)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
    out = jnp.zeros((ng, ns, c), jnp.float32)
    for h in range(nh):
        m_h = ((col >= h * hd) & (col < (h + 1) * hd)).astype(k.dtype)
        s = jax.lax.dot_general(
            q * jnp.asarray(scale, q.dtype), k * m_h,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (ng, ns, ns)
        s = s + bm_ref[:, h]
        smax = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - smax)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = out + jax.lax.dot_general(
            p.astype(v.dtype), v * m_h,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    out2 = out.astype(x.dtype).reshape(tm * n, c)
    proj = jnp.dot(out2, wproj_ref[:], preferred_element_type=jnp.float32)
    proj = proj + bproj_ref[:].astype(jnp.float32)
    o_ref[:] = proj.astype(o_ref.dtype).reshape(tm, n, c)


_CROSS_MASK = -1e9  # kills cross-window attention inside a super-window


def _group_bias(bias_mask: jnp.ndarray, gw: int) -> jnp.ndarray:
    """(nW or 1, nh, N, N) per-window bias -> (nW' , nh, gw*N, gw*N)
    super-window bias: block-diagonal per-window biases, cross-window
    quadrants at -1e9.  nW'=1 stays 1 (same bias in every slot)."""
    if gw == 1:
        return bias_mask
    nw, nh, n, _ = bias_mask.shape
    ns = gw * n
    if nw == 1:
        nw2 = 1
    else:
        assert nw % gw == 0, (nw, gw)
        nw2 = nw // gw
    out = jnp.full((nw2, nh, ns, ns), _CROSS_MASK, bias_mask.dtype)
    for g in range(gw):
        sl = slice(g * n, (g + 1) * n)
        blk = bias_mask[g::gw] if nw > 1 else bias_mask
        out = out.at[:, :, sl, sl].set(blk)
    return out


def _forward_pallas(xw, wqkv, bqkv, wproj, bproj, bias_mask, num_heads):
    m, n, c = xw.shape
    nw = bias_mask.shape[0]
    tm = _TM
    # super-window grouping: pair windows when the resulting tile fills the
    # 128-lane MXU dimension and window counts line up
    gw = 2 if (n * 2 <= 128 and tm % 2 == 0 and (nw == 1 or nw % 2 == 0)) else 1
    env_gw = os.environ.get("RSTPU_ATTN_GW")  # perf experiments only
    if env_gw and int(env_gw) in (1, 2) and (int(env_gw) == 1 or gw == 2):
        gw = int(env_gw)
    pad = (-m) % tm
    if pad:
        xw = jnp.concatenate([xw, jnp.zeros((pad, n, c), xw.dtype)], axis=0)
    mp = xw.shape[0]
    grid = (mp // tm,)
    ng = tm // gw

    gb = _group_bias(bias_mask.astype(jnp.float32), gw)
    nwg = gb.shape[0]
    if nwg == 1:
        bm = jnp.broadcast_to(gb, (ng,) + gb.shape[1:])
        bm_spec = pl.BlockSpec((ng,) + gb.shape[1:], lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        # windows are ordered (batch-major, window-minor); block i covers
        # super-window ids [i*ng, (i+1)*ng) whose mask rows are (i*ng) % nwg ..
        assert nwg % ng == 0 or ng % nwg == 0, (nwg, ng)
        bm = gb
        if nwg % ng == 0:
            blocks_per_img = nwg // ng
            bm_spec = pl.BlockSpec((ng,) + gb.shape[1:],
                                   lambda i: (i % blocks_per_img, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
        else:  # ng > nwg: tile the mask up to ng
            reps = ng // nwg
            bm = jnp.tile(bm, (reps, 1, 1, 1))
            bm_spec = pl.BlockSpec((ng,) + gb.shape[1:], lambda i: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, tm=tm, gw=gw),
        out_shape=jax.ShapeDtypeStruct((mp, n, c), xw.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            bm_spec,
        ],
        out_specs=pl.BlockSpec((tm, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(xw, wqkv, bqkv, wproj, bproj, bm)
    return out[:m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_window_attention(xw, wqkv, bqkv, wproj, bproj, bias_mask, num_heads):
    """Fused windowed MHA.  xw: (M, N, C) tokens of M windows; bias_mask:
    (nW or 1, nh, N, N) additive f32 (rel-pos bias [+ shift mask])."""
    return _forward_pallas(xw, wqkv, bqkv, wproj, bproj, bias_mask, num_heads)


def _fwa_fwd(xw, wqkv, bqkv, wproj, bproj, bias_mask, num_heads):
    out = _forward_pallas(xw, wqkv, bqkv, wproj, bproj, bias_mask, num_heads)
    return out, (xw, wqkv, bqkv, wproj, bproj, bias_mask)


def _fwa_bwd(num_heads, res, g):
    xw, wqkv, bqkv, wproj, bproj, bias_mask = res
    _, vjp = jax.vjp(
        lambda *a: xla_window_attention(*a, num_heads=num_heads),
        xw, wqkv, bqkv, wproj, bproj, bias_mask,
    )
    return vjp(g)


fused_window_attention.defvjp(_fwa_fwd, _fwa_bwd)
