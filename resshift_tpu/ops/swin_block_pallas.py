"""Fused Swin-block kernels — Pallas TPU.

Each Swin block in the reference is a chain of full-tensor passes
(swin_transformer.py:238-281): GroupNorm -> [roll] -> window_partition ->
W-MSA -> window_reverse -> [unroll] -> +residual -> GroupNorm -> fc1 ->
GELU -> fc2 -> +residual.  On TPU each of those passes costs a full HBM
round trip of the ~100MB activation; measured on v5e that makes a 64^2
BasicLayer ~20ms while its matmul content is worth <7ms.

Here the block is TWO pallas_calls over a (B, T, C) token layout
(T = nW * N window-major tokens, produced once per BasicLayer):

  norm_attn_residual:  y = x + proj(softmax(q k^T * s + bias) v)
                       with q,k,v = (x * w + b) @ Wqkv  (GN folded to a
                       per-image affine (w, b) computed by `gn_fold`)
  norm_mlp_residual:   y = x + fc2(gelu(fc1(x * w + b)))

MXU shaping (v5e measurements in PERF.md):
  * heads are LANE SLICES (hd=32-aligned) — no masked full-width products,
    no cross-head accumulator;
  * `gw` windows form one super-window so score tiles are (gw*N x gw*N)
    = 128x128 with cross-window quadrants killed by a -1e9 bias;
  * blocks slice the T axis, so no (B*nW, N, C) <-> (B, T, C) relayouts.

Gradients: custom VJP recomputes through the XLA reference composition
(`*_xla` below) — identical math, so values match the kernels to bf16
rounding.  The XLA functions are also the CPU/test path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas TPU backend is unavailable on CPU test runs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

__all__ = ["gn_fold", "token_stats", "fold_stats", "norm_attn_residual",
           "norm_mlp_residual", "norm_attn_residual_stats",
           "norm_mlp_residual_stats", "shift_attn_residual_stats",
           "mlp_unshift_residual_stats", "pallas_available"]

_CROSS_MASK = -1e9


def pallas_available() -> bool:
    """Default (auto) kernel-path decision, consulted at TRACE time.

    Callers that need an explicit choice pin it through the `use_pallas`
    module field (models/swin.py BasicLayer/SwinTransformerBlock,
    models/unet.py UNetModelSwin) — the pinned value lives on the module
    instance, so it is captured by any closure/jit built from it and two
    differently-pinned clones can never share a trace.  The trainer pins
    False (under AD the custom VJPs recompute the XLA composition, making
    the Pallas forward pure extra work); inference leaves None = this
    auto check."""
    if not _PALLAS_OK:
        return False
    if os.environ.get("RSTPU_NO_PALLAS"):  # global kill switch (perf A/B)
        return False
    try:
        dd = jax.config.jax_default_device
        if dd is not None:
            return getattr(dd, "platform", None) == "tpu"
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def shift_fuse_fits(wd: int, ws: int) -> bool:
    """Whether the shift-ABSORBED kernels can run at this spatial width.

    The shifted assembly reads rows `wi`, `wi+1`, so those kernels block
    on WHOLE window-rows (`_row_block` cannot split one) and their scoped
    VMEM scales with the row length `wd*ws` tokens: measured on v5e, a
    1024-token row (128-wide latent, the RealSet chop-512 path) compiles
    at ~12.5 MB scoped; a 2048-token row (256-wide latent, batch-1 big
    inputs) hits 25 MB against the 16 MB scoped limit.  Past the limit the
    caller falls back to the standalone shift kernel + row-blockable attn
    /MLP kernels — still fully fused, just not shift-absorbed."""
    return wd * ws <= 1024


# ------------------------------------------------------------------ GN fold

def token_stats(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(image, channel) f32 sum and sum-of-squares over the token axis.

    The `*_stats` fused kernels below produce these same accumulators as a
    free epilogue while the activation is VMEM-resident; this is the XLA
    form (one full HBM read of x)."""
    xf = x.astype(jnp.float32)
    return jnp.sum(xf, axis=1), jnp.sum(jnp.square(xf), axis=1)


def fold_stats(stats: tuple[jnp.ndarray, jnp.ndarray], scale: jnp.ndarray,
               bias: jnp.ndarray, t: int, num_groups: int = 32,
               eps: float = 1e-5):
    """GroupNorm affine (w, b) from per-channel token sums: GN(x) == x*w + b.

    stats: (sum, sumsq), each (B, C) f32 over t tokens.  Group statistics
    via a lane-friendly (C, G) one-hot matmul (fp32 — reference
    models/basic_ops.py:15-17)."""
    s_c, sq_c = stats
    c = s_c.shape[-1]
    g = min(num_groups, c)
    onehot = jnp.asarray(np.repeat(np.eye(g, dtype=np.float32), c // g, axis=0))
    s = s_c @ onehot           # (B, G)
    sq = sq_c @ onehot
    n = t * (c // g)
    mean_g = s / n
    var_g = jnp.maximum(sq / n - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = mean_g @ onehot.T                 # (B, C)
    inv_c = inv_g @ onehot.T
    w = inv_c * scale[None].astype(jnp.float32)
    b = bias[None].astype(jnp.float32) - mean_c * w
    return w, b


def gn_fold(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
            num_groups: int = 32, eps: float = 1e-5):
    """Fold GroupNorm into a per-(image, channel) affine: GN(x) == x*w + b.

    x: (B, T, C); returns (w, b) f32 of shape (B, C)."""
    return fold_stats(token_stats(x), scale, bias, x.shape[1], num_groups, eps)


# ----------------------------------------------------------- XLA reference

def norm_attn_residual_xla(x, w, b, wqkv, bqkv, wproj, bproj, bias_mask,
                           num_heads, n_win):
    """x: (B, T, C) tokens; bias_mask: (nW or 1, nh, N, N) f32."""
    bsz, t, c = x.shape
    nh, hd = num_heads, c // num_heads
    xn = (x.astype(jnp.float32) * w[:, None] + b[:, None]).astype(x.dtype)
    m = bsz * t // n_win
    xw = xn.reshape(m, n_win, c)
    qkv = xw @ wqkv.astype(xw.dtype) + bqkv.astype(xw.dtype)
    qkv = qkv.reshape(m, n_win, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd**-0.5), k)
    nw = bias_mask.shape[0]
    attn = attn.reshape(m // nw, nw, nh, n_win, n_win) + bias_mask[None].astype(attn.dtype)
    attn = attn.reshape(m, nh, n_win, n_win)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(xw.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(m, n_win, c)
    out = out @ wproj.astype(xw.dtype) + bproj.astype(xw.dtype)
    return x + out.reshape(bsz, t, c)


def norm_mlp_residual_xla(x, w, b, w1, b1, w2, b2):
    xn = (x.astype(jnp.float32) * w[:, None] + b[:, None]).astype(x.dtype)
    h = xn @ w1.astype(x.dtype) + b1.astype(x.dtype)
    h = jax.nn.gelu(h, approximate=False)
    return x + (h @ w2.astype(x.dtype) + b2.astype(x.dtype))


def norm_attn_residual_stats_xla(x, w, b, wqkv, bqkv, wproj, bproj, bias_mask,
                                 num_heads, n_win):
    y = norm_attn_residual_xla(x, w, b, wqkv, bqkv, wproj, bproj, bias_mask,
                               num_heads, n_win)
    return (y,) + token_stats(y)


def norm_mlp_residual_stats_xla(x, w, b, w1, b1, w2, b2):
    y = norm_mlp_residual_xla(x, w, b, w1, b1, w2, b2)
    return (y,) + token_stats(y)


# ------------------------------------------------------------ attn kernel

def _pick_gw(n: int, tmw: int, nw: int) -> int:
    gw = 1
    for g in (8, 4, 2):
        if n * g <= 128 and tmw % g == 0 and (nw == 1 or nw % g == 0):
            gw = g
            break
    return gw


def _group_bias(bias_mask: jnp.ndarray, gw: int) -> jnp.ndarray:
    if gw == 1:
        return bias_mask
    nw, nh, n, _ = bias_mask.shape
    ns = gw * n
    nw2 = 1 if nw == 1 else nw // gw
    out = jnp.full((nw2, nh, ns, ns), _CROSS_MASK, bias_mask.dtype)
    for g in range(gw):
        sl = slice(g * n, (g + 1) * n)
        blk = bias_mask if nw == 1 else bias_mask[g::gw]
        out = out.at[:, :, sl, sl].set(blk)
    return out


def _accumulate_stats(o_cast, s_ref, q_ref):
    """Per-block (1, C) f32 sum / sum-sq accumulated across the token-grid
    axis (output revisiting: the stats block index ignores the last grid
    dim, so TPU's sequential grid makes += safe)."""
    yf = o_cast.astype(jnp.float32)
    bs = jnp.sum(yf, axis=0, keepdims=True)  # (1, C)
    bq = jnp.sum(jnp.square(yf), axis=0, keepdims=True)
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        s_ref[0] = bs
        q_ref[0] = bq

    @pl.when(ti != 0)
    def _():
        s_ref[0] += bs
        q_ref[0] += bq


def _attn_body(x, w_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref,
               bproj_ref, bm_ref, out_dtype, *, num_heads, n_win, gw, tb):
    """Shared W-MSA math on an assembled (TB, C) token block; returns the
    residual-added output cast to `out_dtype`."""
    c = x.shape[-1]
    nh = num_heads
    hd = c // nh
    scale = hd**-0.5
    ns = gw * n_win
    ng = tb // ns  # super-windows per block

    xn = (x.astype(jnp.float32) * w_ref[0] + b_ref[0]).astype(x.dtype)
    qkv = jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
    # bias add at the activation dtype, mirroring the XLA composition
    # (norm_attn_residual_xla) op-for-op; bf16 runs packed 2-per-lane
    qkv = qkv.astype(x.dtype) + bqkv_ref[:].astype(x.dtype)
    q = qkv[:, :c].reshape(ng, ns, c)
    k = qkv[:, c:2 * c].reshape(ng, ns, c)
    v = qkv[:, 2 * c:].reshape(ng, ns, c)

    outs = []
    for h in range(nh):
        sl = slice(h * hd, (h + 1) * hd)
        s = jax.lax.dot_general(
            q[:, :, sl] * jnp.asarray(scale, q.dtype), k[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (ng, ns, ns)
        # softmax without VPU lane reductions (measured −0.55 ms/call):
        # the row-max subtraction is a CONSTANT shift (already folded into
        # bm by _prep_bias) and the normalizer rides the AV matmul as an
        # appended ones column (hd=32 pads to 128 output lanes, so the
        # extra column is free MXU work).  GN-bounded raw scores are ±~50,
        # i.e. [-80, +20] after the -30 fold — the [-80, 80] window covers
        # that whole band, so the clip is exact-softmax-equivalent for any
        # realistic score and merely bounds adversarial ones.  NaN stays
        # impossible: p ∈ [e^-80, e^80]; the denominator can neither
        # underflow to 0 nor overflow f32 (ns·e^80 ≤ 512·5.5e34 ≈ 2.8e37
        # < f32 max).  Mask entries (−1e9 in bm) clip to e^-80 ≈ 1.8e-35:
        # ≥e^-100 below any in-band row max — dead at f32 precision.
        p = jnp.exp(jnp.clip(s + bm_ref[:, h], -80.0, 80.0)).astype(v.dtype)
        ones = jnp.ones((ng, ns, 1), v.dtype)
        v_aug = jnp.concatenate([v[:, :, sl], ones], axis=-1)
        oa = jax.lax.dot_general(
            p, v_aug,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (ng, ns, hd+1)
        outs.append(oa[:, :, :hd] * (1.0 / oa[:, :, hd:]))
    out = jnp.concatenate(outs, axis=-1).astype(x.dtype).reshape(tb, c)
    proj = jnp.dot(out, wproj_ref[:], preferred_element_type=jnp.float32)
    proj = proj.astype(x.dtype) + bproj_ref[:].astype(x.dtype)
    return (x + proj).astype(out_dtype)


def _attn_kernel(x_ref, w_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                 bproj_ref, bm_ref, o_ref, s_ref, q_ref, *, num_heads,
                 n_win, gw, tb):
    o_cast = _attn_body(x_ref[0], w_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                        bproj_ref, bm_ref, o_ref.dtype, num_heads=num_heads,
                        n_win=n_win, gw=gw, tb=tb)
    o_ref[0] = o_cast
    _accumulate_stats(o_cast, s_ref, q_ref)


# ---- shifted-layout assembly (absorbs the SW-MSA roll permutation into the
# ---- kernels' reads: shifted window-row wi draws only from unshifted rows
# ---- wi, wi+1, so a second input ref supplies the wrap neighbor — same
# ---- slice/concat scheme as ops/shift_pallas.py, now free of its own pass)

def _shift_assemble(cur_ref, nxt_ref, k, nww, ws, shift):
    """(k rows, next row) unshifted -> (k*row, C) tokens in SHIFTED layout."""
    c = cur_ref.shape[-1]
    cur = cur_ref[0].reshape(k, nww, ws, ws, c)
    nxt = nxt_ref[0].reshape(1, nww, ws, ws, c)
    # k == 1: row wi+1 comes entirely from the neighbor ref (Mosaic rejects
    # the zero-size cur[1:] slice)
    nrow = nxt if k == 1 else jnp.concatenate([cur[1:], nxt], axis=0)
    x = jnp.concatenate([cur[:, :, shift:], nrow[:, :, :shift]], axis=2)
    nc = jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)
    x = jnp.concatenate([x[:, :, :, shift:], nc[:, :, :, :shift]], axis=3)
    return x.reshape(k * nww * ws * ws, c)


def _unshift_assemble(prv_ref, cur_ref, k, nww, ws, shift):
    """(prev row, k rows) shifted -> (k*row, C) tokens in UNSHIFTED layout."""
    c = cur_ref.shape[-1]
    prv = prv_ref[0].reshape(1, nww, ws, ws, c)
    cur = cur_ref[0].reshape(k, nww, ws, ws, c)
    prow = prv if k == 1 else jnp.concatenate([prv, cur[:k - 1]], axis=0)
    x = jnp.concatenate([prow[:, :, ws - shift:], cur[:, :, :ws - shift]], axis=2)
    pc = jnp.concatenate([x[:, -1:], x[:, :-1]], axis=1)
    x = jnp.concatenate([pc[:, :, :, ws - shift:], x[:, :, :, :ws - shift]], axis=3)
    return x.reshape(k * nww * ws * ws, c)


def _shift_attn_kernel(cur_ref, nxt_ref, w_ref, b_ref, wqkv_ref, bqkv_ref,
                       wproj_ref, bproj_ref, bm_ref, o_ref, s_ref, q_ref, *,
                       num_heads, n_win, gw, tb, k, nww, ws, shift):
    x = _shift_assemble(cur_ref, nxt_ref, k, nww, ws, shift)
    o_cast = _attn_body(x, w_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                        bproj_ref, bm_ref, o_ref.dtype, num_heads=num_heads,
                        n_win=n_win, gw=gw, tb=tb)
    o_ref[0] = o_cast
    _accumulate_stats(o_cast, s_ref, q_ref)


_SOFTMAX_SHIFT = 30.0  # constant exp-range guard replacing the row-max


def _prep_bias(bias_mask, gw, ng):
    """Super-window-grouped bias + its BlockSpec for `ng` groups per block.

    Window order is window-major in both the contiguous and the row-blocked
    grids, so the ti-th block always covers groups [ti*ng, (ti+1)*ng).
    Also folds the kernel softmax's constant shift into the bias (see
    `_attn_body`): exp(s − SHIFT)/Σexp(s − SHIFT) == softmax(s) exactly."""
    gb = _group_bias(bias_mask.astype(jnp.float32), gw) - _SOFTMAX_SHIFT
    nwg = gb.shape[0]
    if nwg == 1:
        bm = jnp.broadcast_to(gb, (ng,) + gb.shape[1:])
        bm_spec = pl.BlockSpec((ng,) + gb.shape[1:],
                               lambda bi, ti: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        assert nwg % ng == 0 or ng % nwg == 0, (nwg, ng)
        bm = gb
        if nwg % ng == 0:
            bpi = nwg // ng  # blocks per image
            bm_spec = pl.BlockSpec((ng,) + gb.shape[1:],
                                   lambda bi, ti: (ti % bpi, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
        else:
            reps = ng // nwg
            bm = jnp.tile(bm, (reps, 1, 1, 1))
            bm_spec = pl.BlockSpec((ng,) + gb.shape[1:],
                                   lambda bi, ti: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
    return bm, bm_spec


def _norm_attn_residual_fwd_pallas(x, w, b, wqkv, bqkv, wproj, bproj,
                                   bias_mask, num_heads, n_win):
    bsz, t, c = x.shape
    nw = bias_mask.shape[0]
    t_win = t // n_win  # windows per image
    # tokens per block: whole windows, divides T; ~1024 tokens balances VMEM
    # (f32 score tiles) against per-block weight DMA (sweepable via env)
    budget = int(os.environ.get("RSTPU_SWIN_TB", "1024"))
    tmw = t_win
    for cand in (64, 32, 16, 8, 4, 2, 1):
        if t_win % cand == 0 and cand * n_win <= budget:
            tmw = cand
            break
    tb = tmw * n_win
    gw = _pick_gw(n_win, tmw, nw)
    env_gw = os.environ.get("RSTPU_ATTN_GW")  # perf experiments only
    if env_gw and int(env_gw) <= gw and tmw % int(env_gw) == 0:
        gw = int(env_gw)
    ng = tb // (gw * n_win)

    bm, bm_spec = _prep_bias(bias_mask, gw, ng)
    grid = (bsz, t // tb)
    y, s, q = pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads, n_win=n_win,
                          gw=gw, tb=tb),
        out_shape=(jax.ShapeDtypeStruct((bsz, t, c), x.dtype),
                   jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tb, c), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
            bm_spec,
        ],
        out_specs=(pl.BlockSpec((1, tb, c), lambda bi, ti: (bi, ti, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                                memory_space=pltpu.VMEM)),
    )(x, w.astype(jnp.float32)[:, None], b.astype(jnp.float32)[:, None],
      wqkv, bqkv, wproj, bproj, bm)
    return y, s[:, 0], q[:, 0]


def norm_attn_residual(x, w, b, wqkv, bqkv, wproj, bproj, bias_mask,
                       num_heads, n_win):
    """Fused GN-affine + W-MSA + residual on (B, T, C) tokens.

    Thin wrapper over the `_stats` twin (the stats epilogue is free and its
    unused cotangents are zero under AD), so there is ONE VJP wiring."""
    return norm_attn_residual_stats(x, w, b, wqkv, bqkv, wproj, bproj,
                                    bias_mask, num_heads, n_win)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def norm_attn_residual_stats(x, w, b, wqkv, bqkv, wproj, bproj, bias_mask,
                             num_heads, n_win):
    """norm_attn_residual that also returns (sum, sumsq) of the output over
    the token axis (f32, (B, C)) — the next GroupNorm's statistics for free,
    accumulated while the output block is VMEM-resident."""
    return _norm_attn_residual_fwd_pallas(x, w, b, wqkv, bqkv, wproj, bproj,
                                          bias_mask, num_heads, n_win)


def _nars_fwd(x, w, b, wqkv, bqkv, wproj, bproj, bias_mask, num_heads, n_win):
    out = _norm_attn_residual_fwd_pallas(x, w, b, wqkv, bqkv, wproj, bproj,
                                         bias_mask, num_heads, n_win)
    return out, (x, w, b, wqkv, bqkv, wproj, bproj, bias_mask)


def _nars_bwd(num_heads, n_win, res, g):
    x, w, b, wqkv, bqkv, wproj, bproj, bias_mask = res
    _, vjp = jax.vjp(
        lambda *a: norm_attn_residual_stats_xla(*a, num_heads=num_heads,
                                                n_win=n_win),
        x, w, b, wqkv, bqkv, wproj, bproj, bias_mask)
    return vjp(g)


norm_attn_residual_stats.defvjp(_nars_fwd, _nars_bwd)


# ------------------------------------------ shift-absorbed attn / MLP ops

@functools.lru_cache(maxsize=64)
def _shift_perms(h, wd, ws, shift):
    from ..models.swin import shift_permutation  # lazy: avoids module cycle

    return shift_permutation(h, wd, ws, shift)


def shift_attn_residual_stats_xla(x, w, b, wqkv, bqkv, wproj, bproj,
                                  bias_mask, num_heads, n_win, h, wd, ws,
                                  shift):
    """XLA reference: apply the roll permutation, then norm+attn+residual.
    Output stays in the SHIFTED layout (stats are permutation-invariant)."""
    perm, _ = _shift_perms(h, wd, ws, shift)
    xs = jnp.take(x, jnp.asarray(perm), axis=1)
    return norm_attn_residual_stats_xla(xs, w, b, wqkv, bqkv, wproj, bproj,
                                        bias_mask, num_heads, n_win)


def _row_block(nwh, row):
    """Rows-per-block: largest k | nwh with k*row tokens within budget."""
    budget = int(os.environ.get("RSTPU_SWIN_TB", "1024"))
    for cand in range(max(1, min(nwh, budget // max(row, 1))), 1, -1):
        if nwh % cand == 0 and cand * row <= budget:
            return cand
    return 1


def _shift_attn_fwd_pallas(x, w, b, wqkv, bqkv, wproj, bproj, bias_mask,
                           num_heads, n_win, h, wd, ws, shift):
    bsz, t, c = x.shape
    nwh, nww = h // ws, wd // ws
    row = nww * n_win  # tokens per window-row
    k = _row_block(nwh, row)
    tb = k * row
    gw = _pick_gw(n_win, tb // n_win, bias_mask.shape[0])
    ng = tb // (gw * n_win)
    bm, bm_spec = _prep_bias(bias_mask, gw, ng)

    grid = (bsz, nwh // k)
    y, s, q = pl.pallas_call(
        functools.partial(_shift_attn_kernel, num_heads=num_heads,
                          n_win=n_win, gw=gw, tb=tb, k=k, nww=nww, ws=ws,
                          shift=shift),
        out_shape=(jax.ShapeDtypeStruct((bsz, t, c), x.dtype),
                   jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tb, c), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row, c), lambda bi, ti: (bi, (k * ti + k) % nwh, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
            bm_spec,
        ],
        out_specs=(pl.BlockSpec((1, tb, c), lambda bi, ti: (bi, ti, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                                memory_space=pltpu.VMEM)),
    )(x, x, w.astype(jnp.float32)[:, None], b.astype(jnp.float32)[:, None],
      wqkv, bqkv, wproj, bproj, bm)
    return y, s[:, 0], q[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def shift_attn_residual_stats(x, w, b, wqkv, bqkv, wproj, bproj, bias_mask,
                              num_heads, n_win, h, wd, ws, shift):
    """Fused [roll permutation] + GN-affine + SW-MSA + residual + stats.

    Input x is in the UNSHIFTED window-major layout; the kernel assembles
    each block's shifted tokens from two input refs (rows wi, wi+1 with
    wrap), so the permutation costs no standalone HBM pass.  Output y (and
    its stats) are in the SHIFTED layout; pair with
    `mlp_unshift_residual_stats` to come back."""
    return _shift_attn_fwd_pallas(x, w, b, wqkv, bqkv, wproj, bproj,
                                  bias_mask, num_heads, n_win, h, wd, ws,
                                  shift)


def _sars_fwd(x, w, b, wqkv, bqkv, wproj, bproj, bias_mask, num_heads, n_win,
              h, wd, ws, shift):
    out = _shift_attn_fwd_pallas(x, w, b, wqkv, bqkv, wproj, bproj, bias_mask,
                                 num_heads, n_win, h, wd, ws, shift)
    return out, (x, w, b, wqkv, bqkv, wproj, bproj, bias_mask)


def _sars_bwd(num_heads, n_win, h, wd, ws, shift, res, g):
    x, w, b, wqkv, bqkv, wproj, bproj, bias_mask = res
    _, vjp = jax.vjp(
        lambda *a: shift_attn_residual_stats_xla(
            *a, num_heads=num_heads, n_win=n_win, h=h, wd=wd, ws=ws,
            shift=shift),
        x, w, b, wqkv, bqkv, wproj, bproj, bias_mask)
    return vjp(g)


shift_attn_residual_stats.defvjp(_sars_fwd, _sars_bwd)


# ------------------------------------------------------------- MLP kernel

def _erf(x):
    """float32 erf for in-kernel use (Mosaic has no erf lowering).

    Abramowitz & Stegun 7.1.26 rational approximation, |error| <= 1.5e-7 —
    below f32 GELU noise and far below bf16 output rounding, so the fused
    kernel matches the XLA exact-GELU path bit-for-bit after the bf16 cast
    in practice (verified vs jax.lax.erf in tests at rtol 2e-4).

    Measured dead end (do not redo): computing this chain in packed bf16
    (2-per-lane VPU) REGRESSES the MLP call ~0.3 ms — Mosaic's packed
    vectors reject cmpf (the `sign`), and the f32 sign round-trip plus
    transcendental unpacking cost more than the packing saves
    (BasicLayer@64^2: 11.62 vs 10.30 ms).
    """
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return s * y


def _mlp_body(x, w_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_dtype):
    xn = (x.astype(jnp.float32) * w_ref[0] + b_ref[0]).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    # bias add at the ACTIVATION dtype, mirroring the XLA composition
    # (norm_mlp_residual_xla) op-for-op: there `xn @ w1 + b1` rounds the
    # matmul to x.dtype before the bias add, and GELU sees the rounded
    # value.  The GELU *arithmetic* stays f32 (same as XLA's erf lowering
    # on a bf16 operand — upcast, compute, round back); packed-bf16
    # arithmetic here was measured slower, see _erf.
    h = h.astype(x.dtype) + b1_ref[:].astype(x.dtype)
    hf = h.astype(jnp.float32)
    h = (0.5 * hf * (1.0 + _erf(hf * float(1.0 / np.sqrt(2.0))))).astype(x.dtype)
    out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    out = out.astype(x.dtype) + b2_ref[:].astype(x.dtype)
    return (x + out).astype(out_dtype)


def _mlp_kernel(x_ref, w_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                s_ref, q_ref):
    o_cast = _mlp_body(x_ref[0], w_ref, b_ref, w1_ref, b1_ref, w2_ref,
                       b2_ref, o_ref.dtype)
    o_ref[0] = o_cast
    _accumulate_stats(o_cast, s_ref, q_ref)


def _mlp_unshift_kernel(prv_ref, cur_ref, w_ref, b_ref, w1_ref, b1_ref,
                        w2_ref, b2_ref, o_ref, s_ref, q_ref, *, k, nww, ws,
                        shift):
    y = _unshift_assemble(prv_ref, cur_ref, k, nww, ws, shift)
    o_cast = _mlp_body(y, w_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       o_ref.dtype)
    o_ref[0] = o_cast
    _accumulate_stats(o_cast, s_ref, q_ref)


def _norm_mlp_residual_fwd_pallas(x, w, b, w1, b1, w2, b2):
    bsz, t, c = x.shape
    hidden = w1.shape[1]
    tb = int(os.environ.get("RSTPU_SWIN_TB", "1024"))
    while t % tb:
        tb //= 2
    grid = (bsz, t // tb)
    y, s, q = pl.pallas_call(
        _mlp_kernel,
        out_shape=(jax.ShapeDtypeStruct((bsz, t, c), x.dtype),
                   jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tb, c), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hidden), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, tb, c), lambda bi, ti: (bi, ti, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                                memory_space=pltpu.VMEM)),
    )(x, w.astype(jnp.float32)[:, None], b.astype(jnp.float32)[:, None],
      w1, b1, w2, b2)
    return y, s[:, 0], q[:, 0]


def norm_mlp_residual(x, w, b, w1, b1, w2, b2):
    """Fused GN-affine + fc1 + exact-GELU + fc2 + residual on (B, T, C).

    Thin wrapper over the `_stats` twin — see `norm_attn_residual`."""
    return norm_mlp_residual_stats(x, w, b, w1, b1, w2, b2)[0]


@jax.custom_vjp
def norm_mlp_residual_stats(x, w, b, w1, b1, w2, b2):
    """norm_mlp_residual that also returns the output's (sum, sumsq) over
    tokens (f32, (B, C)) as a free VMEM epilogue."""
    return _norm_mlp_residual_fwd_pallas(x, w, b, w1, b1, w2, b2)


def _nmrs_fwd(x, w, b, w1, b1, w2, b2):
    return _norm_mlp_residual_fwd_pallas(x, w, b, w1, b1, w2, b2), \
        (x, w, b, w1, b1, w2, b2)


def _nmrs_bwd(res, g):
    _, vjp = jax.vjp(norm_mlp_residual_stats_xla, *res)
    return vjp(g)


norm_mlp_residual_stats.defvjp(_nmrs_fwd, _nmrs_bwd)


def mlp_unshift_residual_stats_xla(y, w, b, w1, b1, w2, b2, h, wd, ws,
                                   shift):
    """XLA reference: undo the roll permutation, then norm+MLP+residual.
    The MLP is pointwise over tokens, so unshift commutes past it — the
    kernel applies it on READ and emits the UNSHIFTED output directly."""
    _, inv = _shift_perms(h, wd, ws, shift)
    yi = jnp.take(y, jnp.asarray(inv), axis=1)
    return norm_mlp_residual_stats_xla(yi, w, b, w1, b1, w2, b2)


def _mlp_unshift_fwd_pallas(y, w, b, w1, b1, w2, b2, h, wd, ws, shift):
    bsz, t, c = y.shape
    hidden = w1.shape[1]
    ws2 = ws * ws
    nwh, nww = h // ws, wd // ws
    row = nww * ws2
    k = _row_block(nwh, row)
    tb = k * row
    grid = (bsz, nwh // k)
    yo, s, q = pl.pallas_call(
        functools.partial(_mlp_unshift_kernel, k=k, nww=nww, ws=ws,
                          shift=shift),
        out_shape=(jax.ShapeDtypeStruct((bsz, t, c), y.dtype),
                   jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, row, c), lambda bi, ti: (bi, (k * ti - 1) % nwh, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, c), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hidden), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, tb, c), lambda bi, ti: (bi, ti, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                                memory_space=pltpu.VMEM)),
    )(y, y, w.astype(jnp.float32)[:, None], b.astype(jnp.float32)[:, None],
      w1, b1, w2, b2)
    return yo, s[:, 0], q[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def mlp_unshift_residual_stats(y, w, b, w1, b1, w2, b2, h, wd, ws, shift):
    """Fused [inverse roll permutation] + GN-affine + MLP + residual + stats.

    Input y is in the SHIFTED layout (from `shift_attn_residual_stats`);
    the kernel assembles each block's unshifted tokens on read (rows wi-1,
    wi with wrap) and writes the UNSHIFTED output."""
    return _mlp_unshift_fwd_pallas(y, w, b, w1, b1, w2, b2, h, wd, ws, shift)


def _murs_fwd(y, w, b, w1, b1, w2, b2, h, wd, ws, shift):
    return _mlp_unshift_fwd_pallas(y, w, b, w1, b1, w2, b2, h, wd, ws,
                                   shift), (y, w, b, w1, b1, w2, b2)


def _murs_bwd(h, wd, ws, shift, res, g):
    _, vjp = jax.vjp(
        lambda *a: mlp_unshift_residual_stats_xla(*a, h=h, wd=wd, ws=ws,
                                                  shift=shift), *res)
    return vjp(g)


mlp_unshift_residual_stats.defvjp(_murs_fwd, _murs_bwd)
