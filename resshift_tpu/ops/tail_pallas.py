"""Fused GroupNorm-affine + SiLU + 3x3-conv-to-few-channels Pallas kernel.

STATUS: correct but measured SLOWER than XLA's composition on chip — ships
DEFAULT OFF as a documented negative result (PERF.md round-3 ledger; see
gn_silu_conv3x3 below for the numbers and the mechanism).  Kept because
the packed-tap matmul building block and the measurement harness
(tools/profile_tail.py) make re-evaluation on other chips one command.

Targets the two "output head" compositions the decoder census flagged
(PERF.md: GN+silu+conv_out(128->3)@256^2 measures 10.6 ms vs a ~5 ms
two-pass floor):

  * VQGAN decoder tail  — norm_out -> silu -> conv_out(C->3), bf16
    activations (ldm/modules/diffusionmodules/model.py:655-659);
  * UNet output head    — out_norm -> silu -> out_conv(C->3), f32 by
    design (models/unet.py:893-895) — runs once per denoising step.

Why XLA leaves time on the table here: GroupNorm32's f32 statistics force
a stats pass (read) and the conv cannot fuse the normalize+silu chain
into its input, so the normalized tensor is materialized (write + read)
before a conv whose N=3 output pads to 128 MXU lanes.  The kernel:

  pass 1 (XLA): folded per-(image, channel) GN affine `w, b`
    (models/layers.py group_norm_fold — one bandwidth-bound read);
  pass 2 (Pallas, this file): stream row blocks through VMEM, apply
    `x*w+b` -> silu, then compute the 3x3 conv as ONE packed matmul
    (C, 9*Co) — all nine taps' columns in a single MXU pass, 9x fewer
    padded-lane FLOPs than per-tap matmuls — and combine taps with
    static shifted slice-adds in f32 (matching XLA's f32 conv
    accumulation).  The normalized tensor never touches HBM.

Rounding points match the XLA composition: bf16 mode rounds after the GN
affine and after silu (where GroupNorm32/nn.silu/nn.Conv round), sums
taps in f32, rounds the conv result, then adds the bias in the conv
dtype (flax nn.Conv order); f32 mode keeps everything f32.

Backward: custom VJP recomputes the XLA reference composition (the
repo-standard "kernel forward, XLA-recompute backward" — the op is
differentiable for the LPIPS-trainer decode path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .swin_attention_pallas import pallas_available

__all__ = ["gn_silu_conv3x3", "tail_available"]


def tail_available(shape, out_ch: int) -> bool:
    """Kernel applicability: TPU backend, lane/sublane-friendly dims, and a
    per-chunk VMEM footprint that leaves room for double buffering."""
    if not pallas_available():
        return False
    b, h, w, c = shape
    if out_ch > 8 or c % 128 not in (0, 32, 64, 96) or c > 1024:
        return False
    if w % 8 != 0 or h < 8:
        return False
    return _pick_bh(h, w, c) is not None


def _pick_bh(h: int, w: int, c: int) -> int | None:
    """Rows per grid chunk: divide H, and keep the in-kernel temporaries
    (~3.5 f32 copies of the (bh+2, W, C) working set: affine, silu, packed
    matmul output at physical 128-lane padding) inside the 16 MB scoped
    VMEM stack."""
    # measured on-chip: Mosaic's stack holds ~8-9 f32 copies of the
    # working set (concat, affine, rounding round-trips, sigmoid, product,
    # 128-lane-padded matmul output, shift scratch); the pallas_call raises
    # vmem_limit_bytes accordingly, so budget ~9 copies against ~80 MB
    budget = 80 * 1024 * 1024
    for bh in (64, 32, 16, 8):
        if h % bh == 0 and int((bh + 2) * w * c * 4 * 9) <= budget:
            return bh
    return None


def _kernel(xm_ref, xt_ref, xb_ref, w_ref, b_ref, wp_ref, cb_ref, o_ref,
            shift_scr, *, bh: int, co: int, act_bf16: bool):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    # assemble rows with the 1-row halo (edge chunks read a clamped
    # neighbor row; its POST-SILU value is zeroed below — the conv
    # zero-pads the normalized+silu activation, so zeroing the raw input
    # would wrongly contribute silu(gn_bias) at the borders)
    x = jnp.concatenate([xt_ref[0], xm_ref[0], xb_ref[0]], axis=0)  # (bh+2, W, C)
    wv = w_ref[0].reshape(1, 1, -1)
    bv = b_ref[0].reshape(1, 1, -1)
    af = x.astype(jnp.float32) * wv + bv                 # GN normalize, f32
    if act_bf16:
        # XLA rounding points: GroupNorm32 casts back to bf16, silu runs on
        # the bf16 value (transcendental in f32), result rounds to bf16
        af = af.astype(jnp.bfloat16).astype(jnp.float32)
        s = (af * jax.nn.sigmoid(af)).astype(jnp.bfloat16)
    else:
        s = af * jax.nn.sigmoid(af)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where((row == 0) & (i == 0), jnp.zeros_like(s), s)
    s = jnp.where((row == s.shape[0] - 1) & (i == n - 1),
                  jnp.zeros_like(s), s)
    rows, wdim, c = s.shape
    p = jnp.dot(s.reshape(rows * wdim, c), wp_ref[:],
                preferred_element_type=jnp.float32)      # (T, 9*co) f32
    p = p.reshape(rows, wdim, 9 * co)
    acc = jnp.zeros((bh, wdim, co), jnp.float32)
    for ky in range(3):
        block = p[ky:ky + bh]
        for kx in range(3):
            k = ky * 3 + kx
            sl = block[:, :, k * co:(k + 1) * co]
            # x-shifts realign through a VMEM scratch store (Mosaic cannot
            # concatenate the offset-layout narrow-lane slices directly)
            if kx == 0:    # tap reads x-1: shift right, zero col 0
                shift_scr[:, 1:, :] = sl[:, :-1]
                shift_scr[:, :1, :] = jnp.zeros((bh, 1, co), jnp.float32)
                sl = shift_scr[:]
            elif kx == 2:  # tap reads x+1: shift left, zero last col
                shift_scr[:, :-1, :] = sl[:, 1:]
                shift_scr[:, -1:, :] = jnp.zeros((bh, 1, co), jnp.float32)
                sl = shift_scr[:]
            acc = acc + sl
    cb = cb_ref[:].reshape(1, 1, co)
    if act_bf16:
        out = acc.astype(jnp.bfloat16) + cb.astype(jnp.bfloat16)
    else:
        out = acc + cb.astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _reference(x, gn_w, gn_b, kernel, cbias, act_bf16: bool):
    """The exact XLA composition the kernel replaces (for VJP + tests)."""
    af = x.astype(jnp.float32) * gn_w[:, None, None, :] + gn_b[:, None, None, :]
    if act_bf16:
        af = af.astype(jnp.bfloat16)
        s = jax.nn.silu(af)
        # bf16-out conv == f32-preferred accumulate + one round to bf16
        # (verified bitwise), and unlike preferred_element_type=f32 it is
        # differentiable: the transpose-RHS rule rebuilds a conv from the
        # (output-dtype) cotangent, which must match the lhs dtype —
        # mixed bf16/f32 there broke VQGAN *training* through this tail.
        y = jax.lax.conv_general_dilated(
            s, kernel.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + cbias.astype(jnp.bfloat16)
    s = jax.nn.silu(af)
    y = jax.lax.conv_general_dilated(
        s, kernel.astype(jnp.float32), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + cbias.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused(x, gn_w, gn_b, kernel, cbias, act_bf16):
    b, h, w, c = x.shape
    co = kernel.shape[-1]
    bh = _pick_bh(h, w, c)
    dt = jnp.bfloat16 if act_bf16 else jnp.float32
    x = x.astype(dt)
    # packed weights: column (ky*3+kx)*co + oc  <-  kernel[ky, kx, :, oc]
    wp = kernel.astype(jnp.float32).transpose(2, 0, 1, 3).reshape(c, 9 * co)
    wp = wp.astype(dt)
    n = h // bh
    grid = (b, n)
    kern = functools.partial(_kernel, bh=bh, co=co, act_bf16=act_bf16)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bh, w, c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            # halo rows: the single row above / below the main block,
            # clamped at the image edge (the kernel zeroes the clamped read)
            pl.BlockSpec((1, 1, w, c),
                         lambda bi, i: (bi, jnp.maximum(i * bh - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, c),
                         lambda bi, i: (bi, jnp.minimum((i + 1) * bh,
                                                        h - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            # affines as (B, 1, C): a (1, 1, C) block satisfies the TPU
            # block rule (last two dims equal the array's trailing dims)
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 9 * co), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w, co), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bh, w, co), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, x, x, gn_w[:, None, :], gn_b[:, None, :], wp,
      cbias.astype(jnp.float32).reshape(1, co))
    return out


def _fused_fwd(x, gn_w, gn_b, kernel, cbias, act_bf16):
    return (_fused(x, gn_w, gn_b, kernel, cbias, act_bf16),
            (x, gn_w, gn_b, kernel, cbias))


def _fused_bwd(act_bf16, res, g):
    x, gn_w, gn_b, kernel, cbias = res
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, act_bf16=act_bf16), x, gn_w, gn_b,
        kernel, cbias)
    return vjp(g.astype(jnp.float32) if not act_bf16 else g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def gn_silu_conv3x3(x, gn_scale, gn_bias, kernel, cbias, *,
                    num_groups: int = 32, eps: float = 1e-5,
                    act_bf16: bool | None = None,
                    use_pallas: bool | None = None) -> jnp.ndarray:
    """GroupNorm(num_groups, eps, f32 stats) -> SiLU -> conv3x3(C -> co).

    x: (B, H, W, C); gn_scale/gn_bias: (C,) f32; kernel: (3, 3, C, co);
    cbias: (co,).  `act_bf16=None` derives the mode from x.dtype.
    Falls back to the identical XLA composition off-TPU, for shapes the
    kernel does not cover, or when `use_pallas=False` is pinned (the same
    tri-state contract as the swin/flash kernels).
    """
    from ..models.layers import group_norm_fold

    if act_bf16 is None:
        act_bf16 = x.dtype == jnp.bfloat16
    co = kernel.shape[-1]
    # DEFAULT OFF (kernel engages only when use_pallas is pinned True):
    # measured on chip, the fused kernel is numerically exact (f32 138.9 dB
    # SNR / bf16 rounding band) but SLOWER — standalone 15.7 vs 9.3 ms
    # (decoder tail) and 2.54 vs 2.15 ms (UNet head), composed bench
    # 3.07 -> 2.82 Mpx/s.  The composition is VPU-bound, not HBM-bound:
    # XLA already fuses the GN-affine+silu chain into one pass, and the
    # kernel's row assembly, rounding round-trips, and 27-lane tap combine
    # cost more VPU time than the saved intermediate traffic.  See the
    # PERF.md negative-results ledger.
    ok = use_pallas is True and tail_available(x.shape, co)
    w, b = group_norm_fold(x, gn_scale, gn_bias, num_groups, eps)
    if ok:
        return _fused(x, w, b, kernel, cbias, bool(act_bf16))
    return _reference(x, w, b, kernel, cbias, bool(act_bf16))
