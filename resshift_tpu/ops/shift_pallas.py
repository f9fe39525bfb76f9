"""Shifted-window token permutation as a Pallas TPU kernel.

SwinTransformerBlock applies `roll(-ws/2) + re-partition` to the window-major
token list before its shifted attention, and the inverse after
(reference swin_transformer.py:247-276; here a single static permutation —
models/swin.py:shift_permutation).  As `jnp.take` over 4096+ rows that
permutation costs ~1.0 ms per application on v5e (XLA lowers it to a real
HBM gather).  But the permutation is local: shifted window-row `wi` draws
only from unshifted window-rows `wi` and `wi+1`.  This kernel streams one
window-row block plus its wrap-around neighbor through VMEM and emits the
permuted block with static slice/concat copies — pure data movement at
VMEM speed, ~10x faster than the gather, any image size.

The permutation's transpose is its inverse, so the custom VJP is another
call with `inverse` flipped — exact, no recompute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas TPU backend is unavailable on CPU test runs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

__all__ = ["shift_tokens_pallas", "pallas_available"]


def pallas_available() -> bool:
    from .swin_block_pallas import pallas_available as _avail

    return _PALLAS_OK and _avail()


def _fwd_kernel(cur_ref, nxt_ref, o_ref, *, nww, ws, shift):
    c = cur_ref.shape[-1]
    cur = cur_ref[0].reshape(nww, ws, ws, c)
    nxt = nxt_ref[0].reshape(nww, ws, ws, c)
    # rows: shifted (wi, ri<ws-s) <- wi rows ri+s; else <- wi+1 rows ri-(ws-s)
    x = jnp.concatenate([cur[:, shift:], nxt[:, :shift]], axis=1)
    # cols: same within the assembled row block, wrapping window-columns
    nc = jnp.concatenate([x[1:], x[:1]], axis=0)
    x = jnp.concatenate([x[:, :, shift:], nc[:, :, :shift]], axis=2)
    o_ref[0] = x.reshape(nww * ws * ws, c)


def _inv_kernel(prv_ref, cur_ref, o_ref, *, nww, ws, shift):
    c = cur_ref.shape[-1]
    prv = prv_ref[0].reshape(nww, ws, ws, c)
    cur = cur_ref[0].reshape(nww, ws, ws, c)
    x = jnp.concatenate([prv[:, ws - shift:], cur[:, :ws - shift]], axis=1)
    pc = jnp.concatenate([x[-1:], x[:-1]], axis=0)
    x = jnp.concatenate([pc[:, :, ws - shift:], x[:, :, :ws - shift]], axis=2)
    o_ref[0] = x.reshape(nww * ws * ws, c)


def _call(xt, h, w, ws, shift, inverse):
    b, t, c = xt.shape
    nwh, nww = h // ws, w // ws
    blk = nww * ws * ws  # one window-row of tokens
    if inverse:
        kern = functools.partial(_inv_kernel, nww=nww, ws=ws, shift=shift)
        maps = [lambda bi, ti: (bi, (ti - 1) % nwh, 0),  # prev window-row
                lambda bi, ti: (bi, ti, 0)]
    else:
        kern = functools.partial(_fwd_kernel, nww=nww, ws=ws, shift=shift)
        maps = [lambda bi, ti: (bi, ti, 0),
                lambda bi, ti: (bi, (ti + 1) % nwh, 0)]  # next window-row
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, t, c), xt.dtype),
        grid=(b, nwh),
        in_specs=[pl.BlockSpec((1, blk, c), m, memory_space=pltpu.VMEM)
                  for m in maps],
        out_specs=pl.BlockSpec((1, blk, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
    )(xt, xt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def shift_tokens_pallas(xt: jnp.ndarray, h: int, w: int, ws: int, shift: int,
                        inverse: bool = False) -> jnp.ndarray:
    """Permute (B, nW*N, C) window-major tokens to/from the shifted layout.

    Matches `jnp.take(xt, shift_permutation(h, w, ws, shift)[inverse], 1)`.
    """
    return _call(xt, h, w, ws, shift, inverse)


def _stp_fwd(xt, h, w, ws, shift, inverse):
    return _call(xt, h, w, ws, shift, inverse), None


def _stp_bwd(h, w, ws, shift, inverse, _, g):
    # transpose of a permutation == its inverse
    return (_call(g, h, w, ws, shift, not inverse),)


shift_tokens_pallas.defvjp(_stp_fwd, _stp_bwd)
