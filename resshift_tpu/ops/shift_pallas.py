"""Shifted-window token permutation as a Pallas TPU kernel.

SwinTransformerBlock applies `roll(-ws/2) + re-partition` to the window-major
token list before its shifted attention, and the inverse after
(reference swin_transformer.py:247-276; here a single static permutation —
models/swin.py:shift_permutation).  As `jnp.take` over 4096+ rows that
permutation costs ~0.9 ms per application on v5e (XLA lowers it to a real
HBM gather).  But the permutation is local: shifted window-row `wi` draws
only from unshifted window-rows `wi` and `wi+1`.  This kernel streams a
group of window-rows plus the one wrap-around neighbor row through VMEM and
emits the permuted block with static slice/concat copies — pure data
movement at VMEM speed, any image size.  Blocks pack several window-rows
(and batch images when the whole image fits) to amortize per-invocation
grid overhead.

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


def _fwd_kernel(cur_ref, nxt_ref, o_ref, *, k, nww, ws, shift):
    bb, _, c = cur_ref.shape
    cur = cur_ref[...].reshape(bb, k, nww, ws, ws, c)
    nxt = nxt_ref[...].reshape(bb, 1, nww, ws, ws, c)
    # rows: shifted (wi, ri<ws-s) <- wi rows ri+s; else <- wi+1 rows 0..s
    # k == 1: the row comes entirely from the neighbor ref (Mosaic rejects
    # the zero-size cur[:, 1:] slice — same guard as _shift_assemble in
    # swin_block_pallas.py)
    nrow = nxt if k == 1 else jnp.concatenate([cur[:, 1:], nxt], axis=1)
    x = jnp.concatenate([cur[:, :, :, shift:], nrow[:, :, :, :shift]], axis=3)
    # cols: same pattern, window-columns wrap within the row
    nc = jnp.concatenate([x[:, :, 1:], x[:, :, :1]], axis=2)
    x = jnp.concatenate([x[:, :, :, :, shift:], nc[:, :, :, :, :shift]], axis=4)
    o_ref[...] = x.reshape(bb, k * nww * ws * ws, c)


def _inv_kernel(prv_ref, cur_ref, o_ref, *, k, nww, ws, shift):
    bb, _, c = cur_ref.shape
    prv = prv_ref[...].reshape(bb, 1, nww, ws, ws, c)
    cur = cur_ref[...].reshape(bb, k, nww, ws, ws, c)
    prow = prv if k == 1 else jnp.concatenate([prv, cur[:, :k - 1]], axis=1)
    x = jnp.concatenate([prow[:, :, :, ws - shift:], cur[:, :, :, :ws - shift]], axis=3)
    pc = jnp.concatenate([x[:, :, -1:], x[:, :, :-1]], axis=2)
    x = jnp.concatenate([pc[:, :, :, :, ws - shift:], x[:, :, :, :, :ws - shift]], axis=4)
    o_ref[...] = x.reshape(bb, k * nww * ws * ws, c)


def _call(xt, h, w, ws, shift, inverse):
    b, t, c = xt.shape
    nwh, nww = h // ws, w // ws
    row = nww * ws * ws  # tokens per window-row
    row_bytes = row * c * xt.dtype.itemsize
    # scoped-VMEM model (fit from on-chip failures: w=320/k=2 OOMed at
    # 17.47M; w=128/k=4 runs at ~13.5M): peak ≈ 7·blk_bytes + 3.7·row_bytes
    # (double-buffered in/neighbor/out blocks + the kernel's concat temps).
    # Budget 15M against the 16M limit; if even one row per block does not
    # fit (w ≥ ~448 at c=192 bf16), the XLA row-gather is the right tool —
    # these huge-latent programs are ≥1 s anyway, the ~1 ms gather is noise.
    budget = 15 * (1 << 20)
    k_max = int((budget / row_bytes - 3.7) / 7.0)
    if k_max < 1:
        from ..models.swin import shift_permutation

        perm, inv = shift_permutation(h, w, ws, shift)
        return jnp.take(xt, jnp.asarray(inv if inverse else perm), axis=1)
    k = min(nwh, k_max)
    while k > 1 and nwh % k:
        k -= 1
    bb = 1
    if k == nwh:
        for cand in (8, 4, 2):
            if b % cand == 0 and cand * (7 * k + 3.7) * row_bytes <= budget:
                bb = cand
                break
    blk = k * row

    if inverse:
        kern = functools.partial(_inv_kernel, k=k, nww=nww, ws=ws, shift=shift)
        neigh = lambda bi, ti: (bi, (k * ti - 1) % nwh, 0)
        specs = [pl.BlockSpec((bb, row, c), neigh, memory_space=pltpu.VMEM),
                 pl.BlockSpec((bb, blk, c), lambda bi, ti: (bi, ti, 0),
                              memory_space=pltpu.VMEM)]
        args = (xt, xt)
    else:
        kern = functools.partial(_fwd_kernel, k=k, nww=nww, ws=ws, shift=shift)
        neigh = lambda bi, ti: (bi, (k * ti + k) % nwh, 0)
        specs = [pl.BlockSpec((bb, blk, c), lambda bi, ti: (bi, ti, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((bb, row, c), neigh, memory_space=pltpu.VMEM)]
        args = (xt, xt)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, t, c), xt.dtype),
        grid=(b // bb, nwh // k),
        in_specs=specs,
        out_specs=pl.BlockSpec((bb, blk, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
    )(*args)


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
