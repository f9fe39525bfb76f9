"""Winograd F(2x2, 3x3) convolution for TPU.

Why this exists: PERF.md's censuses put the VQGAN conv families at 86-95%
MFU — XLA's direct (implicit-GEMM) conv emitter is at the roof, so the only
way down is to do fewer MACs.  Winograd F(2,3) computes a 3x3 stride-1 conv
with 4/9 of the multiplies by transforming 4x4 input tiles (2x2 output
tiles) into a domain where the conv becomes an elementwise product — with a
channel contraction, 16 plain matmuls — then transforming back.  cuDNN does
this transparently for the torch reference on GPU; XLA:TPU does not, so a
hand-rolled Winograd path is genuine headroom rather than a re-derivation
of what the compiler already does.

Three layers:
  * `winograd_kernel_transform`: (3,3,C,Co) -> (4,4,C,Co) `U = G g G^T`
    (exact in f32 — G's entries are 0, 1, 1/2).
  * `winograd_conv3x3_xla`: pure-XLA formulation (correctness reference;
    materializes the transformed slabs so it pays ~4x activation bandwidth
    — kept for tests and as the non-TPU fallback).
  * `winograd_conv3x3`: fused Pallas kernel — transforms, the 16 matmuls,
    and the inverse transform all happen on VMEM-resident blocks, so HBM
    traffic equals the direct conv's (read x once, write y once) while the
    MXU does 4/9 of the work.

Numerics: transforms are computed in f32; the transformed activations are
rounded to the input dtype before the MXU (matching where the XLA
composition rounds conv inputs); accumulation is f32.  Winograd is NOT
bitwise equal to direct convolution — the result differs at the level of
floating-point reassociation (f32 Winograd vs f32 direct agree to ~1e-5
relative; in bf16 the difference sits inside the bf16 rounding band —
measured in PERF.md).

Reference parity note: replaces torch `nn.Conv2d(3,3,pad=1)` call sites
(reference ldm/modules/diffusionmodules/model.py:90-149 ResnetBlock convs,
models/unet.py:110-206 ResBlock convs) with identical parameters — the
param tree ({kernel (3,3,C,Co), bias (Co,)}) is unchanged, so checkpoints
and the torch converter are unaffected.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    pltpu = None
    _PALLAS_OK = False

__all__ = [
    "winograd_kernel_transform",
    "winograd_conv3x3_xla",
    "winograd_conv3x3",
    "winograd_available",
]

# F(2x2, 3x3) transform matrices (Lavin & Gray, arXiv:1509.09308).
# All entries are exactly representable in binary floating point.
#   B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
#   A^T = [[1,1,1,0],[0,1,-1,-1]]
_G = np.array([[1.0, 0.0, 0.0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0.0, 0.0, 1.0]], np.float32)
# A^T rows, used as 0/+-1 accumulation weights in the output transform
_AT = ((1.0, 1.0, 1.0, 0.0), (0.0, 1.0, -1.0, -1.0))


def winograd_kernel_transform(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, Co) HWIO kernel -> (4, 4, C, Co) Winograd-domain kernel."""
    g = jnp.asarray(_G)
    wf = w.astype(jnp.float32)
    return jnp.einsum("ua,vb,abio->uvio", g, g, wf)


def _bt_1d(d0, d1, d2, d3):
    """1-D input transform along one spatial axis: rows of B^T . d."""
    return (d0 - d2, d1 + d2, d2 - d1, d1 - d3)


def winograd_conv3x3_xla(x: jnp.ndarray, w: jnp.ndarray,
                         b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Pure-XLA Winograd F(2,3) SAME conv.  x: (B,H,W,C) with even H,W;
    w: (3,3,C,Co).  Transforms in f32, matmul inputs rounded to x.dtype,
    f32 accumulation — the same rounding points as the Pallas kernel."""
    bsz, h, wd, c = x.shape
    assert h % 2 == 0 and wd % 2 == 0, (h, wd)
    co = w.shape[-1]
    u = winograd_kernel_transform(w).astype(x.dtype)  # (4,4,C,Co)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(jnp.float32)
    # phase view: padded row 2i+a -> (even/odd slab, +-1 tile shift)
    xp = xp.reshape(bsz, h // 2 + 1, 2, wd // 2 + 1, 2, c)
    ph = {(ra, ca): xp[:, :, ra, :, ca] for ra in (0, 1) for ca in (0, 1)}

    def d(a, bb):  # d[a][bb][i,j] = x_padded[2i+a, 2j+bb]
        ra, ri = a % 2, a // 2
        ca, ci = bb % 2, bb // 2
        sl = ph[(ra, ca)]
        return sl[:, ri:ri + h // 2, ci:ci + wd // 2]  # (B, h/2, w/2, C)

    acc = [[None, None], [None, None]]
    for uu in range(4):
        # row transform at output-row index uu, for each column phase
        t_u = [None] * 4
        for bb in range(4):
            t_u[bb] = _bt_1d(d(0, bb), d(1, bb), d(2, bb), d(3, bb))[uu]
        v_u = _bt_1d(*t_u)  # column transform -> V[uu, vv]
        for vv in range(4):
            wr, wc = (_AT[0][uu], _AT[1][uu]), (_AT[0][vv], _AT[1][vv])
            if (wr[0] == 0.0 and wr[1] == 0.0) or (wc[0] == 0.0 and wc[1] == 0.0):
                continue
            vt = v_u[vv].astype(x.dtype)
            m = jnp.einsum("bijc,co->bijo", vt, u[uu, vv],
                           preferred_element_type=jnp.float32)
            for p in range(2):
                if wr[p] == 0.0:
                    continue
                for q in range(2):
                    if wc[q] == 0.0:
                        continue
                    term = m if wr[p] * wc[q] == 1.0 else -m
                    acc[p][q] = term if acc[p][q] is None else acc[p][q] + term

    # interleave 2x2 output phases: (B, h/2, w/2, Co) x4 -> (B, H, W, Co)
    row0 = jnp.stack([acc[0][0], acc[0][1]], axis=3).reshape(bsz, h // 2, wd, co)
    row1 = jnp.stack([acc[1][0], acc[1][1]], axis=3).reshape(bsz, h // 2, wd, co)
    y = jnp.stack([row0, row1], axis=2).reshape(bsz, h, wd, co)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


# --------------------------------------------------------------- Pallas path

def winograd_available(x_shape, c: int, co: int) -> bool:
    """Shape gate for the fused kernel: stride-1 SAME 3x3 with even spatial
    dims and channel counts that keep the matmuls MXU-shaped."""
    if not _PALLAS_OK:
        return False
    if len(x_shape) != 4:
        return False
    _, h, wd, _ = x_shape
    return (h % 2 == 0 and wd % 2 == 0 and h >= 8 and wd >= 8
            and c >= 64 and co >= 64 and wd <= 1024)


def _pick_tr(h: int, wd: int, c: int, co_blk: int) -> int:
    """Tile-rows per grid step: keep the live VMEM working set ~<= 6 MB
    (input block f32 copy + ~8 live transform slabs + U + accumulators),
    leaving room for Mosaic's double buffering."""
    for tr in (16, 8, 4, 2, 1):
        if (h // 2) % tr:
            continue
        tiles = tr * (wd // 2)
        work = (2 * tr + 2) * (wd + 2) * c * (2 + 4)   # in block bf16 + f32 copy
        work += 8 * tiles * c * 4                      # live transform slabs f32
        work += 16 * c * co_blk * 2                    # U block
        work += 4 * tiles * co_blk * 4                 # output accumulators f32
        if work <= 6 * 1024 * 1024:
            return tr
    return 1


def _wino_kernel(x_ref, xh_ref, u_ref, b_ref, o_ref, *, tr: int,
                 w2: int, c: int, co_blk: int):
    """One grid step: output rows [2*i*tr, 2*(i+1)*tr), one Co block.

    x_ref:  (1, 2*tr, W+2, C)  rows [2*i*tr, 2*(i+1)*tr) of the padded input
    xh_ref: (1, 2, W+2, C)     halo rows [2*(i+1)*tr, 2*(i+1)*tr + 2)
    u_ref:  (16, C, co_blk)    transformed kernel
    b_ref:  (1, co_blk)        bias row (zeros when absent)
    o_ref:  (1, 2*tr, W, co_blk)
    """
    out_dtype = o_ref.dtype
    wd = 2 * w2
    xa = x_ref[:].reshape(2 * tr, wd + 2, c)
    xh = xh_ref[:].reshape(2, wd + 2, c)
    xm = jnp.concatenate([xa, xh], axis=0)  # (2tr+2, W+2, C)
    # row-pair view (free reshape: splits the leading dim)
    x4 = xm.astype(jnp.float32).reshape(tr + 1, 2, wd + 2, c)

    def row_phase(a):  # rows 2i+a of the padded block, i in [0, tr)
        ra, ri = a % 2, a // 2
        sl = jax.lax.slice(x4, (ri, ra, 0, 0), (ri + tr, ra + 1, wd + 2, c))
        return sl.reshape(tr, w2 + 1, 2, c)

    def col_phase(slab, bb):  # (tr, w2+1, 2, c) -> cols 2j+bb -> (tr*w2, c)
        ca, ci = bb % 2, bb // 2
        return jax.lax.slice(slab, (0, ci, ca, 0), (tr, ci + w2, ca + 1, c)
                             ).reshape(tr * w2, c)

    rp = [row_phase(a) for a in range(4)]
    acc = [[None, None], [None, None]]
    for uu in range(4):
        # 1-D row transform at index uu (1 add each, on (tr, w2+1, 2, c))
        t0, t1, t2, t3 = rp
        tu = _bt_1d(t0, t1, t2, t3)[uu]
        # column phases of the row-transformed slab
        cps = [col_phase(tu, bb) for bb in range(4)]
        v_u = _bt_1d(*cps)
        wr = (_AT[0][uu], _AT[1][uu])
        for vv in range(4):
            wc = (_AT[0][vv], _AT[1][vv])
            if (wr[0] == 0.0 and wr[1] == 0.0) or (wc[0] == 0.0 and wc[1] == 0.0):
                continue
            # round where the XLA composition rounds conv inputs
            vt = v_u[vv].astype(out_dtype)
            m = jnp.dot(vt, u_ref[4 * uu + vv],
                        preferred_element_type=jnp.float32)  # (tr*w2, co)
            for p in range(2):
                if wr[p] == 0.0:
                    continue
                for q in range(2):
                    if wc[q] == 0.0:
                        continue
                    term = m if wr[p] * wc[q] == 1.0 else -m
                    acc[p][q] = term if acc[p][q] is None else acc[p][q] + term

    bias = b_ref[0].astype(jnp.float32)
    # interleave 2x2 output phases back into (2tr, W, co)
    r0 = jnp.stack([acc[0][0] + bias, acc[0][1] + bias], axis=1)
    r1 = jnp.stack([acc[1][0] + bias, acc[1][1] + bias], axis=1)
    r0 = r0.reshape(tr, 2 * w2, co_blk)  # (tiles, 2, co) -> row-p0 rows
    r1 = r1.reshape(tr, 2 * w2, co_blk)
    y = jnp.stack([r0, r1], axis=1).reshape(2 * tr, 2 * w2, co_blk)
    o_ref[:] = y.astype(out_dtype)[None]


def winograd_conv3x3(x: jnp.ndarray, w: jnp.ndarray,
                     b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Fused-Winograd SAME 3x3 stride-1 conv (Pallas TPU kernel).

    Callers gate with `winograd_available` and fall back to `lax.conv`
    (via nn.Conv) otherwise.  In tests the kernel runs under the Pallas
    interpreter on CPU."""
    bsz, h, wd, c = x.shape
    co = w.shape[-1]
    h2, w2 = h // 2, wd // 2
    # Co blocking: keep U's (16, C, co_blk) slab small enough to stay
    # VMEM-resident across the whole (batch x rows) sweep.  Co is the
    # OUTERMOST grid dim, so U is fetched co//co_blk times total instead
    # of once per row-block (U traffic would otherwise dominate HBM).
    budget = 6 * 1024 * 1024
    if 16 * c * co * 2 <= budget:
        co_blk = co
    else:
        # largest divisor of co (lane-multiple preferred) that fits the
        # budget — never fall back to the full co, which would defeat the
        # VMEM cap the blocking enforces (e.g. co=320 with large C)
        fits = [d for d in range(co, 0, -1)
                if co % d == 0 and 16 * c * d * 2 <= budget]
        lane = [d for d in fits if d % 128 == 0]
        co_blk = (lane or fits)[0]
    tr = _pick_tr(h, wd, c, co_blk)

    u = winograd_kernel_transform(w).astype(x.dtype).reshape(16, c, co)
    bias = (jnp.zeros((1, co), jnp.float32) if b is None
            else b.astype(jnp.float32).reshape(1, co))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (B, H+2, W+2, C)

    grid = (co // co_blk, bsz, h2 // tr)
    kernel = functools.partial(_wino_kernel, tr=tr, w2=w2, c=c, co_blk=co_blk)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * tr, wd + 2, c),
                         lambda j, bi, i: (bi, i, 0, 0)),
            # halo: the next two padded rows, block-indexed in 2-row units
            pl.BlockSpec((1, 2, wd + 2, c),
                         lambda j, bi, i: (bi, (i + 1) * tr, 0, 0)),
            pl.BlockSpec((16, c, co_blk), lambda j, bi, i: (0, 0, j)),
            pl.BlockSpec((1, co_blk), lambda j, bi, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, 2 * tr, wd, co_blk),
                               lambda j, bi, i: (bi, i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, co), x.dtype),
    )(xp, xp, u, bias)
