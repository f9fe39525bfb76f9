"""Swin window-attention stage (NHWC, Flax linen).

Mirrors the reference's `models/swin_transformer.py`:
  * `BasicLayer` = patch-embed 1x1 conv -> depth SwinTransformerBlocks
    (alternating shift 0 / ws//2) -> patch-unembed 1x1 conv (:348-450).
  * `WindowAttention` = W-MSA over ws*ws-token windows with a learned
    relative-position-bias table (:65-161).
  * Shifted-window masks are recomputed for the actual runtime resolution
    (:262-265) — here they are *baked at trace time* from the static shape,
    so each compiled tile shape carries its mask as a constant.
  * Norm layers are GroupNorm32 (not LayerNorm), and the MLP is two 1x1
    convs == Dense on the channel axis (:17-33, :197-205).
  * The shift/window size of a block is resolved from the *build-time*
    resolution (config image_size), NOT the runtime shape (:191-195); at
    runtime only the mask adapts.  GELU is exact (erf), matching torch.

TPU execution: each BasicLayer window-partitions ONCE into a (B, T, C)
token layout; every block then runs as two fused Pallas kernels
(`ops.swin_block_pallas`: norm+attention+residual, norm+MLP+residual) with
the shifted layout applied as a static token permutation — see the
SwinTransformerBlock docstring.  The standalone `WindowAttention` module
(XLA or the `ops.swin_attention_pallas` kernel) remains as the
attention-only public API and the parity baseline.
"""

from __future__ import annotations

import functools
import math
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import GroupNorm32

Dtype = jnp.dtype


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C), row-major window order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=64)
def relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2ws-1)^2 bias table (swin:92-102)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=64)
def _window_token_spatial_ids(h: int, w: int, ws: int) -> np.ndarray:
    """(nW*N,) spatial pixel id held by each window-layout token (same
    ordering as :func:`window_partition`: row-major windows, row-major
    tokens)."""
    ids = np.arange(h * w).reshape(1, h, w, 1)
    t = ids.reshape(1, h // ws, ws, w // ws, ws, 1).transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(-1)


@functools.lru_cache(maxsize=64)
def shift_permutation(h: int, w: int, ws: int, shift: int) -> tuple[np.ndarray, np.ndarray]:
    """Static token permutation implementing roll(-shift) + re-partition.

    The reference materializes the shifted layout with jnp.roll +
    window_partition each block (swin_transformer.py:247-262).  Both are
    pure data movements, so their composition is a fixed permutation of the
    once-partitioned token list: `perm[j]` = unshifted-layout index of the
    token that lands at shifted-layout position j.  Returns (perm, inv_perm).
    """
    base = _window_token_spatial_ids(h, w, ws)
    inv0 = np.empty_like(base)
    inv0[base] = np.arange(base.size)
    r, c = base // w, base % w
    rolled_spatial = ((r + shift) % h) * w + (c + shift) % w
    perm = inv0[rolled_spatial]
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return perm, inv


def shift_tokens(xt: jnp.ndarray, h: int, w: int, ws: int, shift: int,
                 inverse: bool = False) -> jnp.ndarray:
    """Apply the roll(-shift)+re-partition permutation with static slices.

    Equivalent to `jnp.take(xt, shift_permutation(...)[0 or 1], axis=1)`
    (tested).  NOTE: measured SLOWER than the gather on v5e (the concat
    chain materializes two extra full tensors with relayout copies:
    17.9 vs 13.4 ms per 64^2 BasicLayer), so SwinTransformerBlock uses the
    gather; this form is kept as the readable spec of the permutation and
    for backends where gathers are the bottleneck.

    xt: (B, nW*N, C) window-major tokens.  The window-row axis wraps like
    jnp.roll: the reference rolls the spatial image (swin:247-262), so
    tokens crossing the bottom/right edge come from the top/left.
    """
    b, t, c = xt.shape
    nwh, nww = h // ws, w // ws
    x6 = xt.reshape(b, nwh, nww, ws, ws, c)
    if not inverse:
        # out row ri < ws-shift <- same window row ri+shift;
        # else <- next window-row's rows [0, shift)
        nxt = jnp.concatenate([x6[:, 1:], x6[:, :1]], axis=1)
        x6 = jnp.concatenate([x6[:, :, :, shift:], nxt[:, :, :, :shift]], axis=3)
        nxt = jnp.concatenate([x6[:, :, 1:], x6[:, :, :1]], axis=2)
        x6 = jnp.concatenate([x6[:, :, :, :, shift:], nxt[:, :, :, :, :shift]], axis=4)
    else:
        prv = jnp.concatenate([x6[:, -1:], x6[:, :-1]], axis=1)
        x6 = jnp.concatenate([prv[:, :, :, ws - shift:], x6[:, :, :, :ws - shift]], axis=3)
        prv = jnp.concatenate([x6[:, :, -1:], x6[:, :, :-1]], axis=2)
        x6 = jnp.concatenate([prv[:, :, :, :, ws - shift:], x6[:, :, :, :, :ws - shift]], axis=4)
    return x6.reshape(b, t, c)


@functools.lru_cache(maxsize=64)
def shifted_window_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws*ws, ws*ws) additive mask of 0 / -100.

    This replicates the reference's `calculate_mask` (swin:214-236)
    *bit-exactly, including its quirks*: the reference indexes an NCHW
    (1,1,H,W) tensor with NHWC-style `[:, h, w, :]` slices (so the region
    labels only partition the H axis), and flattens mask tokens w-major via
    `.permute(0,2,3,1)` (swin:230-231).  The shipped checkpoints were
    trained with this exact mask, so a textbook Swin mask would NOT be
    weight-compatible.
    """
    img = np.zeros((1, 1, h, w))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt  # faithful: hs hits the size-1 dim
            cnt += 1
    # reference window_partition on NCHW, then .permute(0,2,3,1).view(-1, N)
    win = img.reshape(1, 1, h // ws, ws, w // ws, ws)
    win = win.transpose(0, 2, 4, 3, 5, 1).reshape(-1, ws, ws, 1)
    win = win.transpose(0, 2, 3, 1).reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class _DenseParams(nn.Module):
    """Parameter holder matching nn.Dense's {kernel, bias} layout so the
    torch checkpoint converter stays unchanged."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
             if self.use_bias else jnp.zeros((self.features,), jnp.float32))
        return k, b


class WindowAttention(nn.Module):
    """W-MSA/SW-MSA over flattened windows (swin_transformer.py:65-161).

    Two execution paths sharing one parameter set:
      * `use_pallas=None` (auto) picks the fused Pallas TPU kernel
        (ops/swin_attention_pallas.py) on TPU — qkv proj, biased softmax and
        output proj in one VMEM-resident kernel;
      * the XLA einsum path everywhere else (and for parity tests).
    """

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: float | None = None
    dtype: Dtype = jnp.float32
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        from ..ops.swin_attention_pallas import (fused_window_attention,
                                                 pallas_available,
                                                 xla_window_attention)

        b_, n, c = x.shape
        nh = self.num_heads

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02 / 0.87962566103423978),
            ((2 * self.window_size - 1) ** 2, nh),
            jnp.float32,
        )
        wqkv, bqkv = _DenseParams(3 * c, use_bias=self.qkv_bias, name="qkv")(c)
        wproj, bproj = _DenseParams(c, name="proj")(c)

        # combined additive term: rel-pos bias (+ shifted-window mask)
        idx = jnp.asarray(relative_position_index(self.window_size).reshape(-1))
        bias = jnp.take(jnp.asarray(table), idx, axis=0)
        bias = bias.reshape(n, n, nh).transpose(2, 0, 1)  # (nh, N, N)
        if mask is not None:
            bias_mask = bias[None] + mask[:, None]  # (nW, nh, N, N)
        else:
            bias_mask = bias[None]  # (1, nh, N, N)
        if self.qk_scale is not None:
            # fold a custom qk scale into q via the kernel's hd**-0.5 default
            ratio = self.qk_scale / ((c // nh) ** -0.5)
            wqkv = wqkv.at[:, :c].multiply(ratio)
            if self.qkv_bias:
                bqkv = bqkv.at[:c].multiply(ratio)

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = pallas_available()
        fn = fused_window_attention if use_pallas else xla_window_attention
        return fn(x, wqkv.astype(self.dtype), bqkv.astype(self.dtype),
                  wproj.astype(self.dtype), bproj.astype(self.dtype),
                  bias_mask.astype(jnp.float32), nh)


class _GNParams(nn.Module):
    """Parameter holder matching GroupNorm32's {scale, bias} layout."""

    @nn.compact
    def __call__(self, c: int):
        return (self.param("scale", nn.initializers.ones, (c,), jnp.float32),
                self.param("bias", nn.initializers.zeros, (c,), jnp.float32))


class _AttnParams(nn.Module):
    """Parameter holder matching WindowAttention's tree (table + qkv/proj),
    so torch checkpoints convert identically whichever compute path runs."""

    window_size: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, c: int):
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02 / 0.87962566103423978),
            ((2 * self.window_size - 1) ** 2, self.num_heads),
            jnp.float32,
        )
        wqkv, bqkv = _DenseParams(3 * c, use_bias=self.qkv_bias, name="qkv")(c)
        wproj, bproj = _DenseParams(c, name="proj")(c)
        return table, wqkv, bqkv, wproj, bproj


class SwinTransformerBlock(nn.Module):
    """One Swin block: (S)W-MSA + channel MLP, GroupNorm32 norms
    (swin_transformer.py:163-281).

    TPU-first execution: the block operates on the ONCE-partitioned token
    list `xt` (B, T, C) (T = nW*N window-major tokens) and compiles to
      gn_fold (one cheap stats pass) -> [static shift gather] ->
      fused norm+attention+residual Pallas kernel -> [inverse gather] ->
      gn_fold -> fused norm+MLP+residual Pallas kernel.
    The reference re-materializes the spatial layout around every block
    (roll -> window_partition -> W-MSA -> window_reverse -> unroll,
    swin_transformer.py:247-276) — all pure data movements, here replaced
    by one static token permutation (:func:`shift_permutation`); GroupNorm
    (per-image stats over the same token set — identical math) and the MLP
    are fused into the kernels (ops/swin_block_pallas.py).  On CPU/tests the
    same math runs through the `*_xla` reference compositions.
    """

    dim: int
    build_resolution: tuple[int, int]  # config-time resolution (decides shift/ws)
    num_heads: int
    window_size: int = 8
    shift: bool = False  # odd blocks shift by ws//2
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    dtype: Dtype = jnp.float32
    use_pallas: bool | None = None
    # profiling ablations (tools/profile_step_census.py): skip the attention
    # or MLP half of the block (residual passes through, stats reused/cheap)
    # so composed-program deltas attribute each half's cost
    attn_identity: bool = False
    mlp_identity: bool = False

    @nn.compact
    def __call__(self, xt: jnp.ndarray, h: int, w: int,
                 stats: tuple[jnp.ndarray, jnp.ndarray] | None = None):
        """xt: (B, T, C) tokens; `stats` = (sum, sumsq) of xt over tokens
        (f32 (B, C)) if already known — the fused kernels emit the next
        norm's statistics as a free epilogue, so a BasicLayer computes them
        explicitly only once, for its first block.  Returns (out, out_stats).
        """
        from ..ops import swin_block_pallas as sbp

        b, t, c = xt.shape
        nh = self.num_heads
        # window size / shift resolved from build-time resolution (swin:191-195)
        ws = self.window_size
        shift_size = ws // 2 if self.shift else 0
        if min(self.build_resolution) <= ws:
            shift_size = 0
            ws = min(self.build_resolution)
        n = ws * ws

        s1, b1 = _GNParams(name="norm1")(c)
        table, wqkv, bqkv, wproj, bproj = _AttnParams(
            window_size=ws, num_heads=nh, qkv_bias=self.qkv_bias, name="attn")(c)
        s2, b2 = _GNParams(name="norm2")(c)
        hidden = int(self.dim * self.mlp_ratio)
        w1, bb1 = _DenseParams(hidden, name="mlp_fc1")(c)
        w2, bb2 = _DenseParams(self.dim, name="mlp_fc2")(hidden)

        # combined additive term: rel-pos bias (+ shifted-window mask)
        idx = jnp.asarray(relative_position_index(ws).reshape(-1))
        bias = jnp.take(table, idx, axis=0).reshape(n, n, nh).transpose(2, 0, 1)
        if shift_size > 0:
            mask = jnp.asarray(shifted_window_mask(h, w, ws, shift_size))
            bias_mask = bias[None] + mask[:, None]  # (nW, nh, N, N)
        else:
            bias_mask = bias[None]
        bias_mask = bias_mask.astype(jnp.float32)

        if self.qk_scale is not None:
            # fold a custom qk scale into q via the kernel's hd**-0.5 default
            ratio = self.qk_scale / ((c // nh) ** -0.5)
            wqkv = wqkv.at[:, :c].multiply(ratio)
            if self.qkv_bias:
                bqkv = bqkv.at[:c].multiply(ratio)

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = sbp.pallas_available()

        dt = self.dtype
        if stats is None:
            stats = sbp.token_stats(xt)
        # token permutations preserve per-image statistics, so the affines
        # computed here are valid in either layout
        wa, ba = sbp.fold_stats(stats, s1, b1, t)
        if (shift_size > 0 and use_pallas
                and not (self.attn_identity or self.mlp_identity)
                and sbp.shift_fuse_fits(w, ws)
                and not os.environ.get("RSTPU_NO_SHIFT_FUSE")):
            # shift absorbed into the kernels' reads: attn emits the shifted
            # layout, the MLP (pointwise over tokens, so the inverse
            # permutation commutes past it) restores the unshifted layout
            y, ys, yq = sbp.shift_attn_residual_stats(
                xt, wa, ba, wqkv.astype(dt), bqkv.astype(dt),
                wproj.astype(dt), bproj.astype(dt), bias_mask,
                nh, n, h, w, ws, shift_size)
            wm, bm = sbp.fold_stats((ys, yq), s2, b2, t)
            return sbp.mlp_unshift_residual_stats(
                y, wm, bm, w1.astype(dt), bb1.astype(dt),
                w2.astype(dt), bb2.astype(dt), h, w, ws, shift_size)
        if self.attn_identity:
            # ablation: residual-only attention half; xt unchanged, so the
            # incoming stats stay valid for the MLP's norm fold
            y, (ys, yq) = xt, stats
        elif shift_size > 0:
            if use_pallas and not os.environ.get("RSTPU_NO_SHIFT_KERNEL"):
                # VMEM block-copy kernel (~10x the XLA row-gather)
                from ..ops.shift_pallas import shift_tokens_pallas

                def shift_fn(x, inverse=False):
                    # positional args: custom_vjp rejects kwargs
                    return shift_tokens_pallas(x, h, w, ws, shift_size, inverse)
            else:
                perm, inv = shift_permutation(h, w, ws, shift_size)

                def shift_fn(x, inverse=False):
                    return jnp.take(x, jnp.asarray(inv if inverse else perm), axis=1)

            xs = shift_fn(xt)
        else:
            xs = xt
        if not self.attn_identity:
            if use_pallas:
                y, ys, yq = sbp.norm_attn_residual_stats(
                    xs, wa, ba, wqkv.astype(dt), bqkv.astype(dt),
                    wproj.astype(dt), bproj.astype(dt), bias_mask,
                    num_heads=nh, n_win=n)
            else:
                y = sbp.norm_attn_residual_xla(
                    xs, wa, ba, wqkv.astype(dt), bqkv.astype(dt),
                    wproj.astype(dt), bproj.astype(dt), bias_mask,
                    num_heads=nh, n_win=n)
                ys, yq = sbp.token_stats(y)
            if shift_size > 0:
                y = shift_fn(y, inverse=True)

        if self.mlp_identity:
            return y, ys, yq
        wm, bm = sbp.fold_stats((ys, yq), s2, b2, t)
        if use_pallas:
            return sbp.norm_mlp_residual_stats(
                y, wm, bm, w1.astype(dt), bb1.astype(dt),
                w2.astype(dt), bb2.astype(dt))
        z = sbp.norm_mlp_residual_xla(y, wm, bm, w1.astype(dt), bb1.astype(dt),
                                      w2.astype(dt), bb2.astype(dt))
        return (z,) + sbp.token_stats(z)


def window_partition_tokens(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, nW*N, C) window-major token list."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, -1, c)


def window_reverse_tokens(xt: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B, nW*N, C) -> (B, H, W, C)."""
    b, _, c = xt.shape
    x = xt.reshape(b, h // ws, w // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


class BasicLayer(nn.Module):
    """Patch-embed -> window partition (once) -> depth Swin blocks in token
    layout -> window reverse -> patch-unembed (swin_transformer.py:348-450;
    patch_size=1 in all shipped configs)."""

    in_chans: int
    embed_dim: int
    num_heads: int
    window_size: int
    depth: int = 2
    build_resolution: int = 64  # config img_size at this UNet level
    patch_size: int = 1
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    patch_norm: bool = False
    dtype: Dtype = jnp.float32
    # tri-state kernel switch: True/False force the Pallas/XLA path and are
    # part of the module (hence of any jit cache key that closes over it);
    # None = decide at trace time via `pallas_available()`
    use_pallas: bool | None = None
    # profiling ablations (tools/profile_step_census.py): `identity` replaces
    # the whole layer (creates no params, so a full param tree still applies
    # — flax ignores unused subtrees); attn/mlp_identity skip just that half
    # of every block, attributing its composed cost
    identity: bool = False
    attn_identity: bool = False
    mlp_identity: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.identity:
            return x
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=p, dtype=self.dtype,
                    name="patch_embed_proj")(x)
        if self.patch_norm:
            x = GroupNorm32(name="patch_embed_norm")(x)
        b, h, w, _ = x.shape
        res = (self.build_resolution // p, self.build_resolution // p)
        # build-time resolution fixes ws (swin:191-195); runtime shape only
        # adapts masks/permutations
        ws = min(res) if min(res) <= self.window_size else self.window_size
        assert h % ws == 0 and w % ws == 0, f"{(h, w)} not divisible by window {ws}"
        xt = window_partition_tokens(x, ws)
        stats = None  # first block computes them; kernels emit them after
        for i in range(self.depth):
            xt, *stats = SwinTransformerBlock(
                dim=self.embed_dim,
                build_resolution=res,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift=(i % 2 == 1),
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                attn_identity=self.attn_identity,
                mlp_identity=self.mlp_identity,
                name=f"block{i}",
            )(xt, h, w, stats)
        x = window_reverse_tokens(xt, ws, h, w)
        x = nn.Conv(self.in_chans, (1, 1), dtype=self.dtype, name="patch_unembed_proj")(x)
        if self.patch_norm:
            x = GroupNorm32(name="patch_unembed_norm")(x)
        return x
