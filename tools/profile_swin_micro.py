"""Decompose the Swin BasicLayer cost on the real chip: GN-on-tokens, MLP,
layout ops (partition/reverse vs roll vs gather-perm), and the attention
kernel under head-count / super-window variations."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import functools

import jax
import jax.numpy as jnp
import numpy as np

B, HW, C = 64, 64, 192
N_ITER = 32
DT = jnp.bfloat16


def timeit(name, body, params):
    def fn(p, key):
        def step(carry, k):
            return jnp.mean(body(p, carry).astype(jnp.float32)), ()

        out, _ = jax.lax.scan(step, jnp.float32(0), jax.random.split(key, N_ITER))
        return out

    f = jax.jit(fn)
    key = jax.random.PRNGKey(0)
    c = f.lower(params, key).compile()
    float(c(params, key))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(c(params, key))
        ts.append((time.perf_counter() - t0) / N_ITER)
    print(f"{name:>24}: {min(ts) * 1e3:.3f} ms", flush=True)
    return min(ts)


def main():
    from resshift_tpu.models.layers import GroupNorm32
    from resshift_tpu.models.swin import (shift_permutation, window_partition,
                                          window_reverse)
    import resshift_tpu.ops.swin_attention_pallas as swa

    key = jax.random.PRNGKey(1)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x_sp = (jax.random.normal(key, (B, HW, HW, C), jnp.float32) * 0.5).astype(DT)
        x_tok = (jax.random.normal(key, (B, HW * HW, C), jnp.float32) * 0.5).astype(DT)
        x_win = (jax.random.normal(key, (B * 64, 64, C), jnp.float32) * 0.5).astype(DT)
        gn = GroupNorm32()
        gnp = gn.init(key, x_tok)["params"]
        wqkv = (jax.random.normal(key, (C, 3 * C), jnp.float32) * 0.02).astype(DT)
        bqkv = jnp.zeros((3 * C,), DT)
        wproj = (jax.random.normal(key, (C, C), jnp.float32) * 0.02).astype(DT)
        bproj = jnp.zeros((C,), DT)
        bm = jnp.zeros((1, 6, 64, 64), jnp.float32)
        w1 = (jax.random.normal(key, (C, 4 * C), jnp.float32) * 0.02).astype(DT)
        w2 = (jax.random.normal(key, (4 * C, C), jnp.float32) * 0.02).astype(DT)
    dev = jax.devices()[0]
    P = jax.device_put(
        dict(x_sp=x_sp, x_tok=x_tok, x_win=x_win, gnp=gnp, wqkv=wqkv, bqkv=bqkv,
             wproj=wproj, bproj=bproj, bm=bm, w1=w1, w2=w2), dev)

    perm, inv = shift_permutation(HW, HW, 8, 4)
    permj = jnp.asarray(perm)

    timeit("gn_tokens", lambda p, c: gn.apply({"params": p["gnp"]}, p["x_tok"] + c.astype(DT)), P)
    timeit("mlp_fc1_fc2", lambda p, c: ((p["x_tok"] + c.astype(DT)).reshape(-1, C) @ p["w1"] @ p["w2"]), P)
    timeit("take_perm", lambda p, c: jnp.take(p["x_tok"] + c.astype(DT), permj, axis=1), P)

    from resshift_tpu.ops.shift_pallas import shift_tokens_pallas

    timeit("shift_kernel", lambda p, c: shift_tokens_pallas(
        p["x_tok"] + c.astype(DT), HW, HW, 8, 4, False), P)
    timeit("roll_hw", lambda p, c: jnp.roll(p["x_sp"] + c.astype(DT), (-4, -4), (1, 2)), P)
    timeit("partition", lambda p, c: window_partition(p["x_sp"] + c.astype(DT), 8), P)
    timeit("part_rev", lambda p, c: window_reverse(
        window_partition(p["x_sp"] + c.astype(DT), 8), 8, HW, HW), P)

    for gw_env, nh in ((1, 6), (2, 6), (2, 1)):
        os.environ["RSTPU_ATTN_GW"] = str(gw_env)

        def attn(p, c, nh=nh):
            return swa.fused_window_attention(
                p["x_win"] + c.astype(DT), p["wqkv"], p["bqkv"], p["wproj"],
                p["bproj"], p["bm"][:, :nh], nh)

        timeit(f"attn gw={gw_env} nh={nh}", attn, P)
    os.environ.pop("RSTPU_ATTN_GW", None)

    # qkv+proj only (no attention): the matmul floor of the kernel
    def qkv_proj(p, c):
        x = (p["x_win"] + c.astype(DT)).reshape(-1, C)
        qkv = x @ p["wqkv"]
        return qkv[:, :C] @ p["wproj"]

    timeit("qkv_proj_floor", qkv_proj, P)


if __name__ == "__main__":
    main()
