"""Decompose the fused window-attention kernel's cost on the real chip.

Times the production `norm_attn_residual` against ablated variants
(identity-softmax, bf16-exp softmax) to attribute the gap between the
kernel and its matmul floor to specific VPU work.  Pure measurement —
the production kernel lives in ops/swin_block_pallas.py.
"""

from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from resshift_tpu.ops import swin_block_pallas as sbp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, HW, C, NH, WS = 64, 64, 192, 6, 8
N = WS * WS
N_ITER = 32
DT = jnp.bfloat16


def attn_kernel_variant(x_ref, w_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                        bproj_ref, bm_ref, o_ref, *, num_heads, n_win, gw,
                        tb, softmax):
    c = x_ref.shape[2]
    nh = num_heads
    hd = c // nh
    scale = hd**-0.5
    ns = gw * n_win
    ng = tb // ns

    x = x_ref[0]
    xn = (x.astype(jnp.float32) * w_ref[0] + b_ref[0]).astype(x.dtype)
    qkv = jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)
    q = qkv[:, :c].reshape(ng, ns, c)
    k = qkv[:, c:2 * c].reshape(ng, ns, c)
    v = qkv[:, 2 * c:].reshape(ng, ns, c)
    outs = []
    for h in range(nh):
        sl = slice(h * hd, (h + 1) * hd)
        s = jax.lax.dot_general(
            q[:, :, sl] * jnp.asarray(scale, q.dtype), k[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s + bm_ref[:, h]
        if softmax == "mxsum":
            # constant shift (production folds it into the bias) + exp;
            # normalizer rides the AV matmul as an appended ones column
            p = jnp.exp(s - 30.0).astype(v.dtype)
            ones = jnp.ones((ng, ns, 1), v.dtype)
            v_aug = jnp.concatenate([v[:, :, sl], ones], axis=-1)
            oa = jax.lax.dot_general(
                p, v_aug,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            outs.append(oa[:, :, :hd] * (1.0 / oa[:, :, hd:]))
            continue
        if softmax == "f32":
            smax = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - smax)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            p = p.astype(v.dtype)
        elif softmax == "bf16exp":
            smax = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp((s - smax).astype(v.dtype))
            p = (p / jnp.sum(p, axis=-1, keepdims=True).astype(v.dtype))
        elif softmax == "noexp":
            smax = jnp.max(s, axis=-1, keepdims=True)
            p = (s - smax)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        else:  # none: raw scores
            p = s.astype(v.dtype)
        outs.append(jax.lax.dot_general(
            p, v[:, :, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    out = jnp.concatenate(outs, axis=-1).astype(x.dtype).reshape(tb, c)
    proj = jnp.dot(out, wproj_ref[:], preferred_element_type=jnp.float32)
    proj = proj + bproj_ref[:].astype(jnp.float32)
    o_ref[0] = (x.astype(jnp.float32) + proj).astype(o_ref.dtype)


def call_variant(x, w, b, wqkv, bqkv, wproj, bproj, bias_mask, softmax):
    bsz, t, c = x.shape
    tb = 1024
    gw = sbp._pick_gw(N, tb // N, bias_mask.shape[0])
    ng = tb // (gw * N)
    bm, bm_spec = sbp._prep_bias(bias_mask, gw, ng)
    grid = (bsz, t // tb)
    return pl.pallas_call(
        functools.partial(attn_kernel_variant, num_heads=NH, n_win=N, gw=gw,
                          tb=tb, softmax=softmax),
        out_shape=jax.ShapeDtypeStruct((bsz, t, c), x.dtype),
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
        out_specs=pl.BlockSpec((1, tb, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
    )(x, w.astype(jnp.float32)[:, None], b.astype(jnp.float32)[:, None],
      wqkv, bqkv, wproj, bproj, bm)


def timeit(name, body, P):
    def fn(p, key):
        def step(carry, k):
            return jnp.mean(body(p, carry).astype(jnp.float32)), ()

        out, _ = jax.lax.scan(step, jnp.float32(0), jax.random.split(key, N_ITER))
        return out

    f = jax.jit(fn)
    key = jax.random.PRNGKey(0)
    c = f.lower(P, key).compile()
    float(c(P, key))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(c(P, key))
        ts.append((time.perf_counter() - t0) / N_ITER)
    print(f"{name:>22}: {min(ts) * 1e3:.3f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(1)
    cpu = jax.devices("cpu")[0]
    T = HW * HW
    with jax.default_device(cpu):
        P = dict(
            x=(jax.random.normal(key, (B, T, C), jnp.float32) * 0.5).astype(DT),
            w=jnp.ones((B, C), jnp.float32),
            b=jnp.zeros((B, C), jnp.float32),
            wqkv=(jax.random.normal(key, (C, 3 * C), jnp.float32) * 0.05).astype(DT),
            bqkv=jnp.zeros((3 * C,), DT),
            wproj=(jax.random.normal(key, (C, C), jnp.float32) * 0.05).astype(DT),
            bproj=jnp.zeros((C,), DT),
            bm=jnp.zeros((1, NH, N, N), jnp.float32),
        )
    P = jax.device_put(P, jax.devices()[0])

    timeit("production", lambda p, c: sbp.norm_attn_residual(
        p["x"] + c.astype(DT), p["w"], p["b"], p["wqkv"], p["bqkv"],
        p["wproj"], p["bproj"], p["bm"], NH, N), P)
    for sm in ("f32", "mxsum", "bf16exp", "noexp", "none"):
        timeit(f"variant[{sm}]", lambda p, c, sm=sm: call_variant(
            p["x"] + c.astype(DT), p["w"], p["b"], p["wqkv"], p["bqkv"],
            p["wproj"], p["bproj"], p["bm"], sm), P)


if __name__ == "__main__":
    main()
