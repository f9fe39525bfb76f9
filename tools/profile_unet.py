"""Micro-profile of UNetModelSwin components on the real chip.

The full UNet forward runs at ~7.5% MFU (tools/profile_phases.py) while
encode/decode hit ~19% — this script times each sub-block family in
isolation to find the sink: ResBlocks, Swin BasicLayers (Pallas vs XLA
window attention), GroupNorm, and the raw attention kernel.

Usage: python -u tools/profile_unet.py --phases swin64,res64,...
"""

from __future__ import annotations

import argparse
import json
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

V5E_PEAK_BF16 = 197e12
B = 64  # tiles


def chain(body, n_iter):
    def fn(params, key):
        def step(carry, k):
            return jnp.mean(body(params, k, carry).astype(jnp.float32)), ()

        out, _ = jax.lax.scan(step, jnp.float32(0), jax.random.split(key, n_iter))
        return out

    return jax.jit(fn)


def run_phase(name, make, n_iter, reps):
    """make() -> (init_fn, body); body(params, key, carry) -> array."""
    init_fn, body = make()
    cpus = jax.devices("cpu")
    with jax.default_device(cpus[0]):
        params = init_fn(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])
    key = jax.random.PRNGKey(1)
    fn = chain(body, n_iter)
    t0 = time.perf_counter()
    compiled = fn.lower(params, key).compile()
    compile_s = time.perf_counter() - t0
    try:
        an = compiled.cost_analysis()
        if isinstance(an, list):
            an = an[0]
        # NOTE: XLA cost_analysis counts a lax.scan body ONCE (verified:
        # 4096^3 matmul in an 8-iter scan reports exactly 2*4096^3) — so
        # the reported flops already ARE per-iteration.
        fl = float(an.get("flops", 0.0))
    except Exception:
        fl = 0.0
    float(compiled(params, key))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(compiled(params, key))
        times.append((time.perf_counter() - t0) / n_iter)
    best = min(times)
    tf = fl / best / 1e12 if fl else 0.0
    r = {"ms": round(best * 1e3, 3), "gflops": round(fl / 1e9, 1),
         "tflops_per_s": round(tf, 1),
         "mfu": round(tf * 1e12 / V5E_PEAK_BF16, 3),
         "compile_s": round(compile_s, 1)}
    print(f"{name:>16}: {r}", flush=True)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n-iter", type=int, default=8)
    ap.add_argument("--phases", default=None)
    args = ap.parse_args()

    from resshift_tpu.models.layers import GroupNorm32, ResBlock
    from resshift_tpu.models.swin import BasicLayer, WindowAttention

    DT = jnp.bfloat16

    def mk_res(hw, ch, out_ch=None):
        def make():
            mod = ResBlock(channels=ch, emb_channels=640, out_channels=out_ch,
                           use_scale_shift_norm=True, dtype=DT)

            def init(k):
                x0 = jax.random.normal(k, (B, hw, hw, ch), jnp.float32).astype(DT)
                e0 = jax.random.normal(k, (B, 640), jnp.float32).astype(DT)
                return {"p": mod.init(k, x0, e0)["params"], "x": x0, "e": e0}

            def body(p, k, carry):
                # perturb the fixed input with the carry so the scan can't be CSE'd
                x = p["x"] + carry.astype(DT)
                return mod.apply({"params": p["p"]}, x, p["e"])

            return init, body

        return make

    def mk_swin(hw, ch, use_pallas=None):
        def make():
            mod = BasicLayer(in_chans=ch, embed_dim=192, num_heads=6,
                             window_size=8, depth=2, build_resolution=hw,
                             dtype=DT)
            def init(k):
                x0 = jax.random.normal(k, (B, hw, hw, ch), jnp.float32).astype(DT)
                return {"p": mod.init(k, x0)["params"], "x": x0}

            def body(pp, k, carry):
                p = pp["p"]
                x = pp["x"] + carry.astype(DT)
                if use_pallas is not None:
                    import resshift_tpu.ops.swin_attention_pallas as sap

                    orig = sap.pallas_available
                    sap.pallas_available = lambda: use_pallas
                    try:
                        return mod.apply({"params": p}, x)
                    finally:
                        sap.pallas_available = orig
                return mod.apply({"params": p}, x)

            return init, body

        return make

    def mk_attn(n_win, c, use_pallas):
        def make():
            from resshift_tpu.ops.swin_attention_pallas import (
                fused_window_attention, xla_window_attention)

            def init(k):
                k1, k2 = jax.random.split(k)
                return {
                    "wqkv": (jax.random.normal(k1, (c, 3 * c), jnp.float32) * 0.02).astype(DT),
                    "bqkv": jnp.zeros((3 * c,), DT),
                    "wproj": (jax.random.normal(k2, (c, c), jnp.float32) * 0.02).astype(DT),
                    "bproj": jnp.zeros((c,), DT),
                    "bm": jnp.zeros((1, 6, 64, 64), jnp.float32),
                    "x": (jax.random.normal(jax.random.fold_in(k1, 9),
                                            (n_win, 64, c), jnp.float32) * 0.5).astype(DT),
                }

            fn = fused_window_attention if use_pallas else xla_window_attention

            def body(p, k, carry):
                x = p["x"] + carry.astype(DT)
                return fn(x, p["wqkv"], p["bqkv"], p["wproj"], p["bproj"],
                          p["bm"], 6)

            return init, body

        return make

    def mk_gn(hw, ch):
        def make():
            mod = GroupNorm32()

            def init(k):
                x0 = jax.random.normal(k, (B, hw, hw, ch), jnp.float32).astype(DT)
                return {"p": mod.init(k, x0)["params"], "x": x0}

            def body(pp, k, carry):
                return mod.apply({"params": pp["p"]}, pp["x"] + carry.astype(DT))

            return init, body

        return make

    def mk_matmul(m, k, n, out_dt=jnp.float32):
        def make():
            def init(kk):
                k1, k2 = jax.random.split(kk)
                return {"a": (jax.random.normal(k1, (m, k), jnp.float32) * 0.05).astype(DT),
                        "b": (jax.random.normal(k2, (k, n), jnp.float32) * 0.05).astype(DT)}

            def body(p, kk, carry):
                return jnp.dot(p["a"] + carry.astype(DT), p["b"],
                               preferred_element_type=out_dt)

            return init, body

        return make

    def mk_conv(hw, cin, cout, out_dt=jnp.float32):
        def make():
            def init(kk):
                k1, k2 = jax.random.split(kk)
                return {"x": (jax.random.normal(k1, (B, hw, hw, cin), jnp.float32) * 0.1).astype(DT),
                        "w": (jax.random.normal(k2, (3, 3, cin, cout), jnp.float32) * 0.02).astype(DT)}

            def body(p, kk, carry):
                return jax.lax.conv_general_dilated(
                    p["x"] + carry.astype(DT), p["w"], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=out_dt)

            return init, body

        return make

    def mk_gn_reshape(hw, ch, g=32):
        def make():
            def init(kk):
                return {"x": (jax.random.normal(kk, (B, hw, hw, ch), jnp.float32)).astype(DT),
                        "s": jnp.ones((ch,), jnp.float32),
                        "b": jnp.zeros((ch,), jnp.float32)}

            def body(p, kk, carry):
                x = (p["x"] + carry.astype(DT)).astype(jnp.float32)
                xg = x.reshape(B, hw * hw, g, ch // g)
                mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
                var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
                out = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
                out = out.reshape(B, hw, hw, ch) * p["s"] + p["b"]
                return out.astype(DT)

            return init, body

        return make

    phases = {
        "res64": mk_res(64, 160),
        "matmul_sq": mk_matmul(4096, 4096, 4096),
        "matmul_sq_bf16": mk_matmul(4096, 4096, 4096, jnp.bfloat16),
        "matmul_conv_eq": mk_matmul(262144, 1440, 160),
        "matmul_conv_bf16": mk_matmul(262144, 1440, 160, jnp.bfloat16),
        "matmul_mlp_eq": mk_matmul(262144, 192, 768),
        "matmul_mlp_bf16": mk_matmul(262144, 192, 768, jnp.bfloat16),
        "conv64_raw": mk_conv(64, 160, 160),
        "conv64_bf16": mk_conv(64, 160, 160, jnp.bfloat16),
        "gn64_reshape": mk_gn_reshape(64, 160),
        "res32": mk_res(32, 320),
        "res16": mk_res(16, 320),
        "res8": mk_res(8, 640),
        "swin64": mk_swin(64, 160),
        "swin32": mk_swin(32, 320),
        "swin8": mk_swin(8, 640),
        "swin64_xla": mk_swin(64, 160, use_pallas=False),
        "attn_pallas": mk_attn(B * 64, 192, True),
        "attn_xla": mk_attn(B * 64, 192, False),
        "gn64": mk_gn(64, 160),
        "gn32": mk_gn(32, 320),
    }
    sel = args.phases.split(",") if args.phases else list(phases)
    results = {}
    for name in sel:
        results[name] = run_phase(name, phases[name], args.n_iter, args.reps)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
