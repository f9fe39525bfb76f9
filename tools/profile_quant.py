"""Measure the int8 VQGAN serving mode on the real chip.

Protocol workload (64px LQ tiles, batch 64, realsr_v1 15-step) run twice —
exact bf16 pipeline vs `quant_vqgan='int8'` — with the SAME params and PRNG
keys.  Reports per-phase times (encode / decode / full sampler) and the
PSNR between the two pipelines' outputs (the quantization fidelity band).

Usage: python -u tools/profile_quant.py [--reps 3] [--steps-task realsr_v1]
"""

from __future__ import annotations

import argparse
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

B, TILE = 64, 64


def timed(body, params, n_iter=4, reps=3):
    def fn(p, key):
        def step(carry, k):
            return jnp.mean(body(p, k)).astype(jnp.float32), ()

        out, _ = jax.lax.scan(step, jnp.float32(0), jax.random.split(key, n_iter))
        return out

    compiled = jax.jit(fn).lower(params, jax.random.PRNGKey(7)).compile()
    key = jax.random.PRNGKey(7)
    float(compiled(params, key))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(compiled(params, key))
        ts.append((time.perf_counter() - t0) / n_iter)
    return min(ts) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--task", default="realsr_v1")
    args = ap.parse_args()

    from resshift_tpu.pipeline import ResShiftPipeline

    exact = ResShiftPipeline(args.task, dtype=jnp.bfloat16)
    quant = ResShiftPipeline(args.task, dtype=jnp.bfloat16, quant_vqgan="int8")
    cpus = jax.devices("cpu")
    with jax.default_device(cpus[0]):
        params = exact.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])
    lat_h, lat_w = exact._latent_hw(TILE, TILE)

    results = {}
    for name, pipe in (("bf16", exact), ("int8", quant)):
        def enc(p, k):
            lq = jax.random.uniform(k, (B, TILE, TILE, 3), jnp.float32, -1, 1)
            return pipe._encode(p.get("vqgan"), lq, up_sample=True)

        def dec(p, k):
            z = jax.random.normal(k, (B, lat_h, lat_w, 3), jnp.float32)
            return pipe._decode(p.get("vqgan"), z)

        def full(p, k):
            lq = jax.random.uniform(k, (B, TILE, TILE, 3), jnp.float32, -1, 1)
            return pipe._sample_tile(p, lq, k)

        results[name] = {
            "encode_ms": round(timed(enc, params, reps=args.reps), 1),
            "decode_ms": round(timed(dec, params, reps=args.reps), 1),
            "full_ms": round(timed(full, params, reps=args.reps), 1),
        }
        r = results[name]
        mpx = B * (TILE * exact.sf) ** 2 / 1e6
        r["mpx_per_s"] = round(mpx / (r["full_ms"] / 1e3), 3)
        print(f"{name}: {r}", flush=True)

    # fidelity: same keys/params, small batch, host compare
    lq = jax.random.uniform(jax.random.PRNGKey(1), (8, TILE, TILE, 3),
                            jnp.float32, -1, 1)
    oe = np.asarray(jax.jit(lambda p, x, k: exact._sample_tile(p, x, k))(
        params, lq, jax.random.PRNGKey(2)), np.float32)
    oq = np.asarray(jax.jit(lambda p, x, k: quant._sample_tile(p, x, k))(
        params, lq, jax.random.PRNGKey(2)), np.float32)
    mse = float(np.mean((oe - oq) ** 2))
    psnr = 10 * np.log10(4.0 / mse) if mse > 0 else float("inf")  # range [-1,1]
    print(f"int8-vs-bf16 full-sampler PSNR: {psnr:.2f} dB "
          f"(max|diff| {np.abs(oe - oq).max():.4f})")
    sp = results["bf16"]["full_ms"] / results["int8"]["full_ms"]
    print(f"speedup full sampler: {sp:.3f}x  "
          f"encode {results['bf16']['encode_ms'] / results['int8']['encode_ms']:.2f}x  "
          f"decode {results['bf16']['decode_ms'] / results['int8']['decode_ms']:.2f}x")


if __name__ == "__main__":
    main()
