"""Per-phase perf breakdown of the bench workload on the real TPU chip.

Times each phase of the ImageNet-Test protocol workload (64px LQ tiles,
batch 64, 15 steps — reference README.md:135) in isolation:
  encode   = bicubic x4 upsample + VQGAN encode        (256^2 conv stack)
  unet     = 15-step lax.scan over the denoiser        (64^2 latent)
  decode   = VQGAN quantize + decoder                  (64^2 -> 256^2)
  full     = the real end-to-end sampler (pipeline._sample_tile)

For each phase we report wall ms/iter (scan-chained inside one jit, same
methodology as bench.py), XLA's own FLOP count from compiled cost analysis,
and the implied TFLOP/s + MFU vs the v5e bf16 peak (197 TFLOP/s).

Usage:  python tools/profile_phases.py [--reps 3] [--batch 64]
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

from resshift_tpu.pipeline import ResShiftPipeline
from resshift_tpu.diffusion import resshift as rs

V5E_PEAK_BF16 = 197e12  # TFLOP/s


def chain(body, n_iter):
    """Wrap body(key) -> array into an n_iter scan returning a scalar."""

    def fn(params, key):
        def step(carry, k):
            return jnp.mean(body(params, k, carry)).astype(jnp.float32), ()

        out, _ = jax.lax.scan(step, jnp.float32(0), jax.random.split(key, n_iter))
        return out

    return jax.jit(fn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-iter", type=int, default=4)
    ap.add_argument("--phases", default=None,
                    help="comma list: encode,unet_1step,unet_15steps,decode,full")
    args = ap.parse_args()

    TILE, SF, B = 64, 4, args.batch
    pipe = ResShiftPipeline("realsr_v1", dtype=jnp.bfloat16)
    cpus = jax.devices("cpu")
    with jax.default_device(cpus[0]):
        params = pipe.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])

    lat_h, lat_w = pipe._latent_hw(TILE, TILE)
    results = {}

    # ---------------- encode (bicubic up + VQGAN encoder) ----------------
    def enc_body(p, k, carry):
        lq = jax.random.uniform(k, (B, TILE, TILE, 3), jnp.float32, -1, 1) + 1e-6 * carry
        return pipe._encode(p.get("vqgan"), lq, up_sample=True)

    # ---------------- unet: 15 steps over the latent ----------------
    def unet_body(p, k, carry):
        lq = jax.random.uniform(k, (B, TILE, TILE, 3), jnp.float32, -1, 1) + 1e-6 * carry
        z_y = jax.random.normal(k, (B, lat_h, lat_w, 3), jnp.float32)

        def model_fn(x, t, **kw):
            return pipe.unet.apply({"params": p["unet"]}, x, t, **kw)

        return rs.sample_loop(pipe.sched, model_fn, z_y, k,
                              clip_denoised=True, model_kwargs={"lq": lq})

    # ---------------- unet single forward ----------------
    def unet1_body(p, k, carry):
        lq = jax.random.uniform(k, (B, TILE, TILE, 3), jnp.float32, -1, 1) + 1e-6 * carry
        z = jax.random.normal(k, (B, lat_h, lat_w, 3), jnp.float32)
        t = jnp.full((B,), 7, jnp.int32)
        return pipe.unet.apply({"params": p["unet"]}, z, t, lq=lq)

    # ---------------- decode ----------------
    def dec_body(p, k, carry):
        z = jax.random.normal(k, (B, lat_h, lat_w, 3), jnp.float32) + 1e-6 * carry
        return pipe._decode(p.get("vqgan"), z)

    # ---------------- full ----------------
    def full_body(p, k, carry):
        lq = jax.random.uniform(k, (B, TILE, TILE, 3), jnp.float32, -1, 1) + 1e-6 * carry
        return pipe._sample_tile(p, lq, k)

    # ---------------- VQ quantizer alone ----------------
    def quant_body(p, k, carry):
        z = jax.random.normal(k, (B, lat_h, lat_w, 3), jnp.float32) + 1e-6 * carry
        return pipe.vq.apply({"params": p["vqgan"]}, z,
                             method=lambda m, zz: m.quantize(zz))

    # ---------------- decoder without quantization ----------------
    def dec_nq_body(p, k, carry):
        z = jax.random.normal(k, (B, lat_h, lat_w, 3), jnp.float32) + 1e-6 * carry
        return pipe.vq.apply({"params": p["vqgan"]}, z,
                             method=lambda m, zz: m.decode(zz, True))

    phases = [
        ("encode", enc_body),
        ("unet_1step", unet1_body),
        ("unet_15steps", unet_body),
        ("decode", dec_body),
        ("vq_quant", quant_body),
        ("decode_noquant", dec_nq_body),
        ("full", full_body),
    ]

    if args.phases:
        want = set(args.phases.split(","))
        phases = [(n, b) for n, b in phases if n in want]

    key = jax.random.PRNGKey(42)
    mpx = B * (TILE * SF) ** 2 / 1e6
    for name, body in phases:
        fn = chain(body, args.n_iter)
        t0 = time.perf_counter()
        # compile ONCE: reuse the compiled executable for both cost analysis
        # and execution (tunnel compiles are expensive)
        compiled = fn.lower(params, key).compile()
        compile_s = time.perf_counter() - t0
        try:
            an = compiled.cost_analysis()
            if isinstance(an, list):
                an = an[0]
            # cost_analysis counts the scan body once — already per-iteration
            fl = float(an.get("flops", 0.0))
        except Exception as e:
            print(f"  cost_analysis failed: {e}", file=sys.stderr)
            fl = 0.0
        # NOTE: block_until_ready does NOT block through the axon relay —
        # force a host transfer of the scalar result instead (same
        # methodology as bench.py).
        float(compiled(params, key))  # warmup
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(compiled(params, key))
            times.append((time.perf_counter() - t0) / args.n_iter)
        best = min(times)
        tf = fl / best / 1e12 if fl else 0.0
        results[name] = {
            "ms": round(best * 1e3, 2),
            "all_ms": [round(t * 1e3, 2) for t in times],
            "gflops": round(fl / 1e9, 1),
            "tflops_per_s": round(tf, 1),
            "mfu_vs_v5e_bf16": round(tf * 1e12 / V5E_PEAK_BF16, 3),
            "compile_s": round(compile_s, 1),
        }
        print(f"{name:>14}: {results[name]}", flush=True)

    out = {"batch": B, "phases": results}
    if "full" in results:
        out["mpx_per_s"] = round(mpx / (results["full"]["ms"] / 1e3), 3)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
