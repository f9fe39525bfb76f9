"""Denoising-scan unroll sweep (VERDICT r2 weak #1(c): the UNet step's
last ~5 ms to its revised 62-63 ms achievable floor).

All previous structural attacks on the gap operated INSIDE one step
(PERF.md negative-results ledger).  This one operates ACROSS steps:
`lax.scan(..., unroll=k)` replicates the step body k times inside the
loop, letting XLA's scheduler overlap the tail of step i (decoder
resblocks, output head) with the head of step i+1 (conv_in, embeddings)
— the data dependency is only through x_t, and the head does not consume
the tail's full activation set, so there is schedulable slack in theory.
Identical math by construction (scan semantics are unchanged).

Times the EXACT bench protocol program (pipeline._sample_tile chained
n_iter times inside one jit, scalar out — bench.py:52-60) at unroll in
{1, 3, 5, 15}, plus the isolated 15-step UNet-only scan so step-level
effects are visible without the encode/decode phases.

Usage: python tools/profile_unroll.py [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"

TILE, BATCH, STEPS, SF = 64, 64, 15, 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--unrolls", type=int, nargs="+", default=[1, 3, 5, 15])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from resshift_tpu.pipeline import ResShiftPipeline
    from resshift_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache("/tmp/resshift_tpu_test_xla_cache")
    pipe = ResShiftPipeline("realsr_v1", dtype=jnp.bfloat16)
    cpus = jax.devices("cpu")
    with jax.default_device(cpus[0]):
        params = pipe.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])
    n_iter = 4
    mpx = BATCH * (TILE * SF) ** 2 / 1e6

    results = {}
    for u in args.unrolls:
        pipe.scan_unroll = u

        @jax.jit
        def chained(p, key):
            def body(carry, k):
                lq = jax.random.uniform(k, (BATCH, TILE, TILE, 3),
                                        jnp.float32, -1.0, 1.0) + 1e-4 * carry
                out = pipe._sample_tile(p, lq, k)
                return jnp.mean(out), ()
            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jax.random.split(key, n_iter))
            return out

        t0 = time.perf_counter()
        float(chained(params, jax.random.PRNGKey(2)))
        compile_s = time.perf_counter() - t0
        times = []
        for r in range(args.reps):
            t0 = time.perf_counter()
            float(chained(params, jax.random.PRNGKey(3 + r)))
            times.append((time.perf_counter() - t0) / n_iter)
        best = min(times)
        results[u] = {"ms_e2e": round(best * 1e3, 1),
                      "mpx_s": round(mpx / best, 3),
                      "compile_s": round(compile_s, 1)}
        print(f"unroll={u:2d}: {results[u]}", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
