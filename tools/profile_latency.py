"""Batch-1 end-to-end latency (VERDICT r2 #7).

Measures the single-image serving latency — the number tensor parallelism
exists to improve and the input to any serving SLA — for the standard
input sizes (64, the ImageNet protocol tile; 256, a chop-256 input; 512,
the RealSet protocol size which chops to 256-tiles by default), on the
flagship realsr_v1 (15-step) and journal realsr_v3 (4-step) configs.

Methodology (PERF.md): through the axon relay, `block_until_ready` does
not block, so timings force a scalar host transfer; the ~25 ms fixed
relay overhead per program execution is REPORTED SEPARATELY (`overhead_ms`
estimate) rather than subtracted — a real serving host pays program-launch
overhead too, just a smaller one.

Usage: python tools/profile_latency.py [--task realsr_v1] [--repeats 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def measure(pipe, params, hw: int, repeats: int, key, chop=None, tile_bs=1):
    import jax
    import jax.numpy as jnp

    lq = jnp.asarray(
        np.random.default_rng(0).random((1, hw, hw, 3), np.float64)
        .astype(np.float32) * 2 - 1)
    kw = {}
    if chop is not None:
        kw = dict(chop_size=chop[0], chop_stride=chop[1], tile_bs=tile_bs)

    def run(k):
        out = pipe.sample(params, lq, k, **kw)
        # force completion through the relay (PERF.md methodology #2)
        return float(jnp.mean(out))

    t0 = time.perf_counter()
    run(key)
    compile_s = time.perf_counter() - t0
    ts = []
    for i in range(repeats):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.perf_counter()
        run(k)
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    return {
        "input": f"{hw}x{hw}",
        "compile_s": round(compile_s, 2),
        "p50_ms": round(ts[len(ts) // 2] * 1e3, 1),
        "min_ms": round(ts[0] * 1e3, 1),
        "p90_ms": round(ts[min(len(ts) - 1, int(0.9 * len(ts)))] * 1e3, 1),
        "mpx_per_s": round(hw * hw * pipe.sf ** 2 / ts[len(ts) // 2] / 1e6, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", default="realsr_v1,realsr_v3")
    ap.add_argument("--sizes", default="64,256,512")
    ap.add_argument("--repeats", type=int, default=10)
    ap.add_argument("--no-chop", action="store_true",
                    help="skip the chopped variants at 512")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from resshift_tpu.pipeline import ResShiftPipeline
    from resshift_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    print(f"[latency] device: {jax.devices()}", flush=True)
    report = {"device": str(jax.devices()[0]), "note": (
        "single image (batch 1), full sampler incl. encode/decode; relay "
        "adds ~25 ms fixed overhead per execution (PERF.md) which a "
        "production host would not pay")}
    key = jax.random.PRNGKey(0)
    for task in args.tasks.split(","):
        pipe = ResShiftPipeline(task, dtype=jnp.bfloat16)
        with jax.default_device(jax.devices("cpu")[0]):
            params = pipe.init_params(jax.random.PRNGKey(0))
        # arrays created under default_device(cpu) are COMMITTED to cpu and
        # would pin the jit to the CPU backend — move them to the chip
        params = jax.device_put(params, jax.devices()[0])
        rows = []
        for hw in (int(s) for s in args.sizes.split(",")):
            # unchopped (reference default: chop_size 512 means <=512 runs
            # whole) plus, for the RealSet-class 512 input, the chopped
            # operating points a serving host can choose instead
            variants = [(None, 1, "")]
            if hw == 512 and not args.no_chop:
                # chop-256 tile_bs capped at 4: 9 tiles of 256 at once is
                # 9x a 256^2-latent activation set = 18 GB > the 16 GB HBM
                variants += [((256, 224), 4, " chop256/224 bs4"),
                             ((64, 48), 64, " chop64/48 bs64")]
            for chop, tile_bs, tag in variants:
                r = measure(pipe, params, hw, args.repeats, key,
                            chop=chop, tile_bs=tile_bs)
                r["variant"] = tag.strip() or "unchopped"
                rows.append(r)
                print(f"[latency] {task} {r['input']}{tag}: p50 {r['p50_ms']} ms "
                      f"(min {r['min_ms']}, p90 {r['p90_ms']}; "
                      f"{r['mpx_per_s']} Mpx/s at bs 1; "
                      f"compile {r['compile_s']}s)", flush=True)
        report[task] = rows
    out = Path("/tmp/latency_report.json")
    out.write_text(json.dumps(report, indent=2))
    print(f"[latency] -> {out}", flush=True)


if __name__ == "__main__":
    main()
