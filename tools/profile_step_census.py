"""UNet step census by ABLATION — a per-component table that sums to the
measured step time (VERDICT r1 #2: the in-isolation component census left
~22 ms of the 75 ms step unattributed; isolation timings miss the fusion/
relayout costs that only exist in the composed program).

Method: compile the FULL flagship UNet forward (realsr_v1 config, batch 64,
64x64 latent, bf16 — the protocol step) plus ablated variants where a
component family is replaced by an identity/skip-conv of identical shape,
all sharing ONE param tree (flax ignores unused subtrees).  The DELTA
between consecutive variants attributes that family's cost as composed —
interactions included — and the deltas + skeleton sum to the full step by
construction.  Each variant also reports XLA cost-analysis FLOPs, giving a
per-family compute floor at the lane-padding-capped MFU.

Usage: python -u tools/profile_step_census.py [--n-iter 16] [--reps 3]
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
V5E_HBM_BPS = 819e9
B = 64


# --------------------------------------------------------------- ablations

class Ablation:
    """Context that swaps component families for identities at CONSTRUCTION
    time via the modules' own ablation fields (`BasicLayer.identity`,
    `ResBlock.skip_only`) — flax method wrapping stays intact and the full
    param tree still applies (unused subtrees are ignored).

    swin_res: build resolutions whose BasicLayers are skipped ("all" =
    every one).  res_res: UNet level resolutions whose ResBlocks collapse
    to their skip path (level decided from the block's name: in_lN/out_lN/
    mid map to the config's per-level resolution).
    """

    def __init__(self, swin_res=(), res_res=(), level_res=(64, 32, 16, 8),
                 swin_mode="identity"):
        self.swin_res = swin_res
        self.res_res = res_res
        self.level_res = level_res
        # "identity": whole BasicLayer skipped; "attn": only the attention
        # half of each block skipped; "attn_mlp": both halves skipped but
        # the embed/partition/stats glue kept — the variant deltas then
        # split a swin family into attn / mlp / glue
        self.swin_mode = swin_mode

    def _res_of(self, name: str) -> int:
        if name.startswith("mid"):
            return self.level_res[-1]
        lvl = int(name.split("_l")[1].split("_")[0])
        return self.level_res[lvl]

    def __enter__(self):
        from resshift_tpu.models import unet as U

        self._orig_basiclayer = U.BasicLayer
        self._orig_resblock = U.ResBlock
        abl = self

        def basiclayer(*a, **kw):
            ds = kw.get("build_resolution")
            if abl.swin_res == "all" or ds in abl.swin_res:
                if abl.swin_mode == "identity":
                    kw["identity"] = True
                elif abl.swin_mode == "attn":
                    kw["attn_identity"] = True
                else:  # "attn_mlp"
                    kw["attn_identity"] = True
                    kw["mlp_identity"] = True
            return abl._orig_basiclayer(*a, **kw)

        def resblock(*a, **kw):
            res = abl._res_of(kw.get("name", ""))
            if abl.res_res == "all" or res in abl.res_res:
                kw["skip_only"] = True
            return abl._orig_resblock(*a, **kw)

        U.BasicLayer = basiclayer
        U.ResBlock = resblock
        return self

    def __exit__(self, *exc):
        from resshift_tpu.models import unet as U

        U.BasicLayer = self._orig_basiclayer
        U.ResBlock = self._orig_resblock


# --------------------------------------------------------------- timing

def time_variant(pipe, params, name, swin_res=(), res_res=(), n_iter=16,
                 reps=3, swin_mode="identity"):
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 64, 64, 3), jnp.float32)
    lq = jax.random.normal(jax.random.PRNGKey(3), (B, 64, 64, 3), jnp.float32)
    t = jnp.full((B,), 7, jnp.int32)

    with Ablation(swin_res, res_res, swin_mode=swin_mode):

        def fn(p, x, lq, t):
            def step(carry, _):
                out = pipe.unet.apply({"params": p}, x + carry, t, lq=lq)
                return jnp.mean(out.astype(jnp.float32)), ()

            out, _ = jax.lax.scan(step, jnp.float32(0), None, length=n_iter)
            return out

        jf = jax.jit(fn)
        t0 = time.perf_counter()
        compiled = jf.lower(params, x, lq, t).compile()
        compile_s = time.perf_counter() - t0
    try:
        an = compiled.cost_analysis()
        if isinstance(an, list):
            an = an[0]
        fl = float(an.get("flops", 0.0))  # scan body counted once = per step
        by = float(an.get("bytes accessed", 0.0))
    except Exception:
        fl = by = 0.0
    float(compiled(params, x, lq, t))  # warmup (forces through the relay)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(compiled(params, x, lq, t))
        times.append(time.perf_counter() - t0)
    best = min(times) / n_iter
    r = {"name": name, "ms": round(best * 1e3, 2),
         "tflop": round(fl / 1e12, 3), "gb": round(by / 1e9, 2),
         "compile_s": round(compile_s, 1)}
    print(f"{name:>22}: {r['ms']:7.2f} ms  {r['tflop']:6.3f} TF  "
          f"{r['gb']:6.1f} GB  (compile {compile_s:.0f}s)", flush=True)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-iter", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/step_census.json")
    args = ap.parse_args()

    import resshift_tpu.config as C
    from resshift_tpu.pipeline import ResShiftPipeline

    pipe = ResShiftPipeline(C.task_config("realsr_v1"), dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        params = pipe.init_params(jax.random.PRNGKey(0))["unet"]
    params = jax.device_put(params, jax.devices()[0])
    # pre-cast matmul kernels to bf16 once, like the sampler's
    # _compute_params does ahead of the scan
    params = pipe._compute_params(params)

    variants = [
        ("full", (), (), "identity"),
        ("swin64_noattn", (64,), (), "attn"),
        ("swin64_glue_only", (64,), (), "attn_mlp"),
        ("no_swin64", (64,), (), "identity"),
        ("no_swin64_32", (64, 32), (), "identity"),
        ("no_swin", "all", (), "identity"),
        ("no_swin_res64", "all", (64,), "identity"),
        ("no_swin_res64_32", "all", (64, 32), "identity"),
        ("skeleton", "all", "all", "identity"),
    ]
    rows = [time_variant(pipe, params, n, s, r, args.n_iter, args.reps, m)
            for (n, s, r, m) in variants]

    by_name = {r["name"]: r for r in rows}

    def delta(a, b):
        ra, rb = by_name[a], by_name[b]
        return {"ms": round(ra["ms"] - rb["ms"], 2),
                "tflop": round(ra["tflop"] - rb["tflop"], 3),
                "gb": round(ra["gb"] - rb["gb"], 2)}

    # Per-family MXU lane-padding caps (fraction of peak reachable given the
    # checkpoint's channel counts; see PERF.md "Lane-padding roofline"):
    # swin matmuls are 192-wide -> 192/256; level-0 convs 160ch -> 160/256
    # x K-eff(1440->1536); level-1/2 convs 320ch -> 320/384; mid 640 -> ~1.0;
    # skeleton is a mix of small convs/concats -> bandwidth-dominated anyway.
    caps = {
        "swin@64 attn kernels": 0.75, "swin@64 mlp kernels": 0.75,
        "swin@64 glue(embed/part/stats)": 0.70,
        "swin@32": 0.75, "swin@16/8+mid": 0.75,
        "resblocks@64": 0.58, "resblocks@32": 0.83, "resblocks@16/8": 0.90,
        "skeleton(conv_in/up/down/emb/head/concat)": 0.70,
    }
    groups = {
        "swin@64 attn kernels": delta("full", "swin64_noattn"),
        "swin@64 mlp kernels": delta("swin64_noattn", "swin64_glue_only"),
        "swin@64 glue(embed/part/stats)": delta("swin64_glue_only", "no_swin64"),
        "swin@32": delta("no_swin64", "no_swin64_32"),
        "swin@16/8+mid": delta("no_swin64_32", "no_swin"),
        "resblocks@64": delta("no_swin", "no_swin_res64"),
        "resblocks@32": delta("no_swin_res64", "no_swin_res64_32"),
        "resblocks@16/8": delta("no_swin_res64_32", "skeleton"),
        "skeleton(conv_in/up/down/emb/head/concat)": dict(
            ms=by_name["skeleton"]["ms"], tflop=by_name["skeleton"]["tflop"],
            gb=by_name["skeleton"]["gb"]),
    }
    total = cap_total = 0.0
    print("\n===== additive census (sums to full by construction) =====")
    for k, g in groups.items():
        cf = g["tflop"] / (V5E_PEAK_BF16 / 1e12) * 1e3      # ms at peak
        bf = g["gb"] / (V5E_HBM_BPS / 1e9) * 1e3            # ms at peak BW
        capped = max(cf / caps[k], bf)   # lane-padding-capped practical floor
        g["floor_peak_ms"] = round(max(cf, bf), 2)
        g["floor_capped_ms"] = round(capped, 2)
        g["headroom_x"] = round(g["ms"] / capped, 2) if capped > 0 else None
        total += g["ms"]
        cap_total += capped
        print(f"{k:>42}: {g['ms']:7.2f} ms  ({g['tflop']:.2f} TF, {g['gb']:.1f} GB; "
              f"peak floor {max(cf, bf):.1f} ms, capped floor {capped:.1f} ms, "
              f"headroom {g['headroom_x']}x)", flush=True)
    print(f"{'SUM':>42}: {total:7.2f} ms  vs full {by_name['full']['ms']:.2f} ms; "
          f"capped-floor sum {cap_total:.1f} ms", flush=True)
    Path(args.out).write_text(json.dumps({"rows": rows, "groups": groups}, indent=2))
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
