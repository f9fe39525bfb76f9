"""Measure the PP engine against its own claims (VERDICT r4 #4).

SCALING.md states the GPipe efficiency formula `N/(N+S-1)` and the engine
docstring concedes two overheads: (a) every stage runs `max_cnt =
ceil(T/S)` conditional steps per tick, so when T % S != 0 the short
stages idle inside the tick (you pay ceil(T/S)*S, not T); (b) drain
ticks re-ingest + re-encode the last chunk on stage 0 (rides the bubble).
This tool MEASURES all three on the 8-device virtual CPU mesh (relative
numbers; the engine structure — ticks, per-tick work, bubble — is
hardware-independent even if absolute ms are not):

  1. amortization: per-chunk time vs N in {S, 4S, 16S}, compared to the
     GPipe prediction t(N)/t(16S) = ((N+S-1)/N) / ((16S+S-1)/16S);
  2. imbalance: T=15 vs T=16 on S=4 — the tick count model predicts
     EQUAL per-chunk time (both pay ceil(T/S)=4 steps/tick), i.e. the
     15-step chain costs 16/15 of its proportional share;
  3. the residual of (1) over the formula at N=S bounds the re-encode
     overhead (it rides the bubble by construction).

Usage: python tools/profile_pp.py [--reps 3]
Results land in SCALING.md's "PP engine, measured" section.
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

N_DEV = 8
S = 4  # stages


def _force_cpu(n: int = N_DEV) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def _pipe(steps: int):
    import jax.numpy as jnp

    sys.path.insert(0, str(REPO / "tools"))
    from comm_census import _tiny_cfg

    from resshift_tpu.pipeline import ResShiftPipeline

    cfg = _tiny_cfg()
    cfg["diffusion"]["steps"] = steps
    return ResShiftPipeline(cfg, dtype=jnp.float32)


def _time(fn, reps: int) -> float:
    import jax

    jax.block_until_ready(fn())  # warm (compile)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    _force_cpu()

    import jax
    import jax.numpy as jnp

    from resshift_tpu.parallel.pp import make_stage_mesh

    mesh = make_stage_mesh(S)
    key = jax.random.PRNGKey(0)
    report = {"n_stages": S, "device": "cpu-virtual", "rows": []}

    print(f"[pp] S={S} stages on the virtual mesh; times are min of "
          f"{args.reps} (relative numbers)", flush=True)

    # ---- 1. amortization curve, T=16 (balanced: ceil(T/S) == T/S) ----
    pipe = _pipe(16)
    params = pipe.init_params(jax.random.PRNGKey(0))
    for n_chunks in (S, 4 * S, 16 * S):
        lq = jax.random.uniform(jax.random.PRNGKey(1),
                                (n_chunks, 16, 16, 3), jnp.float32, -1., 1.)
        t = _time(lambda: pipe.sample_pipelined(params, lq, key, mesh,
                                                chunk_bs=1), args.reps)
        row = {"T": 16, "N": n_chunks, "total_s": round(t, 3),
               "per_chunk_ms": round(t / n_chunks * 1e3, 1),
               "ticks": n_chunks + S - 1,
               "gpipe_eff": round(n_chunks / (n_chunks + S - 1), 3)}
        report["rows"].append(row)
        print(f"[pp] T=16 N={n_chunks:3d}: {row['per_chunk_ms']} ms/chunk "
              f"(ticks {row['ticks']}, formula eff {row['gpipe_eff']})",
              flush=True)

    rows = report["rows"]
    base = rows[-1]  # N = 16S
    for row in rows:
        pred = ((row["N"] + S - 1) / row["N"]) / \
               ((base["N"] + S - 1) / base["N"])
        row["slowdown_vs_16S"] = round(
            row["per_chunk_ms"] / base["per_chunk_ms"], 3)
        row["gpipe_pred_slowdown"] = round(pred, 3)
        print(f"[pp] N={row['N']:3d}: measured slowdown "
              f"{row['slowdown_vs_16S']}x vs GPipe-predicted {pred:.3f}x",
              flush=True)

    # ---- 2. T % S imbalance: T=15 on S=4 (counts [4,4,4,3]) ----
    pipe15 = _pipe(15)
    params15 = pipe15.init_params(jax.random.PRNGKey(0))
    n_chunks = 4 * S
    lq = jax.random.uniform(jax.random.PRNGKey(1), (n_chunks, 16, 16, 3),
                            jnp.float32, -1., 1.)
    t15 = _time(lambda: pipe15.sample_pipelined(params15, lq, key, mesh,
                                                chunk_bs=1), args.reps)
    t16 = rows[1]["total_s"]
    report["imbalance"] = {
        "t15_per_chunk_ms": round(t15 / n_chunks * 1e3, 1),
        "t16_per_chunk_ms": rows[1]["per_chunk_ms"],
        "ratio_15_over_16": round(t15 / t16, 3),
        "proportional_would_be": round(15 / 16, 3),
    }
    print(f"[pp] imbalance T=15 vs T=16 (N={n_chunks}): ratio "
          f"{report['imbalance']['ratio_15_over_16']} (tick model predicts "
          f"~1.0 — both pay ceil(T/S)=4 steps/tick; proportional would be "
          f"0.938)", flush=True)

    out = Path("/tmp/pp_report.json")
    out.write_text(json.dumps(report, indent=2))
    print(f"[pp] -> {out}", flush=True)


if __name__ == "__main__":
    main()
