"""Flagship-composition training segment on chip (VERDICT r2 #5).

TRAIN.md's learnability proofs use pre-built pairs; the flagship recipe
instead runs HQ loader -> per-sample random blur kernels (host numpy) ->
DEVICE degradation pipeline (two-stage blur/resize/noise/DiffJPEG + sinc)
-> training-pair queue -> jitted train step
(/root/reference/trainer.py:526-704 + realesrgan_dataset.py:174-227).
This tool runs that exact composition through the production `Trainer`
pieces at reference scale (119M UNetSwin, frozen f4 VQGAN, GT 256 /
LQ 64, batch = the reference's microbatch 8) for a few hundred steps on
the real chip, and reports:

  * ms/step for the COMPOSED pipeline (degradation + train step),
  * input-pipe stall % (host wait for loader + kernel synthesis),
  * NaN events (must be 0),
  * the pair-queue swap behavior (active after warm-up).

Exit code is nonzero if NaNs appear or the composed step regresses past
--max-ms-per-step (default 110: the bare train step measures ~80 ms,
PERF.md; the degradation adds device work that partially overlaps host
prep).

Usage: python tools/train_flagship_segment.py --iters 300
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

GT_DIR = "/root/reference/testdata/Bicubicx4/gt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--max-ms-per-step", type=float, default=110.0)
    ap.add_argument("--num-workers", type=int, default=4)
    ap.add_argument("--out", default="/tmp/flagship_segment")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from resshift_tpu.config import task_config
    from resshift_tpu.train_loop import Trainer, iteration_key
    from resshift_tpu.utils.compile_cache import enable_compile_cache

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    enable_compile_cache(str(out / "xla_cache"))
    print(f"[seg] device: {jax.devices()}", flush=True)

    # the real flagship config, pointed at the bundled HQ images; batch =
    # the reference's per-GPU microbatch (yaml train.microbatch: 8) so the
    # step matches PERF.md's 80 ms row
    cfg = task_config("realsr_v1")
    cfg["data"]["train"]["params"]["dir_paths"] = [GT_DIR]
    cfg["data"]["train"]["params"]["im_exts"] = ["png"]
    cfg["data"].pop("val", None)
    cfg["train"].update(batch=args.batch, microbatch=None,
                        iterations=args.iters, save_freq=10 ** 9,
                        log_freq=[50, 10 ** 9], val_freq=10 ** 9,
                        num_workers=args.num_workers)
    cfg["model"].pop("ckpt_path", None)
    cfg["autoencoder"].pop("ckpt_path", None)  # random frozen AE: same FLOPs

    tr = Trainer(cfg, save_dir=str(out / "run"), seed=0, dtype=jnp.bfloat16)
    assert tr.degrader is not None, "realesrgan degradation pipeline inactive"

    data_iter = tr.loader.infinite()
    t_host = t_step = 0.0
    n_nan = 0
    per_step = []
    losses = []
    t_wall0 = time.time()
    for it in range(args.iters):
        t0 = time.perf_counter()
        raw = next(data_iter)
        key = iteration_key(0, it, 0)
        batch = tr.prepare_batch(raw, jax.random.fold_in(key, 1))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        t1 = time.perf_counter()
        with tr.mesh:
            tr.state, metrics = tr._compiled_step(batch)(
                tr.state, tr.vq_params, batch, jax.random.fold_in(key, 2))
        loss = float(metrics["loss"])  # forces completion through the relay
        t2 = time.perf_counter()
        if it >= args.warmup:
            t_host += t1 - t0
            t_step += t2 - t1
            per_step.append((t2 - t0) * 1e3)
            losses.append(loss)
            if not np.isfinite(loss):
                n_nan += 1
        if (it + 1) % 50 == 0:
            print(f"[seg {it + 1}/{args.iters}] loss={loss:.4f} "
                  f"host={(t1 - t0) * 1e3:.0f}ms step={(t2 - t1) * 1e3:.0f}ms",
                  flush=True)
    wall = time.time() - t_wall0

    n = len(per_step)
    ms = float(np.median(per_step))
    stall_pct = 100.0 * t_host / (t_host + t_step)
    queue_active = tr.degrader._queue is not None
    report = {
        "iters": args.iters, "batch": args.batch, "wall_s": wall,
        "ms_per_step_median": round(ms, 1),
        "ms_per_step_p90": round(float(np.percentile(per_step, 90)), 1),
        "img_per_s": round(args.batch / (ms / 1e3), 1),
        "input_stall_pct": round(stall_pct, 1),
        "nan_events": n_nan,
        "pair_queue_active": queue_active,
        "loss_first10_mean": float(np.mean(losses[:10])),
        "loss_last10_mean": float(np.mean(losses[-10:])),
    }
    (out / "report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2), flush=True)

    ok = n_nan == 0 and queue_active and ms <= args.max_ms_per_step
    print(f"[seg] {'PASS' if ok else 'FAIL'}: {ms:.1f} ms/step composed "
          f"(budget {args.max_ms_per_step}), stall {stall_pct:.1f}%, "
          f"{n_nan} NaNs over {n} measured steps", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
