"""Real multi-process runtime proof (VERDICT r2 #2 / next #3).

The reference exercises its NCCL bootstrap every time someone runs
`torchrun main.py` (/root/reference/trainer.py:49-64, README.md:101); the
TPU framework's equivalent — `maybe_init_distributed` + process-sharded
DataLoader + rank-0-gated logging + collective orbax checkpointing — had
only ever run with process_count()==1.  This tool launches N REAL
processes on this host (CPU backend, 2 virtual devices per process, a
localhost coordinator), trains a small pixel-space model for a few steps
through the production `Trainer`, and verifies:

  * `maybe_init_distributed()` brings up the runtime from the generic env
    protocol (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID);
  * the jitted SPMD train step runs over the multi-process mesh (gradient
    all-reduce crosses process boundaries);
  * every process ends with BIT-IDENTICAL params/EMA (the DP invariant —
    the reference asserts nothing; DDP would silently diverge);
  * the DataLoader shards by process (ranks see different batches);
  * rank-0 gating: exactly one process writes train_log.jsonl;
  * the orbax checkpoint save is collective and completes.

Usage:
  python tools/multiprocess_proof.py --out /tmp/mp_proof --nproc 2 --iters 6
  python tools/multiprocess_proof.py --worker --rank 0 --nproc 2 ...  (internal)
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GT_DIR = "/root/reference/testdata/Bicubicx4/gt"
CROP = 32


# --------------------------------------------------------------- worker side


def worker_main(args):
    # CPU platform with 2 virtual devices per process; must be configured
    # before any backend use (conftest.py pattern: the image's sitecustomize
    # pre-registers the TPU plugin, so jax.config is the reliable override)
    # ALWAYS pin the per-process device count, replacing any inherited
    # setting: a caller exporting --xla_force_host_platform_device_count=8
    # (the repo's standard mesh-test env) would otherwise give each worker
    # 8 devices and a nproc*8 global mesh the proof's batch can't shard.
    import re

    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from resshift_tpu.parallel.mesh import maybe_init_distributed

    assert maybe_init_distributed(), "bootstrap did not initialize"
    rank, nproc = jax.process_index(), jax.process_count()
    assert nproc == args.nproc, f"process_count {nproc} != {args.nproc}"
    print(f"[worker {rank}] up: {nproc} processes x "
          f"{jax.local_device_count()} devices = {jax.device_count()} global",
          flush=True)

    import jax.numpy as jnp
    import numpy as np

    from resshift_tpu.data.datasets import DataLoader, create_dataset
    from resshift_tpu.train_loop import Trainer

    out = Path(args.out)
    data = out / "data"
    cfg = dict(
        task="mp_proof", sf=1,
        model=dict(
            image_size=CROP, in_channels=3, model_channels=32, out_channels=3,
            attention_resolutions=[16], dropout=0.0, channel_mult=[1, 2],
            num_res_blocks=[1, 1], conv_resample=True, num_head_channels=32,
            use_scale_shift_norm=True, resblock_updown=False, swin_depth=1,
            swin_embed_dim=32, window_size=8, mlp_ratio=2, cond_lq=True,
            cond_mask=False, lq_size=CROP,
        ),
        diffusion=dict(schedule_name="exponential", steps=4, min_noise_level=0.2,
                       etas_end=0.99, kappa=1.0, power=0.3, predict_type="xstart",
                       timestep_respacing=None, normalize_input=True,
                       latent_flag=False, scale_factor=1.0, sf=1),
        autoencoder=None,
        inference=dict(chop_size=CROP, chop_stride=CROP, padding_offset=CROP),
        train=dict(lr=1e-4, lr_min=1e-5, lr_schedule="cosin",
                   warmup_iterations=2, iterations=args.iters,
                   batch=args.batch, microbatch=None, ema_rate=0.999,
                   weight_decay=0.0, save_freq=args.iters,
                   log_freq=[2, 10 ** 9], val_freq=10 ** 9),
        data=dict(train=dict(type="base", params=dict(
            dir_path=str(data / "lq"), extra_dir_path=str(data / "gt")))),
    )

    # loader sharding probe: first batch of this rank's stream
    ds = create_dataset(cfg["data"]["train"])
    probe = DataLoader(ds, batch_size=args.batch, shuffle=True, seed=0,
                       shard_id=rank, num_shards=nproc)
    first = next(probe.infinite())
    batch_hash = hashlib.sha256(
        b"".join(np.ascontiguousarray(first[k]).tobytes()
                 for k in sorted(first) if not isinstance(first[k], list))
    ).hexdigest()

    tr = Trainer(cfg, save_dir=str(out / "run"), seed=0, dtype=jnp.float32)
    state = tr.train()

    def digest(tree):
        h = hashlib.sha256()
        for leaf in jax.tree_util.tree_leaves(tree):
            h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
        return h.hexdigest()

    result = {
        "rank": rank, "nproc": nproc,
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "params_digest": digest(state.params),
        "ema_digest": digest(state.ema_params),
        "opt_digest": digest(state.opt_state),
        "first_batch_hash": batch_hash,
        "step": int(np.asarray(state.step)),
    }
    (out / f"digest_rank{rank}.json").write_text(json.dumps(result, indent=2))
    print(f"[worker {rank}] done: params {result['params_digest'][:12]}...",
          flush=True)


# -------------------------------------------------------------- launcher side


def build_dataset(data: Path):
    import cv2
    import numpy as np

    from resshift_tpu.ops.resize import imresize_matlab
    from resshift_tpu.utils.image_io import imread

    (data / "lq").mkdir(parents=True, exist_ok=True)
    (data / "gt").mkdir(parents=True, exist_ok=True)
    n = 0
    for p in sorted(Path(GT_DIR).glob("*.png"))[:8]:
        im = imread(p)
        for yy in (0, 128):
            for xx in (0, 128):
                g = im[yy:yy + CROP, xx:xx + CROP]
                lq = np.clip(imresize_matlab(imresize_matlab(g, 0.5), 2.0), 0, 1)
                for d, a in (("gt", g), ("lq", lq)):
                    cv2.imwrite(str(data / d / f"{p.stem}_{yy}_{xx}.png"),
                                cv2.cvtColor((a * 255).round().astype(np.uint8),
                                             cv2.COLOR_RGB2BGR))
                n += 1
    return n


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch(args):
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for old in out.glob("digest_rank*.json"):
        old.unlink()
    if not (out / "data" / "lq").exists():
        n = build_dataset(out / "data")
        print(f"[launch] dataset: {n} pairs", flush=True)

    port = free_port()
    procs = []
    t0 = time.time()
    for rank in range(args.nproc):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES=str(args.nproc),
            JAX_PROCESS_ID=str(rank),
        )
        cmd = [sys.executable, __file__, "--worker", "--out", str(out),
               "--nproc", str(args.nproc), "--iters", str(args.iters),
               "--batch", str(args.batch),
               "--local-devices", str(args.local_devices)]
        log = open(out / f"worker_{rank}.log", "w")
        procs.append((rank, subprocess.Popen(cmd, env=env, stdout=log,
                                             stderr=subprocess.STDOUT), log))
    codes = {}
    for rank, p, log in procs:
        codes[rank] = p.wait(timeout=args.timeout)
        log.close()
    wall = time.time() - t0

    report = {"nproc": args.nproc, "iters": args.iters, "wall_s": wall,
              "exit_codes": codes}
    ok = all(c == 0 for c in codes.values())
    if ok:
        digests = [json.loads((out / f"digest_rank{r}.json").read_text())
                   for r in range(args.nproc)]
        report["digests"] = digests
        report["params_identical"] = len({d["params_digest"] for d in digests}) == 1
        report["ema_identical"] = len({d["ema_digest"] for d in digests}) == 1
        report["opt_identical"] = len({d["opt_digest"] for d in digests}) == 1
        report["loader_sharded"] = (
            len({d["first_batch_hash"] for d in digests}) == args.nproc)
        report["global_devices"] = digests[0]["global_devices"]
        # rank-0 gating: exactly one train_log.jsonl, and a checkpoint exists
        report["rank0_log_only"] = (out / "run" / "train_log.jsonl").exists()
        ckpts = list((out / "run" / "ckpts").glob("step_*"))
        report["checkpoint_written"] = len(ckpts) >= 1
        ok = all(report[k] for k in
                 ("params_identical", "ema_identical", "opt_identical",
                  "loader_sharded", "rank0_log_only", "checkpoint_written"))
    report["ok"] = ok
    (out / "report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps({k: v for k, v in report.items() if k != "digests"},
                     indent=2), flush=True)
    if not ok:
        for rank, _, _ in procs:
            print(f"----- worker {rank} log tail -----")
            print("\n".join((out / f"worker_{rank}.log")
                            .read_text().splitlines()[-15:]))
        sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--rank", type=int, default=0)  # informational
    ap.add_argument("--out", default="/tmp/mp_proof")
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--timeout", type=float, default=1800)
    args = ap.parse_args()
    if args.worker:
        worker_main(args)
    else:
        launch(args)


if __name__ == "__main__":
    main()
