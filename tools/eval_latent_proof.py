"""Protocol-drive the self-trained latent stack (VERDICT r4 #6).

Takes the artifacts of the round-3 recipe — `tools/vqgan_pretrain.py`
(frozen f4-style first stage) + `tools/train_proof_latent.py` (latent
UNetSwin) — and runs the REAL eval surface on the real chip:

  1. assembles a {"unet": EMA params, "vqgan": AE params} inference
     checkpoint from the train run's last orbax state;
  2. writes the proof config as a YAML the CLI can load;
  3. execs `python -m resshift_tpu.cli eval --protocol imagenet
     --config <yaml> --ckpt <combined> --in-path ... --gt-path ...`
     (chop 64 / stride 64 / bs 64 — README.md:135's reproduce command)
     over `testdata/Bicubicx4/lq_matlab`, producing metrics.json.

The metrics are meaningful relative to the bicubic baseline (also
computed here) — NOT to the released checkpoints (no egress; the model
is the proof-scale self-trained one).  Results land in TRAIN.md.

Usage:
  python tools/eval_latent_proof.py --ae /root/repo/runs/vq_pretrain \
      --run /root/repo/runs/latent_proof --out /tmp/eval_latent_proof
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

LQ_DIR = "/root/reference/testdata/Bicubicx4/lq_matlab"
GT_DIR = "/root/reference/testdata/Bicubicx4/gt"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ae", required=True)
    ap.add_argument("--run", required=True,
                    help="train_proof_latent output dir (has ckpts/)")
    ap.add_argument("--out", default="/tmp/eval_latent_proof")
    ap.add_argument("--use-ema", action="store_true", default=True)
    ap.add_argument("--no-ema", dest="use_ema", action="store_false")
    args = ap.parse_args()

    import yaml

    from resshift_tpu.checkpoint import load_params, save_params
    from train_proof_latent import proof_config

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    run, ae = Path(args.run), Path(args.ae)

    # ---- 1. combined inference checkpoint (EMA = the reference's eval
    # weights, trainer.py:358-377) ----
    steps = sorted((run / "ckpts").glob("step_*")) or \
        sorted((run / "run_a" / "ckpts").glob("step_*"))
    assert steps, f"no checkpoints under {run}(/run_a)/ckpts"
    state = load_params(steps[-1])
    unet = state["ema_params" if args.use_ema else "params"]
    vq = load_params(ae / "ae_ckpt")["vqgan"]
    combined = out / "infer_ckpt"
    save_params(combined, {"unet": unet, "vqgan": vq})
    print(f"[eval] combined ckpt from {steps[-1].name} -> {combined}",
          flush=True)

    # ---- 2. config YAML ----
    cfg, scale_factor = proof_config(run / "data", ae, iters=1)
    cfg.pop("train", None)
    cfg.pop("data", None)
    cfg["autoencoder"].pop("ckpt_path", None)  # weights come via --ckpt
    cfg_path = out / "proof_eval.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    print(f"[eval] config (scale_factor {scale_factor}) -> {cfg_path}",
          flush=True)

    # ---- 3. the protocol command ----
    sr_dir = out / "sr"
    cmd = [sys.executable, "-m", "resshift_tpu.cli", "eval",
           "--protocol", "imagenet", "--config", str(cfg_path),
           "--ckpt", str(combined), "--in-path", LQ_DIR,
           "--gt-path", GT_DIR, "--out-path", str(sr_dir)]
    print("[eval] running:", " ".join(cmd), flush=True)
    subprocess.run(cmd, cwd=REPO, check=True)
    metrics = json.loads((sr_dir / "metrics.json").read_text())
    print(f"[eval] protocol metrics: {json.dumps(metrics)}", flush=True)

    # ---- bicubic baseline over the same files (the floor to clear) ----
    from resshift_tpu.ops.metrics import batch_psnr, batch_ssim
    from resshift_tpu.ops.resize import resize
    from resshift_tpu.utils.image_io import imread

    import jax.numpy as jnp

    ps = ss = n = 0.0
    for p in sorted(Path(LQ_DIR).glob("*.png")):
        lq = imread(p)
        gt = imread(Path(GT_DIR) / p.name)
        up = np.asarray(resize(jnp.asarray(lq[None]) * 2 - 1,
                               (gt.shape[0], gt.shape[1]),
                               "bicubic_torch"))[0]
        up01 = np.clip((up + 1) / 2, 0, 1)
        ps += float(batch_psnr(up01[None], gt[None], ycbcr=True))
        ss += float(batch_ssim(up01[None], gt[None], ycbcr=True))
        n += 1
    baseline = {"psnr_y": round(ps / n, 2), "ssim_y": round(ss / n, 4)}
    print(f"[eval] bicubic baseline: {baseline}", flush=True)

    report = {"protocol": "imagenet", "ckpt_step": steps[-1].name,
              "metrics": metrics, "bicubic_baseline": baseline}
    (out / "report.json").write_text(json.dumps(report, indent=2))
    print(f"[eval] -> {out / 'report.json'}", flush=True)


if __name__ == "__main__":
    main()
