"""Latent-path learnability proof (VERDICT r2 #1): the flagship composition.

The flagship configs train the diffusion in the latent space of a frozen
VQGAN (`/root/reference/trainer.py:444-485`,
`configs/realsr_swinunet_realesrgan256.yaml:47-68`): stop-gradient encodes
of BOTH gt and lq inside the jitted step, noise drawn at latent resolution,
kappa=2.0 in latent units, scale_factor scaling on encode/decode, and
validation through the full reverse chain + VQGAN decode.  The round-2
pixel-space proof (tools/train_proof.py) deliberately sidestepped all of
that; this tool runs the SAME experiment through a first stage pretrained
here (tools/vqgan_pretrain.py), at the same geometry ratios as the
flagship recipe (GT:latent = 4:1 via an f4 AE, lq_size == latent size so
the LQ conditioning concats directly with x_t, unet.py:689-705):

  GT 64px crops  --f4 AE-->  16x16x3 latents;  LQ 16px (MATLAB bicubic
  down 4x);  UNetSwin(image_size=16, lq_size=16, cond_lq);  kappa=2.0,
  15-step exponential schedule (min_noise_level 0.04);  scale_factor
  calibrated as 1/std(latent) from the pretrain report (the LDM
  convention; the flagship ships 1.0 because its released f4 latents are
  already ~unit-std).

Stages:
  1. dataset build (train 64px-grid crops + held-out center crops);
  2. bicubic-upsample baseline (the PSNR floor to clear);
  3. AE ceiling: PSNR of the frozen AE's roundtrip of the val GT — the
     highest any latent-space method can score through this decoder;
  4. run A: full training run, val-through-decode trajectory;
  5. resume continuity: interrupted run must match run A bit-for-bit;

Usage:
  python tools/vqgan_pretrain.py --out /tmp/vq_pretrain --iters 12000
  python tools/train_proof_latent.py --ae /tmp/vq_pretrain \
      --out /tmp/train_proof_latent --iters 3000
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

GT_DIR = "/root/reference/testdata/Bicubicx4/gt"
CROP = 64
SF = 4


def _dihedral(im: np.ndarray, k: int) -> np.ndarray:
    """The 8 flip/rot90 views (k in 0..7): the paired augment the reference
    trains with (basicsr transforms + util_image data_aug_np).  MATLAB
    bicubic is separable/symmetric, so downsample commutes with these —
    augmenting GT then deriving LQ equals augmenting the pair."""
    if k >= 4:
        im = im[:, ::-1]
    return np.ascontiguousarray(np.rot90(im, k % 4, axes=(0, 1)))


def build_dataset(out: Path, stride: int = 32, n_aug: int = 8):
    """Deterministic 4x pairs at TRUE low resolution (the latent path
    upsamples inside `encode_first_stage`, gaussian_diffusion.py:500-512 —
    unlike the pixel proof's pre-upsampled pairs).

    Round-3 extension: overlapping stride-32 crops x 8-way dihedral views
    (the first fit used 15 disjoint crops/image and memorized them — train
    loss 3e-4 with val PSNR plateaued; see TRAIN.md).  The val center crop
    (offset 96, which IS on the stride-32 grid) is excluded from train."""
    import cv2

    from resshift_tpu.ops.resize import imresize_matlab
    from resshift_tpu.utils.image_io import imread

    for d in ("train/lq", "train/gt", "val/lq", "val/gt"):
        (out / d).mkdir(parents=True, exist_ok=True)

    def save(path, im01):
        bgr = cv2.cvtColor((np.clip(im01, 0, 1) * 255).round().astype(np.uint8),
                           cv2.COLOR_RGB2BGR)
        cv2.imwrite(str(path), bgr)

    n_train = n_val = 0
    for p in sorted(Path(GT_DIR).glob("*.png")):
        im = imread(p)
        h, w = im.shape[:2]
        ch, cw = (h - CROP) // 2, (w - CROP) // 2
        for yy in range(0, h - CROP + 1, stride):
            for xx in range(0, w - CROP + 1, stride):
                if (yy, xx) == (ch, cw):
                    continue  # exactly the held-out val view
                g0 = im[yy:yy + CROP, xx:xx + CROP]
                for k in range(n_aug):
                    g = _dihedral(g0, k)
                    lq = np.clip(imresize_matlab(g, 1.0 / SF), 0, 1)
                    name = f"{p.stem}_{yy:03d}_{xx:03d}_a{k}.png"
                    save(out / "train" / "lq" / name, lq)
                    save(out / "train" / "gt" / name, g)
                    n_train += 1
        g = im[ch:ch + CROP, cw:cw + CROP]
        lq = np.clip(imresize_matlab(g, 1.0 / SF), 0, 1)
        save(out / "val" / "lq" / f"{p.stem}_center.png", lq)
        save(out / "val" / "gt" / f"{p.stem}_center.png", g)
        n_val += 1
    return n_train, n_val


def bicubic_baseline(data: Path):
    from resshift_tpu.ops.metrics import batch_psnr, batch_ssim
    from resshift_tpu.ops.resize import imresize_matlab
    from resshift_tpu.utils.image_io import imread

    ps = ss = 0.0
    n = 0
    for p in sorted((data / "val" / "lq").glob("*.png")):
        up = np.clip(imresize_matlab(imread(p), float(SF)), 0, 1)[None]
        gt = imread(data / "val" / "gt" / p.name)[None]
        ps += batch_psnr(up, gt, ycbcr=True)
        ss += batch_ssim(up, gt, ycbcr=True)
        n += 1
    return ps / n, ss / n


def proof_config(data: Path, ae_dir: Path, iters: int, batch: int = 16):
    ae_report = json.loads((ae_dir / "report.json").read_text())
    scale_factor = round(float(ae_report["scale_factor"]), 4)
    cfg = dict(
        task="train_proof_latent", sf=SF,
        model=dict(
            image_size=16, in_channels=3, model_channels=64, out_channels=3,
            attention_resolutions=[16, 8], dropout=0.0,
            channel_mult=[1, 2], num_res_blocks=[2, 2],
            conv_resample=True, num_head_channels=32,
            use_scale_shift_norm=True, resblock_updown=False, swin_depth=2,
            swin_embed_dim=96, window_size=8, mlp_ratio=4, cond_lq=True,
            cond_mask=False, lq_size=16,
        ),
        # the flagship diffusion block (realsr_swinunet_realesrgan256.yaml:
        # 28-45): kappa=2.0 latent-unit noise, 15-step exponential schedule
        diffusion=dict(schedule_name="exponential", steps=15,
                       min_noise_level=0.04, etas_end=0.99, kappa=2.0,
                       power=0.3, predict_type="xstart",
                       timestep_respacing=None, normalize_input=True,
                       latent_flag=True, scale_factor=scale_factor, sf=SF),
        autoencoder=dict(
            ckpt_path=str(ae_dir / "ae_ckpt"),
            embed_dim=int(ae_report["embed_dim"]),
            n_embed=int(ae_report["n_embed"]),
            ddconfig=dict(ae_report["ddconfig"]),
        ),
        inference=dict(chop_size=16, chop_stride=12, padding_offset=16),
        train=dict(lr=2e-4, lr_min=2e-5, lr_schedule="cosin",
                   warmup_iterations=50, iterations=iters, batch=batch,
                   microbatch=None, ema_rate=0.999, weight_decay=0.0,
                   save_freq=max(iters // 3, 1), log_freq=[20, 10 ** 9],
                   val_freq=max(iters // 6, 1), val_max_images=None),
        data=dict(
            train=dict(type="base", params=dict(
                dir_path=str(data / "train" / "lq"),
                extra_dir_path=str(data / "train" / "gt"))),
            val=dict(type="base", params=dict(
                dir_path=str(data / "val" / "lq"),
                extra_dir_path=str(data / "val" / "gt"))),
        ),
    )
    return cfg, scale_factor


def read_log(run_dir: Path):
    lines = [json.loads(l) for l in
             (run_dir / "train_log.jsonl").read_text().strip().splitlines()]
    return ([m for m in lines if "loss" in m],
            [m for m in lines if "val_psnr_y" in m])


def leaves_equal(a, b):
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb)) and len(la) == len(lb)


def ae_ceiling(cfg: dict, data: Path):
    """PSNR(Y) of frozen-AE roundtrip of val GT: the decode-path ceiling."""
    import jax
    import jax.numpy as jnp

    from resshift_tpu.ops.metrics import batch_psnr
    from resshift_tpu.pipeline import ResShiftPipeline
    from resshift_tpu.utils.image_io import imread

    pipe = ResShiftPipeline(cfg, dtype=jnp.bfloat16)
    vq_params = pipe.load_vqgan_checkpoint(cfg["autoencoder"]["ckpt_path"])

    @jax.jit
    def roundtrip(p, x):
        z = pipe._encode(p, x, up_sample=False)
        return jnp.clip(pipe._decode(p, z), -1, 1)

    gts = np.stack([imread(p) for p in sorted((data / "val" / "gt").glob("*.png"))])
    rec = np.asarray(roundtrip(vq_params, jnp.asarray(gts * 2.0 - 1.0)))
    return float(batch_psnr((rec + 1) / 2, gts, ycbcr=True) / len(gts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ae", default="/tmp/vq_pretrain",
                    help="output dir of tools/vqgan_pretrain.py")
    ap.add_argument("--out", default="/tmp/train_proof_latent")
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-resume", action="store_true")
    ap.add_argument("--data-stride", type=int, default=32,
                    help="train crop grid stride (64 = the round-3 first "
                         "fit's disjoint grid)")
    ap.add_argument("--data-aug", type=int, default=8,
                    help="dihedral views per crop (1 = no augmentation)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from resshift_tpu.checkpoint import restore_train_state
    from resshift_tpu.train_loop import Trainer

    out = Path(args.out)
    data = out / "data"
    report: dict = {"platform": jax.devices()[0].platform,
                    "device": str(jax.devices()[0])}
    print(f"[latent-proof] device: {jax.devices()}", flush=True)

    if not (data / "train" / "lq").exists():
        n_tr, n_val = build_dataset(data, stride=args.data_stride,
                                    n_aug=args.data_aug)
        print(f"[latent-proof] dataset: {n_tr} train / {n_val} val pairs",
              flush=True)

    base_psnr, base_ssim = bicubic_baseline(data)
    report["bicubic_baseline"] = {"psnr_y": float(base_psnr),
                                  "ssim_y": float(base_ssim)}
    print(f"[latent-proof] bicubic baseline: PSNR(Y)={base_psnr:.2f} "
          f"SSIM(Y)={base_ssim:.4f}", flush=True)

    cfg, scale_factor = proof_config(data, Path(args.ae), args.iters)
    report["scale_factor"] = scale_factor
    report["kappa"] = cfg["diffusion"]["kappa"]

    ceil = ae_ceiling(cfg, data)
    report["ae_ceiling_psnr_y"] = ceil
    print(f"[latent-proof] AE roundtrip ceiling: PSNR(Y)={ceil:.2f} "
          f"(any latent method is capped here)", flush=True)

    # ---- run A: uninterrupted ----
    t0 = time.time()
    tr = Trainer(cfg, save_dir=str(out / "run_a"), seed=args.seed,
                 dtype=jnp.bfloat16)
    tr.train()
    wall = time.time() - t0
    train_log, val_log = read_log(out / "run_a")
    losses = [m["loss"] for m in train_log]
    n_nan = sum(0 if np.isfinite(v) else 1 for v in losses)
    head, tail = float(np.mean(losses[:5])), float(np.mean(losses[-5:]))
    final_psnr = val_log[-1]["val_psnr_y"] if val_log else float("nan")
    best_psnr = max((m["val_psnr_y"] for m in val_log), default=float("nan"))
    report["run_a"] = {
        "iters": args.iters, "wall_s": wall,
        "loss_first5_mean": head, "loss_last5_mean": tail,
        "loss_drop_pct": 100 * (1 - tail / head), "nan_events": n_nan,
        "loss_curve": [(m["iter"], round(m["loss"], 5)) for m in train_log],
        "val_curve": [(m["iter"], round(m["val_psnr_y"], 3),
                       round(m["val_ssim_y"], 5)) for m in val_log],
        "best_val_psnr_y": best_psnr,
    }
    print(f"[latent-proof] run_a: latent loss {head:.4f} -> {tail:.4f} "
          f"({report['run_a']['loss_drop_pct']:.1f}%), val PSNR(Y) "
          f"final {final_psnr:.2f} / best {best_psnr:.2f} vs bicubic "
          f"{base_psnr:.2f} (ceiling {ceil:.2f}), {n_nan} NaNs, {wall:.0f}s",
          flush=True)

    # ---- resume continuity on the latent path ----
    if not args.skip_resume:
        sf_iter = cfg["train"]["save_freq"]
        cfg_b, _ = proof_config(data, Path(args.ae), args.iters)
        cfg_b["train"]["val_freq"] = 10 ** 9
        tr_b = Trainer(cfg_b, save_dir=str(out / "run_b"), seed=args.seed,
                       dtype=jnp.bfloat16)
        tr_b.train(stop_iter=sf_iter)
        tr_b2 = Trainer(cfg_b, save_dir=str(out / "run_b"),
                        resume=str(out / "run_b" / "ckpts" / f"step_{sf_iter:08d}"),
                        seed=args.seed, dtype=jnp.bfloat16)
        tr_b2.train(stop_iter=2 * sf_iter)
        ref_state = restore_train_state(
            str(out / "run_a" / "ckpts" / f"step_{2 * sf_iter:08d}"), tr_b2.state)
        same = {k: leaves_equal(getattr(ref_state, k), getattr(tr_b2.state, k))
                for k in ("params", "ema_params", "opt_state")}
        report["resume"] = {"step": 2 * sf_iter,
                            **{f"{k}_bit_identical": v for k, v in same.items()}}
        print(f"[latent-proof] resume @step {2 * sf_iter}: " +
              " ".join(f"{k}={'OK' if v else 'DIFFER'}" for k, v in same.items()),
              flush=True)

    report["learned"] = bool(val_log and best_psnr > base_psnr)
    (out / "report.json").write_text(json.dumps(report, indent=2))
    print(f"[latent-proof] report -> {out / 'report.json'}", flush=True)


if __name__ == "__main__":
    main()
