"""Learnability proof: a real on-chip training run (VERDICT r1 #1).

Nothing in the reference repo ships an automated "does the trainer learn"
check — its QA story is watching train-loop validation over 300k iters
(/root/reference/trainer.py:296-333,851-950).  This tool compresses that
into a self-contained, single-chip experiment on the bundled testdata:

  1. builds a deterministic 4x-SR dataset from the 16 GT images in
     /root/reference/testdata/Bicubicx4/gt: 64px crops, LQ = MATLAB-bicubic
     down 4x then up 4x (pre-upsampled pairs, so the diffusion runs in
     pixel space at GT resolution with sf=1 — the same residual-shifting
     math as the latent task, minus the frozen VQGAN whose released
     weights this environment cannot fetch);
  2. trains the real Trainer (bf16 compute, EMA, cosine LR, orbax ckpts)
     for --iters steps, logging loss every log-freq iterations and running
     PSNR(Y)/SSIM validation against the bicubic baseline;
  3. proves resume continuity: an interrupted run (stop at iters/3,
     orbax-resume, continue to 2*iters/3) must reproduce the uninterrupted
     run's params BIT-IDENTICALLY (the deterministic loader fast-forward +
     iteration-keyed PRNG make this exact — stronger than the reference,
     which reseeds and accepts a different stream, trainer.py:189-190);
  4. optionally exercises the LPIPS trainer variant (difir_lpips) for a
     short run (random LPIPS weights — no egress for the real VGG — so
     this checks the wiring optimizes, not perceptual quality).

Writes <out>/report.json and a markdown summary to stdout; train logs
stay under <out>/run_*/train_log.jsonl.

Usage:  python tools/train_proof.py --out /tmp/train_proof --iters 1200
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


def build_dataset(out: Path, crop: int = 64, sf: int = 4):
    """Deterministic pre-upsampled pairs: train = 15 crops/image (240),
    val = the center crop of each image (16)."""
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
        im = imread(p)  # RGB [0,1], 256x256
        h, w = im.shape[:2]
        ch, cw = (h - crop) // 2, (w - crop) // 2
        for yy in range(0, h - crop + 1, crop):
            for xx in range(0, w - crop + 1, crop):
                g = im[yy:yy + crop, xx:xx + crop]
                lq = imresize_matlab(imresize_matlab(g, 1.0 / sf), float(sf))
                lq = np.clip(lq, 0, 1)
                name = f"{p.stem}_{yy:03d}_{xx:03d}.png"
                save(out / "train" / "lq" / name, lq)
                save(out / "train" / "gt" / name, g)
                n_train += 1
        # the centered crop of each image is held for val (offset 96 vs the
        # 64-aligned train grid, so no train crop coincides with it)
        g = im[ch:ch + crop, cw:cw + crop]
        lq = np.clip(imresize_matlab(imresize_matlab(g, 1.0 / sf), float(sf)), 0, 1)
        name = f"{p.stem}_center.png"
        save(out / "val" / "lq" / name, lq)
        save(out / "val" / "gt" / name, g)
        n_val += 1
    return n_train, n_val


def bicubic_baseline(data: Path):
    """PSNR(Y)/SSIM(Y) of the bicubic-upsampled LQ itself — the floor the
    trained model must clear."""
    from resshift_tpu.ops.metrics import batch_psnr, batch_ssim
    from resshift_tpu.utils.image_io import imread

    ps, ss, n = 0.0, 0.0, 0
    for p in sorted((data / "val" / "lq").glob("*.png")):
        lq = imread(p)[None]
        gt = imread(data / "val" / "gt" / p.name)[None]
        ps += batch_psnr(lq, gt, ycbcr=True)
        ss += batch_ssim(lq, gt, ycbcr=True)
        n += 1
    return ps / n, ss / n


def proof_config(data: Path, iters: int, use_lpips: bool = False,
                 batch: int = 16, kappa: float = 1.0,
                 lpips_path: str | None = None):
    cfg = dict(
        task="train_proof", sf=1,
        model=dict(
            image_size=64, in_channels=3, model_channels=64, out_channels=3,
            attention_resolutions=[64, 32, 16], dropout=0.0,
            channel_mult=[1, 2, 2], num_res_blocks=[2, 2, 2],
            conv_resample=True, num_head_channels=32,
            use_scale_shift_norm=True, resblock_updown=False, swin_depth=2,
            swin_embed_dim=96, window_size=8, mlp_ratio=4, cond_lq=True,
            cond_mask=False, lq_size=64,
        ),
        # kappa=1.0 (not the latent-task 2.0): this proof diffuses in PIXEL
        # space where unit-scale noise already spans the [-1,1] image range;
        # the latent recipe's kappa=2.0 is calibrated to the VQGAN latent
        # scale (/root/reference/configs/realsr_swinunet_realesrgan256.yaml)
        diffusion=dict(schedule_name="exponential", steps=4, min_noise_level=0.2,
                       etas_end=0.99, kappa=kappa, power=0.3, predict_type="xstart",
                       timestep_respacing=None, normalize_input=True,
                       latent_flag=False, scale_factor=1.0, sf=1),
        autoencoder=None,  # pixel space (IdentityFirstStage role)
        inference=dict(chop_size=64, chop_stride=48, padding_offset=64),
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
    if use_lpips:
        cfg["trainer"] = "difir_lpips"
        cfg["train"]["loss_coef"] = [1.0, 0.2]
        if lpips_path:  # real converted VGG weights (RUNBOOK step 3)
            cfg["train"]["lpips_path"] = lpips_path
    return cfg


def read_log(run_dir: Path):
    lines = [json.loads(l) for l in
             (run_dir / "train_log.jsonl").read_text().strip().splitlines()]
    train = [m for m in lines if "loss" in m]
    val = [m for m in lines if "val_psnr_y" in m]
    return train, val


def leaves_equal(a, b):
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb)) and len(la) == len(lb)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/train_proof")
    ap.add_argument("--iters", type=int, default=1200)
    ap.add_argument("--kappa", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-lpips", action="store_true")
    ap.add_argument("--skip-resume", action="store_true")
    ap.add_argument("--lpips-path", default=None,
                    help="converted LPIPS(vgg) weights for the difir_lpips "
                         "leg (RUNBOOK step 3; default: random weights, "
                         "wiring-proof only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from resshift_tpu.checkpoint import restore_train_state
    from resshift_tpu.train_loop import Trainer

    out = Path(args.out)
    data = out / "data"
    report: dict = {"platform": jax.devices()[0].platform,
                    "device": str(jax.devices()[0])}
    print(f"[proof] device: {jax.devices()}", flush=True)

    if not (data / "train" / "lq").exists():
        n_tr, n_val = build_dataset(data)
        print(f"[proof] dataset built: {n_tr} train / {n_val} val pairs", flush=True)

    base_psnr, base_ssim = bicubic_baseline(data)
    report["bicubic_baseline"] = {"psnr_y": float(base_psnr),
                                  "ssim_y": float(base_ssim)}
    print(f"[proof] bicubic baseline: PSNR(Y)={base_psnr:.2f} "
          f"SSIM(Y)={base_ssim:.4f}", flush=True)

    # ---- main run: uninterrupted ----
    cfg = proof_config(data, args.iters, kappa=args.kappa)
    report["kappa"] = args.kappa
    t0 = time.time()
    tr = Trainer(cfg, save_dir=str(out / "run_a"), seed=args.seed,
                 dtype=jnp.bfloat16)
    tr.train()
    wall = time.time() - t0
    train_log, val_log = read_log(out / "run_a")
    losses = [m["loss"] for m in train_log]
    n_nan = sum(0 if np.isfinite(v) else 1 for v in losses)
    head = float(np.mean(losses[:5]))
    tail = float(np.mean(losses[-5:]))
    report["run_a"] = {
        "iters": args.iters, "wall_s": wall,
        "ips": args.iters * cfg["train"]["batch"] / wall,
        "loss_first5_mean": head, "loss_last5_mean": tail,
        "loss_drop_pct": 100 * (1 - tail / head), "nan_events": n_nan,
        "loss_curve": [(m["iter"], round(m["loss"], 5)) for m in train_log],
        "val_curve": [(m["iter"], round(m["val_psnr_y"], 3),
                       round(m["val_ssim_y"], 5)) for m in val_log],
    }
    final_psnr = val_log[-1]["val_psnr_y"] if val_log else float("nan")
    print(f"[proof] run_a: loss {head:.4f} -> {tail:.4f} "
          f"({report['run_a']['loss_drop_pct']:.1f}% drop), "
          f"val PSNR(Y) {final_psnr:.2f} vs bicubic {base_psnr:.2f}, "
          f"{n_nan} NaN events, {wall:.0f}s", flush=True)

    # ---- resume continuity: same FULL-LENGTH config as run_a (identical
    # cosine-LR horizon), interrupted at save_freq via train(stop_iter=...),
    # orbax-resumed, continued to 2*save_freq, compared bit-for-bit against
    # run_a's checkpoint at that step
    if not args.skip_resume:
        sf_iter = cfg["train"]["save_freq"]
        cfg_b = proof_config(data, args.iters, kappa=args.kappa)
        cfg_b["train"]["val_freq"] = 10 ** 9  # continuity runs skip val
        tr_b = Trainer(cfg_b, save_dir=str(out / "run_b"), seed=args.seed,
                       dtype=jnp.bfloat16)
        tr_b.train(stop_iter=sf_iter)
        tr_b2 = Trainer(cfg_b, save_dir=str(out / "run_b"),
                        resume=str(out / "run_b" / "ckpts" / f"step_{sf_iter:08d}"),
                        seed=args.seed, dtype=jnp.bfloat16)
        tr_b2.train(stop_iter=2 * sf_iter)
        # compare against run_a's checkpoint at the same step
        ref_state = restore_train_state(
            str(out / "run_a" / "ckpts" / f"step_{2 * sf_iter:08d}"), tr_b2.state)
        same_params = leaves_equal(ref_state.params, tr_b2.state.params)
        same_ema = leaves_equal(ref_state.ema_params, tr_b2.state.ema_params)
        same_opt = leaves_equal(ref_state.opt_state, tr_b2.state.opt_state)
        report["resume"] = {"step": 2 * sf_iter, "params_bit_identical": same_params,
                            "ema_bit_identical": same_ema,
                            "opt_state_bit_identical": same_opt}
        print(f"[proof] resume continuity @step {2 * sf_iter}: params "
              f"{'BIT-IDENTICAL' if same_params else 'DIFFER'}, "
              f"ema {'ok' if same_ema else 'DIFFER'}, "
              f"opt {'ok' if same_opt else 'DIFFER'}", flush=True)

    # ---- LPIPS trainer variant (wiring proof) ----
    if not args.skip_lpips:
        it_l = max(args.iters // 6, 100)
        cfg_l = proof_config(data, it_l, use_lpips=True, kappa=args.kappa,
                             lpips_path=args.lpips_path)
        cfg_l["train"]["val_freq"] = 10 ** 9
        tr_l = Trainer(cfg_l, save_dir=str(out / "run_lpips"), seed=args.seed,
                       dtype=jnp.bfloat16)
        tr_l.train()
        tl, _ = read_log(out / "run_lpips")
        l0 = float(np.mean([m["loss"] for m in tl[:3]]))
        l1 = float(np.mean([m["loss"] for m in tl[-3:]]))
        report["run_lpips"] = {
            "iters": it_l, "loss_first3_mean": l0, "loss_last3_mean": l1,
            "decreased": l1 < l0,
            "lpips_first3_mean": float(np.mean([m["lpips"] for m in tl[:3]])),
            "lpips_last3_mean": float(np.mean([m["lpips"] for m in tl[-3:]])),
        }
        print(f"[proof] difir_lpips: combined loss {l0:.4f} -> {l1:.4f} "
              f"({'decreased' if l1 < l0 else 'NOT decreased'})", flush=True)

    report["learned"] = bool(val_log and final_psnr > base_psnr)
    (out / "report.json").write_text(json.dumps(report, indent=2))
    print(f"[proof] report -> {out / 'report.json'}", flush=True)


if __name__ == "__main__":
    main()
