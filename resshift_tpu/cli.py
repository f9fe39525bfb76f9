"""Command-line interface.

`python -m resshift_tpu.cli infer ...` mirrors the reference's
`inference_resshift.py` surface (task/version/scale/chop/bs/mask/seed) and
`sampler.py ResShiftSampler.inference` semantics: folder or single-file
input, tiled inference over chop_size, inpainting paste-back
`sr*mask + lq*(1-mask)` (sampler.py:219-222), Y-channel PSNR/SSIM report
when a GT folder is given.

Checkpoints: this environment has no network egress, so `--ckpt`/
`--vqgan-ckpt` must point at local .pth (torch) or .npz/orbax (native)
files; the release URLs are printed for out-of-band download.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def _build_pipeline(args):
    import jax.numpy as jnp

    from .config import CKPT_URLS, default_chop, load_yaml_config, task_config
    from .pipeline import ResShiftPipeline

    if args.config:
        cfg = load_yaml_config(args.config)
    else:
        name = args.task if args.task != "realsr" else f"realsr_{args.version}"
        if args.task == "realsr" and args.scale == 2:
            name = "realsr_x2"
        cfg = task_config(name)
    if args.chop_size:
        cs, st = default_chop(args.chop_size, cfg["sf"])
        cfg["inference"]["chop_size"] = cs
        cfg["inference"]["chop_stride"] = args.chop_stride * (4 // cfg["sf"]) if args.chop_stride else st
    pipe = ResShiftPipeline(cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    return pipe


def _load_params(pipe, args):
    import jax

    if args.ckpt:
        if args.ckpt.endswith(".pth"):
            return pipe.load_torch_checkpoints(args.ckpt, args.vqgan_ckpt)
        from .checkpoint import load_params

        return load_params(args.ckpt)
    from .config import CKPT_URLS

    name = args.task if args.task != "realsr" else f"realsr_{args.version}"
    urls = CKPT_URLS.get(name)
    print(f"WARNING: no --ckpt given; using RANDOM weights (demo/benchmark only).\n"
          f"Download the released checkpoints out-of-band:\n  unet:  {urls[0] if urls else '?'}\n"
          f"  vqgan: {urls[1] if urls else '?'}", file=sys.stderr)
    return pipe.init_params(jax.random.PRNGKey(args.seed))


def cmd_infer(args):
    import jax

    from .ops.metrics import batch_psnr, batch_ssim
    from .utils.image_io import from_model, imread, imwrite, list_images, to_model

    pipe = _build_pipeline(args)
    params = _load_params(pipe, args)
    key = jax.random.PRNGKey(args.seed)

    in_path = Path(args.in_path)
    out_path = Path(args.out_path)
    out_path.mkdir(parents=True, exist_ok=True)
    files = list_images(in_path) if in_path.is_dir() else [in_path]
    print(f"Found {len(files)} image(s) in {in_path}")

    mask_files = None
    if args.mask_path:
        mp = Path(args.mask_path)
        mask_files = {f.stem: f for f in (list_images(mp) if mp.is_dir() else [mp])}

    t_total, px_total = 0.0, 0
    for i, f in enumerate(files):
        im = imread(f)
        lq = to_model(im)
        mask = None
        if mask_files is not None:
            mf = mask_files.get(f.stem) or next(iter(mask_files.values()))
            mask = to_model(imread(mf, chn="gray"))
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        sr = pipe.sample(params, lq, k, mask=mask, noise_repeat=args.noise_repeat,
                         tile_bs=args.chop_bs)
        sr = np.asarray(sr)
        dt = time.perf_counter() - t0
        t_total += dt
        px_total += sr.shape[1] * sr.shape[2]
        sr01 = from_model(sr)[0]
        if mask is not None and args.mask_back:
            m01 = np.asarray(mask)[0] * 0.5 + 0.5
            sr01 = sr01 * m01 + (im[..., :3] * (1 - m01))
        imwrite(sr01, out_path / f"{f.stem}.png")
        print(f"[{i + 1}/{len(files)}] {f.name}: {sr.shape[2]}x{sr.shape[1]} in {dt:.2f}s")

    print(f"Done: {px_total / max(t_total, 1e-9) / 1e6:.3f} Mpx/s -> {out_path}")

    if args.gt_path:
        gts = {f.stem: f for f in list_images(Path(args.gt_path))}
        psnr = ssim = n = 0
        for f in files:
            if f.stem not in gts:
                continue
            sr = imread(out_path / f"{f.stem}.png")[None]
            gt = imread(gts[f.stem])[None]
            psnr += batch_psnr(sr, gt, ycbcr=True)
            ssim += batch_ssim(sr, gt, ycbcr=True)
            n += 1
        if n:
            print(f"PSNR(Y): {psnr / n:.2f} dB  SSIM(Y): {ssim / n:.4f}  ({n} images)")


def cmd_train(args):
    import jax.numpy as jnp

    from .config import load_yaml_config, task_config
    from .train_loop import Trainer

    cfg = load_yaml_config(args.config) if args.config else task_config(
        args.task if args.task != "realsr" else f"realsr_{args.version}")
    if "data" not in cfg or not cfg["data"].get("train"):
        raise SystemExit("config has no data.train section — provide --config "
                         "with dataset paths")
    Trainer(cfg, save_dir=args.save_dir, resume=args.resume,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            seed=args.seed).train()


def cmd_convert(args):
    """Convert a torch .pth pair into a native orbax checkpoint."""
    from .checkpoint import save_params
    from .pipeline import ResShiftPipeline

    pipe = _build_pipeline(args)
    params = pipe.load_torch_checkpoints(args.ckpt, args.vqgan_ckpt)
    save_params(args.out_path, params)
    print(f"Converted -> {args.out_path}")


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="resshift_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--task", default="realsr",
                        choices=["realsr", "bicsr", "inpaint_imagenet", "inpaint_face", "faceir"])
        sp.add_argument("--version", default="v3", choices=["v1", "v2", "v3"])
        sp.add_argument("--scale", type=int, default=4)
        sp.add_argument("--config", default=None, help="custom YAML config")
        sp.add_argument("--ckpt", default=None)
        sp.add_argument("--vqgan-ckpt", default=None)
        sp.add_argument("--seed", type=int, default=12345)
        sp.add_argument("--bf16", action="store_true", default=True)
        sp.add_argument("--fp32", dest="bf16", action="store_false")

    pi = sub.add_parser("infer", help="restore a folder or single image")
    common(pi)
    pi.add_argument("--in-path", required=True)
    pi.add_argument("--out-path", required=True)
    pi.add_argument("--gt-path", default=None, help="GT folder for PSNR/SSIM report")
    pi.add_argument("--mask-path", default=None, help="inpainting mask (file or folder)")
    pi.add_argument("--mask-back", action="store_true", default=True)
    pi.add_argument("--chop-size", type=int, default=None, choices=[512, 256, 64])
    pi.add_argument("--chop-stride", type=int, default=None)
    pi.add_argument("--chop-bs", type=int, default=1)
    pi.add_argument("--bs", type=int, default=1)
    pi.add_argument("--noise-repeat", action="store_true")
    pi.set_defaults(fn=cmd_infer)

    pc = sub.add_parser("convert", help="torch .pth -> native checkpoint")
    common(pc)
    pc.add_argument("--out-path", required=True)
    pc.set_defaults(fn=cmd_convert)

    pt = sub.add_parser("train", help="train a task (main.py equivalent)")
    common(pt)
    pt.add_argument("--save-dir", default="./save_dir")
    pt.add_argument("--resume", default=None)
    pt.set_defaults(fn=cmd_train)
    return p


def main(argv=None):
    args = make_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
