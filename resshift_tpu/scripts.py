"""Test-set preparation scripts (reference scripts/ equivalents).

  * `prepare_testing_imagenet_sr` — ImageNet-Test builder
    (scripts/prepare_testing_imagenet_sr.py): center-crop HQ to gt_size via
    the RealESRGAN dataset's 'testing' mode, then run the milder
    degradation_testing config through the device RealESRGAN pipeline.
  * `prepare_testing_celeba_faceir` — CelebA face-IR test set
    (scripts/prepare_testing_celeba_faceir.py): deterministic-parameter
    `face_degradation` with uniformly sampled sig/noise/qf
    (datapipe/face_degradation_testing.py:11-51).

Run: python -m resshift_tpu.scripts imagenet-sr --source ... --out ...
     python -m resshift_tpu.scripts celeba-faceir --source ... --out ...
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from .data import degradations as deg
from .data.datasets import RealESRGANData
from .data.faces import face_degradation
from .data.realesrgan import DegradationConfig, RealESRGANDegrader
from .utils.image_io import imread, imwrite, list_images

# milder testing ranges (configs/degradation_testing_realesrgan.yaml)
TESTING_DEGRADATION = DegradationConfig(
    sf=4,
    resize_prob=(0.2, 0.7, 0.1), resize_range=(0.3, 1.2),
    gaussian_noise_prob=0.5, noise_range=(1, 15),
    poisson_scale_range=(0.05, 1.5), gray_noise_prob=0.4, jpeg_range=(60, 95),
    second_order_prob=0.5, second_blur_prob=0.8,
    resize_prob2=(0.3, 0.4, 0.3), resize_range2=(0.6, 1.2),
    gaussian_noise_prob2=0.5, noise_range2=(1, 12),
    poisson_scale_range2=(0.05, 1.0), gray_noise_prob2=0.4, jpeg_range2=(60, 100),
    gt_size=256, resize_back=False, use_sharp=False, queue_size=0,
)


def prepare_testing_imagenet_sr(source: str, out: str, num_images: int | None = None,
                                seed: int = 10000):
    import jax

    out_lq = Path(out) / "lq"
    out_gt = Path(out) / "gt"
    out_lq.mkdir(parents=True, exist_ok=True)
    out_gt.mkdir(parents=True, exist_ok=True)

    ds = RealESRGANData(dir_paths=[source], gt_size=256, mode="testing",
                        rescale_gt=False, seed=seed, length=num_images)
    degrader = RealESRGANDegrader(TESTING_DEGRADATION)
    rng = np.random.default_rng(seed)
    for i in range(len(ds)):
        item = ds[i]
        batch = {k: v[None] for k, v in item.items() if not isinstance(v, str)}
        pair = degrader(rng, jax.random.PRNGKey(seed + i), batch)
        name = f"{i:05d}.png"
        imwrite(pair["gt"][0] * 0.5 + 0.5, out_gt / name)
        imwrite(pair["lq"][0] * 0.5 + 0.5, out_lq / name)
    print(f"wrote {len(ds)} pairs to {out}")


def prepare_testing_celeba_faceir(source: str, out: str, sf: int = 4,
                                  num_images: int | None = None, seed: int = 10000):
    out_lq = Path(out) / "lq"
    out_gt = Path(out) / "gt"
    out_lq.mkdir(parents=True, exist_ok=True)
    out_gt.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    files = list_images(source)
    if num_images:
        files = files[:num_images]
    for f in files:
        im = imread(f)
        # uniformly sampled degradation parameters (prepare_testing_celeba_faceir.py)
        lq = face_degradation(
            im, sf=sf,
            sig_x=rng.uniform(2, 10), sig_y=rng.uniform(2, 10),
            theta=rng.uniform(0, np.pi), nf=rng.uniform(0, 15),
            qf=rng.uniform(40, 90), rng=rng,
        )
        imwrite(im, out_gt / f"{f.stem}.png")
        imwrite(lq, out_lq / f"{f.stem}.png")
    print(f"wrote {len(files)} pairs to {out}")


def pack_folder(source: str, out: str, recursive: bool = True) -> int:
    """Pack a folder of images into a PackFile (the native IO runtime's
    flat-file dataset format — data/packfile.py, native/packfile.cpp)."""
    from .data.packfile import PackWriter
    from .utils.image_io import list_images

    files = list_images(source, recursive=recursive)
    src = Path(source)
    with PackWriter(out) as w:
        for f in files:
            w.add(str(f.relative_to(src)), f.read_bytes())
    print(f"packed {len(files)} blobs -> {out}")
    return len(files)


def main(argv=None):
    p = argparse.ArgumentParser(prog="resshift_tpu.scripts")
    sub = p.add_subparsers(dest="cmd", required=True)
    a = sub.add_parser("imagenet-sr")
    a.add_argument("--source", required=True)
    a.add_argument("--out", required=True)
    a.add_argument("--num-images", type=int, default=None)
    a.add_argument("--seed", type=int, default=10000)
    b = sub.add_parser("celeba-faceir")
    b.add_argument("--source", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--sf", type=int, default=4)
    b.add_argument("--num-images", type=int, default=None)
    b.add_argument("--seed", type=int, default=10000)
    c = sub.add_parser("pack", help="pack an image folder into a PackFile")
    c.add_argument("--source", required=True)
    c.add_argument("--out", required=True)
    args = p.parse_args(argv)
    if args.cmd == "imagenet-sr":
        prepare_testing_imagenet_sr(args.source, args.out, args.num_images, args.seed)
    elif args.cmd == "pack":
        pack_folder(args.source, args.out)
    else:
        prepare_testing_celeba_faceir(args.source, args.out, args.sf,
                                      args.num_images, args.seed)


if __name__ == "__main__":
    main()
