"""Image IO + tensor conversion (host side).

Mirrors the live subset of the reference's `utils/util_image.py` IO helpers:
imread (:449-492, cv2 with RGB/gray/dtype handling), imwrite (:494-516),
img2tensor/tensor2img (:216-311).  NHWC float [0,1] is the interchange
format; [-1,1] is the model domain.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

IM_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".JPEG", ".PNG", ".JPG")


def imread(path: str | Path, chn: str = "rgb", dtype: str = "float32") -> np.ndarray:
    """Read an image -> HWC (or HW for gray), RGB order, [0,1] if float."""
    im = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if im is None:
        raise FileNotFoundError(f"cannot read image: {path}")
    if chn == "rgb":
        if im.ndim == 2:
            im = cv2.cvtColor(im, cv2.COLOR_GRAY2RGB)
        else:
            im = cv2.cvtColor(im[..., :3], cv2.COLOR_BGR2RGB)
    elif chn == "gray":
        if im.ndim == 3:
            im = cv2.cvtColor(im[..., :3], cv2.COLOR_BGR2GRAY)
    if dtype.startswith("float"):
        im = im.astype(dtype) / 255.0
    return im


def imwrite(im: np.ndarray, path: str | Path, qf: int = 95) -> None:
    """Write an RGB HWC image ([0,1] float or uint8) as png/jpg."""
    path = Path(path)
    if im.dtype != np.uint8:
        im = np.clip(np.round(np.clip(im, 0, 1) * 255.0), 0, 255).astype(np.uint8)
    if im.ndim == 3:
        im = cv2.cvtColor(im, cv2.COLOR_RGB2BGR)
    flag = [int(cv2.IMWRITE_JPEG_QUALITY), qf] if path.suffix.lower() in (".jpg", ".jpeg") else []
    ok = cv2.imwrite(str(path), im, flag)
    if not ok:
        raise IOError(f"cannot write image: {path}")


def list_images(path: str | Path, recursive: bool = True) -> list[Path]:
    p = Path(path)
    it = p.rglob("*") if recursive else p.glob("*")
    return sorted(x for x in it if x.suffix in IM_EXTS)


def to_model(im: np.ndarray) -> np.ndarray:
    """HWC [0,1] -> 1HWC [-1,1] float32."""
    x = (im.astype(np.float32) - 0.5) / 0.5
    if x.ndim == 2:
        x = x[..., None]
    return x[None]


def from_model(x: np.ndarray) -> np.ndarray:
    """NHWC [-1,1] -> NHWC [0,1]."""
    return np.clip(np.asarray(x, dtype=np.float32) * 0.5 + 0.5, 0.0, 1.0)


def make_grid(ims: np.ndarray, ncol: int = 8, pad: int = 2) -> np.ndarray:
    """Tile a batch NHWC [0,1] into one HWC grid image (the reference logs
    train/val image grids via torchvision `make_grid`, trainer.py:379-418)."""
    ims = np.asarray(ims, np.float32)
    n, h, w, c = ims.shape
    ncol = min(ncol, n)
    nrow = (n + ncol - 1) // ncol
    grid = np.ones((nrow * (h + pad) + pad, ncol * (w + pad) + pad, c), np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0, x0 = pad + r * (h + pad), pad + col * (w + pad)
        grid[y0:y0 + h, x0:x0 + w] = ims[i]
    return grid
