"""Device-side RealESRGAN two-stage degradation pipeline.

Parity with `TrainerDifIR.prepare_data` (trainer.py:526-704): blur with the
per-sample first kernel -> random resize -> Gaussian|Poisson noise ->
DiffJPEG -> optional second-order (blur2/resize/noise) -> {resize-back +
sinc, JPEG} in random order -> clamp/8-bit round -> paired random crop ->
[-1,1] -> training-pair queue (trainer.py:487-524).

TPU design: all *branching* randomness (resize type/scale/mode, noise
family, second-order coin flips, op order, crop offset) is drawn on the
host per batch; per-sample randomness (kernels, sigmas, gray flags, JPEG
qualities) rides in as arrays.  Each tensor stage is a small jitted
function cached by shape; random resize scales are quantized to a 1/16 grid
so the compile cache is bounded (~tens of programs, amortized over the full
training run; statistically indistinguishable from continuous scales).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.diffjpeg import diff_jpeg
from ..ops.filters import filter2d, usm_sharp
from ..ops.resize import resize
from .noise import add_gaussian_noise, add_poisson_noise

__all__ = ["DegradationConfig", "RealESRGANDegrader", "paired_random_crop"]

_SCALE_GRID = 16  # quantize random resize scales to multiples of 1/16


@dataclasses.dataclass(frozen=True)
class DegradationConfig:
    """degradation block of the task YAML (configs/realsr_*.yaml:70-94)."""

    sf: int = 4
    resize_prob: tuple = (0.2, 0.7, 0.1)
    resize_range: tuple = (0.15, 1.5)
    gaussian_noise_prob: float = 0.5
    noise_range: tuple = (1, 30)
    poisson_scale_range: tuple = (0.05, 3.0)
    gray_noise_prob: float = 0.4
    jpeg_range: tuple = (30, 95)
    second_order_prob: float = 0.5
    second_blur_prob: float = 0.8
    resize_prob2: tuple = (0.3, 0.4, 0.3)
    resize_range2: tuple = (0.3, 1.2)
    gaussian_noise_prob2: float = 0.5
    noise_range2: tuple = (1, 25)
    poisson_scale_range2: tuple = (0.05, 2.5)
    gray_noise_prob2: float = 0.4
    jpeg_range2: tuple = (30, 95)
    gt_size: int = 256
    resize_back: bool = False
    use_sharp: bool = False
    queue_size: int | None = None


def _rand_updown(rng: np.random.Generator, probs, srange) -> float:
    kind = rng.choice(3, p=np.asarray(probs) / np.sum(probs))
    if kind == 0:   # up
        s = rng.uniform(1, srange[1])
    elif kind == 1:  # down
        s = rng.uniform(srange[0], 1)
    else:
        s = 1.0
    return s


def _q(s: float) -> float:
    return max(round(s * _SCALE_GRID), 1) / _SCALE_GRID


@functools.partial(jax.jit, static_argnames=("out_hw", "mode"))
def _resize_stage(img, out_hw, mode):
    return resize(img, out_hw, mode)


@functools.partial(jax.jit, static_argnames=("gauss",))
def _noise_stage(key, img, amount, gray, gauss):
    if gauss:
        return add_gaussian_noise(key, img, amount, gray, clip=True)
    return add_poisson_noise(key, img, amount, gray, clip=True)


@jax.jit
def _jpeg_stage(img, quality):
    return diff_jpeg(jnp.clip(img, 0.0, 1.0), quality)


@jax.jit
def _blur_stage(img, kernels):
    return filter2d(img, kernels)


@functools.partial(jax.jit, static_argnames=("size", "scale"))
def _crop_stage(gt, lq, top, left, size, scale):
    """paired_random_crop (basicsr/data/transforms.py:26-92): one offset for
    the whole batch; LQ offset = GT offset // scale."""
    lt, ll = top, left
    lq_c = jax.lax.dynamic_slice(
        lq, (0, lt, ll, 0), (lq.shape[0], size // scale, size // scale, lq.shape[3]))
    gt_c = jax.lax.dynamic_slice(
        gt, (0, lt * scale, ll * scale, 0), (gt.shape[0], size, size, gt.shape[3]))
    return gt_c, lq_c


def paired_random_crop(rng: np.random.Generator, gt, lq, gt_size: int, scale: int):
    _, h_lq, w_lq, _ = lq.shape
    lq_size = gt_size // scale
    top = int(rng.integers(0, h_lq - lq_size + 1))
    left = int(rng.integers(0, w_lq - lq_size + 1))
    return _crop_stage(gt, lq, top, left, gt_size, scale)


class RealESRGANDegrader:
    """Batch degrader + training-pair queue."""

    def __init__(self, cfg: DegradationConfig | dict):
        if isinstance(cfg, dict):
            cfg = DegradationConfig(**{k: tuple(v) if isinstance(v, list) else v
                                       for k, v in cfg.items()})
        self.cfg = cfg
        self._queue: dict[str, np.ndarray] | None = None
        self._queue_ptr = 0

    def __call__(self, rng: np.random.Generator, key: jax.Array, batch: dict) -> dict:
        """batch: {'gt': (B,H,W,3) [0,1], 'kernel1': (B,21,21),
        'kernel2': (B,21,21), 'sinc_kernel': (B,21,21)} -> {'gt','lq'} in [-1,1]."""
        cfg = self.cfg
        gt = jnp.asarray(batch["gt"], jnp.float32)
        b, ori_h, ori_w, _ = gt.shape
        sf = cfg.sf
        keys = list(jax.random.split(key, 8))

        if cfg.use_sharp:
            gt = usm_sharp(gt)

        # ---------------- first degradation ----------------
        out = _blur_stage(gt, jnp.asarray(batch["kernel1"], jnp.float32))
        s1 = _q(_rand_updown(rng, cfg.resize_prob, cfg.resize_range))
        mode1 = ["area", "bilinear", "bicubic_torch"][rng.integers(3)]
        if s1 != 1.0:
            out = _resize_stage(out, (int(ori_h * s1), int(ori_w * s1)), mode1)
        if rng.uniform() < cfg.gaussian_noise_prob:
            amount = jnp.asarray(rng.uniform(*cfg.noise_range, size=b), jnp.float32)
            gauss = True
        else:
            amount = jnp.asarray(rng.uniform(*cfg.poisson_scale_range, size=b), jnp.float32)
            gauss = False
        gray = jnp.asarray(rng.uniform(size=b) < cfg.gray_noise_prob, jnp.float32)
        out = _noise_stage(keys[0], out, amount, gray, gauss)
        q1 = jnp.asarray(rng.uniform(*cfg.jpeg_range, size=b), jnp.float32)
        out = _jpeg_stage(out, q1)

        # ---------------- second degradation ----------------
        if rng.uniform() < cfg.second_order_prob:
            if rng.uniform() < cfg.second_blur_prob:
                out = _blur_stage(out, jnp.asarray(batch["kernel2"], jnp.float32))
            s2 = _rand_updown(rng, cfg.resize_prob2, cfg.resize_range2)
            mode2 = ["area", "bilinear", "bicubic_torch"][rng.integers(3)]
            out = _resize_stage(
                out, (max(int(ori_h / sf * s2), 8), max(int(ori_w / sf * s2), 8)), mode2)
            if rng.uniform() < cfg.gaussian_noise_prob2:
                amount = jnp.asarray(rng.uniform(*cfg.noise_range2, size=b), jnp.float32)
                gauss = True
            else:
                amount = jnp.asarray(rng.uniform(*cfg.poisson_scale_range2, size=b), jnp.float32)
                gauss = False
            gray = jnp.asarray(rng.uniform(size=b) < cfg.gray_noise_prob2, jnp.float32)
            out = _noise_stage(keys[1], out, amount, gray, gauss)

        # ---------------- resize back + sinc / JPEG (random order) --------
        sinc = jnp.asarray(batch["sinc_kernel"], jnp.float32)
        mode3 = ["area", "bilinear", "bicubic_torch"][rng.integers(3)]
        q2 = jnp.asarray(rng.uniform(*cfg.jpeg_range2, size=b), jnp.float32)
        if rng.uniform() < 0.5:
            out = _resize_stage(out, (ori_h // sf, ori_w // sf), mode3)
            out = _blur_stage(out, sinc)
            out = _jpeg_stage(out, q2)
        else:
            out = _jpeg_stage(out, q2)
            out = _resize_stage(out, (ori_h // sf, ori_w // sf), mode3)
            out = _blur_stage(out, sinc)

        if cfg.resize_back:
            out = _resize_stage(out, (ori_h, ori_w), "bicubic_torch")

        lq = jnp.clip(jnp.round(jnp.clip(out, 0, 1) * 255.0), 0, 255) / 255.0

        # paired crop, [-1,1], NaN scrub (trainer.py:679-682)
        temp_sf = sf if not cfg.resize_back else 1
        gt_c, lq_c = paired_random_crop(rng, gt, lq, cfg.gt_size, temp_sf)
        lq_c = jnp.nan_to_num((lq_c - 0.5) / 0.5)
        gt_c = jnp.nan_to_num((gt_c - 0.5) / 0.5)

        return self._queue_swap(rng, {"gt": np.asarray(gt_c), "lq": np.asarray(lq_c)})

    # ---------------- training pair pool (trainer.py:487-524) -------------

    def _queue_swap(self, rng: np.random.Generator, batch: dict) -> dict:
        b = batch["lq"].shape[0]
        qsize = self.cfg.queue_size or b * 10
        if qsize <= 0:
            return batch
        assert qsize % b == 0
        if self._queue is None:
            self._queue = {k: np.zeros((qsize,) + v.shape[1:], v.dtype)
                           for k, v in batch.items()}
            self._queue_ptr = 0
        if self._queue_ptr == qsize:  # full: shuffle, swap first b
            idx = rng.permutation(qsize)
            for k in self._queue:
                self._queue[k] = self._queue[k][idx]
            out = {k: self._queue[k][:b].copy() for k in self._queue}
            for k in self._queue:
                self._queue[k][:b] = batch[k]
            return out
        for k in self._queue:
            self._queue[k][self._queue_ptr:self._queue_ptr + b] = batch[k]
        self._queue_ptr += b
        return batch
