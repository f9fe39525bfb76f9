"""Face degradation pipelines (host, cv2+numpy).

Parity targets:
  * GFPGAN-style training degradation — `datapipe/ffhq_degradation_dataset.py`
    (:31-221, with the faceir config's live options: mixed-kernel blur,
    downsample [0.8,32], Gaussian noise, cv2 JPEG, resize back, gray prob
    + gt_gray, color jitter hooks);
  * deterministic testing degradation — `datapipe/face_degradation_testing.py`
    (:11-51).
"""

from __future__ import annotations

import math

import cv2
import numpy as np

from . import degradations as deg

__all__ = ["ffhq_degrade", "face_degradation"]


def _add_gaussian_noise_np(rng, img, sigma):
    noise = rng.standard_normal(img.shape).astype(np.float32) * sigma / 255.0
    return np.clip(img + noise, 0, 1)


def _jpeg_np(img, quality):
    """cv2 JPEG round-trip on [0,1] RGB (degradations.py:731-764)."""
    param = [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)]
    bgr = cv2.cvtColor((np.clip(img, 0, 1) * 255.0).astype(np.uint8), cv2.COLOR_RGB2BGR)
    _, enc = cv2.imencode(".jpg", bgr, param)
    dec = cv2.imdecode(enc, 1)
    return cv2.cvtColor(dec, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def color_jitter(rng, img, shift):
    jitter = rng.uniform(-shift, shift, 3).astype(np.float32)
    return np.clip(img + jitter, 0, 1)


def ffhq_degrade(
    rng: np.random.Generator,
    img_gt: np.ndarray,  # HWC RGB [0,1]
    *,
    blur_kernel_size: int = 41,
    kernel_list=("iso", "aniso"),
    kernel_prob=(0.5, 0.5),
    blur_sigma=(0.1, 15),
    downsample_range=(0.8, 32),
    noise_range=(0, 20),
    jpeg_range=(30, 100),
    color_jitter_prob: float | None = None,
    color_jitter_shift: float = 20 / 255.0,
    gray_prob: float | None = 0.01,
    gt_gray: bool = True,
):
    """Returns (gt, lq) both HWC RGB [0,1]."""
    h, w, _ = img_gt.shape
    kernel = deg.random_mixed_kernels(
        rng, list(kernel_list), list(kernel_prob), blur_kernel_size,
        blur_sigma, blur_sigma, (-math.pi, math.pi),
    )
    lq = cv2.filter2D(img_gt, -1, kernel)
    scale = rng.uniform(*downsample_range)
    lq = cv2.resize(lq, (int(w // scale), int(h // scale)), interpolation=cv2.INTER_LINEAR)
    if noise_range is not None:
        lq = _add_gaussian_noise_np(rng, lq, rng.uniform(*noise_range))
    if jpeg_range is not None:
        lq = _jpeg_np(lq, rng.uniform(*jpeg_range))
    lq = cv2.resize(lq, (w, h), interpolation=cv2.INTER_LINEAR)

    if color_jitter_prob is not None and rng.uniform() < color_jitter_prob:
        lq = color_jitter(rng, lq, color_jitter_shift)
    if gray_prob and rng.uniform() < gray_prob:
        lq = cv2.cvtColor(lq, cv2.COLOR_RGB2GRAY)
        lq = np.tile(lq[:, :, None], (1, 1, 3))
        if gt_gray:
            img_gt = cv2.cvtColor(img_gt, cv2.COLOR_RGB2GRAY)
            img_gt = np.tile(img_gt[:, :, None], (1, 1, 3))

    lq = np.clip((lq * 255.0).round(), 0, 255) / 255.0
    return img_gt.astype(np.float32), lq.astype(np.float32)


def face_degradation(im: np.ndarray, sf: float, sig_x: float, sig_y: float,
                     theta: float, nf: float, qf: float,
                     rng: np.random.Generator | None = None) -> np.ndarray:
    """Deterministic-parameter test-set degradation
    (face_degradation_testing.py:11-51). im: HWC RGB [0,1]."""
    rng = rng or np.random.default_rng(0)
    h, w = im.shape[:2]
    kernel = deg.bivariate_gaussian(41, sig_x, sig_y, theta, isotropic=False)
    lq = cv2.filter2D(im, -1, kernel.astype(np.float32))
    lq = cv2.resize(lq, (int(w // sf), int(h // sf)), interpolation=cv2.INTER_LINEAR)
    lq = _add_gaussian_noise_np(rng, lq, nf)
    lq = _jpeg_np(lq, qf)
    lq = cv2.resize(lq, (w, h), interpolation=cv2.INTER_LINEAR)
    return np.clip((lq * 255.0).round(), 0, 255) / 255.0
