"""Full lama_distortions transform (reference datapipe/datasets.py:22-48):
shape/dtype contracts, distribution moments, and inpainting-dataset wiring."""

import numpy as np

from resshift_tpu.data.distortions import (LamaDistortions, _affine,
                                           _brightness_contrast, _clahe,
                                           _hsv_jitter, _optical_distortion,
                                           _pad_if_needed, _perspective,
                                           _smallest_max_size)


def _im(h=300, w=220, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish natural-like image
    base = rng.uniform(40, 215, (h // 10 + 1, w // 10 + 1, 3))
    import cv2

    return cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC).astype(np.uint8)


def test_shapes_and_range():
    tr = LamaDistortions(pch_size=128)
    rng = np.random.default_rng(0)
    for seed in range(5):
        out = tr(_im(seed=seed), np.random.default_rng(seed))
        assert out.shape == (128, 128, 3)
        assert out.dtype == np.float32
        assert 0.0 <= out.min() and out.max() <= 1.0


def test_ops_preserve_shape_and_are_nontrivial():
    im = _im(128, 128)
    rng = np.random.default_rng(1)
    for op in (_perspective, _affine, _optical_distortion, _clahe,
               _brightness_contrast, _hsv_jitter):
        out = op(im, rng)
        assert out.shape == im.shape and out.dtype == np.uint8
    # geometric ops actually move pixels
    assert np.abs(_affine(im, np.random.default_rng(2)).astype(int) - im).mean() > 1


def test_smallest_max_size_and_pad():
    im = _im(100, 60)
    out = _smallest_max_size(im, 128)
    assert min(out.shape[:2]) == 128
    padded = _pad_if_needed(_im(100, 100), 128)
    assert padded.shape[:2] == (128, 128)


def test_distribution_moments():
    """The photometric stack keeps the global statistics in a sane band:
    mean within +-25% brightness shift, std positive; geometric ops keep the
    value histogram support."""
    tr = LamaDistortions(pch_size=96)
    im = _im(200, 200)
    src_mean = im.mean() / 255.0
    means, stds = [], []
    for seed in range(24):
        out = tr(im, np.random.default_rng(seed))
        means.append(out.mean())
        stds.append(out.std())
    assert abs(np.mean(means) - src_mean) < 0.1  # centered on the source
    assert np.std(means) > 0.005                 # jitter actually varies
    assert min(stds) > 0.01


def test_determinism_per_rng():
    tr = LamaDistortions(pch_size=64)
    im = _im(150, 150)
    a = tr(im, np.random.default_rng(7))
    b = tr(im, np.random.default_rng(7))
    np.testing.assert_array_equal(a, b)
    c = tr(im, np.random.default_rng(8))
    assert np.abs(a - c).max() > 0


def test_inpainting_dataset_uses_distortions(tmp_path):
    import cv2

    from resshift_tpu.data.datasets import create_dataset

    d = tmp_path / "ims"
    d.mkdir()
    for i in range(2):
        cv2.imwrite(str(d / f"x{i}.png"), _im(seed=i))

    ds = create_dataset(dict(type="inpainting", params=dict(
        dir_path=str(d), pch_size=64,
        mask_kwargs=dict(irregular_proba=1.0),
        transform_type="lama_distortions")))
    item = ds[0]
    assert item["gt"].shape == (64, 64, 3)
    assert item["lq"].shape == (64, 64, 3)
    assert ds.distort is not None
    # masked region carries the -(mean/std) fill
    m = item["mask"] * 0.5 + 0.5
    if m.max() > 0:
        sel = m[..., 0] > 0.5
        np.testing.assert_allclose(item["lq"][sel],
                                   item["gt"][sel] * 0 - 1.0, atol=1e-5)
