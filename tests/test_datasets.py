"""Dataset layer tests — run against the reference's bundled testdata
(read-only) plus synthetic folders."""

import numpy as np
import pytest

from resshift_tpu.data.datasets import (BaseData, BicubicData, DataLoader,
                                        InpaintingData, InpaintingValData,
                                        RealESRGANData, create_dataset)
from resshift_tpu.data.masks import MixedMaskGenerator
from resshift_tpu.ops.resize import imresize_matlab
from resshift_tpu.utils.image_io import imread

TD = "/root/reference/testdata"


def test_base_data_paired():
    ds = create_dataset({"type": "base", "params": {
        "dir_path": f"{TD}/Bicubicx4/lq_matlab", "extra_dir_path": f"{TD}/Bicubicx4/gt",
        "transform_kwargs": {"mean": 0.5, "std": 0.5}, "need_path": True}})
    assert len(ds) == 16
    item = ds[0]
    assert item["lq"].shape[2] == 3 and item["gt"].shape[2] == 3
    assert item["gt"].shape[0] == item["lq"].shape[0] * 4
    assert -1.0 <= item["lq"].min() and item["lq"].max() <= 1.0
    assert "path" in item


def test_matlab_bicubic_lq_matches_bundled_testdata():
    """The bundled lq_matlab images were produced by MATLAB imresize — our
    imresize_matlab on the GT must reproduce them to ~quantization error."""
    ds = BaseData(dir_path=f"{TD}/Bicubicx4/gt", need_path=True)
    p = ds.paths[0]
    gt = imread(p)
    from pathlib import Path

    lq_ref = imread(Path(f"{TD}/Bicubicx4/lq_matlab") / Path(p).name)
    lq_mine = np.clip(imresize_matlab(gt, 0.25), 0, 1)
    err = np.abs(lq_mine - lq_ref).max()
    assert err < 3 / 255.0, f"max err {err * 255:.2f}/255"
    # mean abs error well below one quantization step
    assert np.abs(lq_mine - lq_ref).mean() < 0.6 / 255.0


def test_realesrgan_data_kernels(tmp_path):
    ds = RealESRGANData(dir_paths=[f"{TD}/Bicubicx4/gt"], gt_size=64,
                        rescale_gt=True, seed=1)
    item = ds[0]
    assert item["gt"].shape == (64, 64, 3)
    assert item["kernel1"].shape == (21, 21)
    assert item["kernel2"].shape == (15, 15)
    assert item["sinc_kernel"].shape == (15, 15)
    for k in ("kernel1", "kernel2", "sinc_kernel"):
        np.testing.assert_allclose(item[k].sum(), 1.0, rtol=1e-4)


def test_bicubic_data():
    ds = BicubicData(source_path=f"{TD}/Bicubicx4/gt",
                     degrade_kwargs={"scale": 0.25, "pch_size": 128}, seed=2)
    item = ds[0]
    assert item["gt"].shape == (128, 128, 3)
    assert item["lq"].shape == (32, 32, 3)


def test_inpainting_train_and_val():
    ds = InpaintingData(dir_path=f"{TD}/Bicubicx4/gt", pch_size=128, seed=3,
                        mask_kwargs={"irregular_proba": 1,
                                     "irregular_kwargs": {"max_len": 50, "max_width": 30,
                                                          "max_times": 3, "min_times": 1},
                                     "box_proba": 1, "outpainting_proba": 1})
    item = ds[0]
    assert item["gt"].shape == (128, 128, 3)
    assert item["mask"].shape == (128, 128, 1)
    # masked area of lq == -(mean/std) = -1
    m = item["mask"][..., 0] > 0
    if m.any():
        np.testing.assert_allclose(item["lq"][m], -1.0, atol=1e-6)

    vds = InpaintingValData(lq_path=f"{TD}/inpainting/imagenet/lq",
                            gt_path=f"{TD}/inpainting/imagenet/gt",
                            mask_path=f"{TD}/inpainting/imagenet/mask",
                            im_exts="JPEG")
    item = vds[0]
    assert set(item) >= {"lq", "gt", "mask"}
    assert item["mask"].shape[-1] == 1


def test_mask_generator_families():
    rng = np.random.default_rng(0)
    gen = MixedMaskGenerator(rng=rng, irregular_proba=1, box_proba=1,
                             outpainting_proba=1, half_proba=1, expand_proba=1,
                             superres_proba=1, alterline_proba=1)
    for _ in range(20):
        m = gen((64, 64))
        assert m.shape == (64, 64, 1)
        assert set(np.unique(m)).issubset({0.0, 1.0})


def test_dataloader_shard_and_batch():
    ds = BaseData(dir_path=f"{TD}/Bicubicx4/lq_matlab")
    dl0 = DataLoader(ds, batch_size=2, shuffle=True, seed=7, shard_id=0, num_shards=2,
                     prefetch=0)
    dl1 = DataLoader(ds, batch_size=2, shuffle=True, seed=7, shard_id=1, num_shards=2,
                     prefetch=0)
    b0 = list(dl0)
    b1 = list(dl1)
    assert len(b0) == len(b1) == 4  # 16 imgs / 2 shards / bs 2
    assert b0[0]["lq"].shape[0] == 2
    # shards see disjoint items: check by pixel sums
    s0 = {float(b["lq"].sum()) for b in b0}
    s1 = {float(b["lq"].sum()) for b in b1}
    assert not (s0 & s1)
    # prefetch path yields identical batches
    dl0p = DataLoader(ds, batch_size=2, shuffle=True, seed=7, shard_id=0, num_shards=2,
                      prefetch=2)
    b0p = list(dl0p)
    np.testing.assert_array_equal(b0[0]["lq"], b0p[0]["lq"])
    # threaded item fetch (num_workers) preserves batch content and order
    dl0w = DataLoader(ds, batch_size=2, shuffle=True, seed=7, shard_id=0, num_shards=2,
                      prefetch=2, num_workers=3)
    b0w = list(dl0w)
    assert len(b0w) == len(b0)
    for a, b in zip(b0, b0w):
        np.testing.assert_array_equal(a["lq"], b["lq"])


def test_dataloader_workers_stochastic_deterministic():
    """num_workers>0 on an rng-drawing dataset (whose generator is aliased
    by the mask generator) is reproducible: per-worker dataset copies with
    in-place-reseeded generators + round-robin assignment."""
    from resshift_tpu.data.datasets import InpaintingData

    def make():
        ds = InpaintingData(dir_path=f"{TD}/Bicubicx4/gt", pch_size=64, seed=3,
                            mask_kwargs={"irregular_proba": 1,
                                         "irregular_kwargs": {"max_len": 20,
                                                              "max_width": 10,
                                                              "max_times": 2,
                                                              "min_times": 1}},
                            transform_type="crop_flip")
        return DataLoader(ds, batch_size=4, shuffle=True, seed=11,
                          prefetch=0, num_workers=2)

    run1 = list(make())
    run2 = list(make())
    assert len(run1) == len(run2) >= 2
    for a, b in zip(run1, run2):
        np.testing.assert_array_equal(a["lq"], b["lq"])
        np.testing.assert_array_equal(a["mask"], b["mask"])
    # masks are actually stochastic per item (not all equal)
    m = run1[0]["mask"]
    assert not np.array_equal(m[0], m[1]) or not np.array_equal(m[0], m[2])


def test_dataloader_workers_released():
    """Worker threads/dataset copies are released by close() and by GC
    (repeated loader construction must not leak threads)."""
    import gc
    import threading as _th

    ds = BaseData(dir_path=f"{TD}/Bicubicx4/lq_matlab")

    dl = DataLoader(ds, batch_size=2, shuffle=False, prefetch=0, num_workers=3)
    next(iter(dl))
    assert dl._pool is not None
    dl.close()
    assert dl._pool is None and dl._workers is None
    # closed loader still works (workers lazily rebuilt)
    next(iter(dl))
    dl.close()

    before = _th.active_count()
    for _ in range(4):
        dl = DataLoader(ds, batch_size=2, shuffle=False, prefetch=0,
                        num_workers=3)
        next(iter(dl))
        del dl
        gc.collect()
    # allow executor threads a moment to exit after shutdown(wait=False)
    import time
    for _ in range(50):
        if _th.active_count() <= before + 3:
            break
        time.sleep(0.05)
    assert _th.active_count() <= before + 3  # no 12-thread accumulation


def test_dataloader_infinite_skip_replays_stream():
    """`infinite(skip_batches=n)` fast-forwards the deterministic index
    stream exactly (resume support): batch n+k of the skipped iterator
    equals batch n+k of an uninterrupted one, across epoch boundaries."""
    ds = BaseData(dir_path=f"{TD}/Bicubicx4/lq_matlab")  # deterministic items
    mk = lambda: DataLoader(ds, batch_size=4, shuffle=True, seed=5, prefetch=0)

    ref = mk().infinite()
    full = [next(ref)["lq"] for _ in range(10)]  # 16 imgs/4 = 4 batches/epoch
    for skip in (1, 3, 4, 7):  # within epoch, at boundary, across epochs
        it = mk().infinite(skip_batches=skip)
        got = [next(it)["lq"] for _ in range(3)]
        for k in range(3):
            np.testing.assert_array_equal(got[k], full[skip + k])


def test_face_degradation_testing():
    from resshift_tpu.data.faces import face_degradation

    im = imread(f"{TD}/Bicubicx4/gt/" +
                sorted(__import__('os').listdir(f"{TD}/Bicubicx4/gt"))[0])
    lq = face_degradation(im, sf=4, sig_x=2.0, sig_y=1.0, theta=0.5, nf=10, qf=60)
    assert lq.shape == im.shape
    assert 0 <= lq.min() and lq.max() <= 1
    assert np.abs(lq - im).mean() > 0.005  # actually degraded


def test_bsrgan_light_degradation():
    from resshift_tpu.data.bsrgan import degradation_bsrgan_light

    rng = np.random.default_rng(11)
    im = imread(sorted(__import__('pathlib').Path(f"{TD}/Bicubicx4/gt").glob("*.png"))[0])
    for _ in range(5):  # exercise several shuffled orders
        lq, gt = degradation_bsrgan_light(rng, im, sf=4)
        assert gt.shape == im.shape
        assert lq.shape[0] == im.shape[0] // 4 and lq.shape[1] == im.shape[1] // 4
        assert np.isfinite(lq).all() and 0 <= lq.min() and lq.max() <= 1


def test_bsrgan_dataset_and_factory():
    ds = create_dataset({"type": "bsrgan", "params": {
        "dir_path": f"{TD}/Bicubicx4/gt", "sf": 4, "gt_size": 128,
        "transform_kwargs": {"mean": 0.5, "std": 0.5}}})
    item = ds[0]
    assert item["gt"].shape == (128, 128, 3)
    assert item["lq"].shape == (32, 32, 3)


def test_bsrgan_full_degradation():
    """Full (non-light) chain: bsrgan_light.py:466-560 — paired random crop
    to lq_patchsize, heavier noise band, two blur slots, size guard."""
    import pytest

    from resshift_tpu.data.bsrgan import degradation_bsrgan, degradation_bsrgan_light

    rng = np.random.default_rng(7)
    im = imread(sorted(__import__('pathlib').Path(f"{TD}/Bicubicx4/gt").glob("*.png"))[0])
    for _ in range(5):  # several shuffled orders
        lq, gt = degradation_bsrgan(rng, im, sf=4, lq_patchsize=48)
        assert lq.shape == (48, 48, 3)
        assert gt.shape == (192, 192, 3)
        assert np.isfinite(lq).all() and 0 <= lq.min() and lq.max() <= 1
        assert np.isfinite(gt).all()
    # size guard (bsrgan_light.py:487-488)
    with pytest.raises(ValueError, match="too small"):
        degradation_bsrgan(rng, im[:64, :64], sf=4, lq_patchsize=48)
    # heavier degradation than the light chain: noise band (2,8) vs (1,2)
    # and a second blur slot -> larger expected deviation from bicubic LQ,
    # checked in aggregate over several draws
    from resshift_tpu.ops.resize import imresize_matlab

    def mean_dev(fn, n=6):
        r = np.random.default_rng(3)
        tot = 0.0
        for _ in range(n):
            lq, hq = fn(r)
            ref = np.clip(imresize_matlab(hq, 1 / 4), 0, 1)
            tot += np.abs(lq - ref[:lq.shape[0], :lq.shape[1]]).mean()
        return tot / n

    full = mean_dev(lambda r: degradation_bsrgan(r, im, sf=4,
                                                 lq_patchsize=im.shape[0] // 4))
    light = mean_dev(lambda r: degradation_bsrgan_light(r, im, sf=4))
    assert full > 0.8 * light  # both real degradations, full not milder


def test_bsrgan_dataset_full_selector():
    """`degradation='bsrgan'` selector (datapipe/datasets.py:246-251)."""
    import pytest

    ds = create_dataset({"type": "bsrgan", "params": {
        "dir_path": f"{TD}/Bicubicx4/gt", "sf": 4, "gt_size": 128,
        "degradation": "bsrgan",
        "transform_kwargs": {"mean": 0.5, "std": 0.5}}})
    item = ds[0]
    assert item["gt"].shape == (128, 128, 3)
    assert item["lq"].shape == (32, 32, 3)
    with pytest.raises(ValueError, match="bsrgan"):
        create_dataset({"type": "bsrgan", "params": {
            "dir_path": f"{TD}/Bicubicx4/gt", "degradation": "nope",
            "transform_kwargs": {"mean": 0.5, "std": 0.5}}})


def test_deg_from_source():
    from resshift_tpu.data.datasets import DegradedDataFromSource

    ds = DegradedDataFromSource(
        source_path=f"{TD}/Bicubicx4/gt",
        degrade_fn=lambda rng, im: (im[::4, ::4], im))
    item = ds[0]
    assert item["gt"].shape[0] == item["lq"].shape[0] * 4


def test_prepare_testing_scripts(tmp_path):
    from resshift_tpu import scripts

    scripts.prepare_testing_celeba_faceir(
        f"{TD}/Bicubicx4/gt", str(tmp_path / "faceir"), sf=4, num_images=2, seed=0)
    assert len(list((tmp_path / "faceir" / "lq").glob("*.png"))) == 2
    assert len(list((tmp_path / "faceir" / "gt").glob("*.png"))) == 2

    scripts.prepare_testing_imagenet_sr(
        f"{TD}/Bicubicx4/gt", str(tmp_path / "sr"), num_images=2, seed=0)
    assert len(list((tmp_path / "sr" / "lq").glob("*.png"))) == 2


def test_transform_registry():
    """get_transforms API parity (reference datapipe/datasets.py:50-121):
    all 8 types exist and produce the reference's shapes/normalization."""
    import numpy as np

    from resshift_tpu.data.transforms import get_transforms

    rng = np.random.default_rng(0)
    im = rng.uniform(0, 1, (40, 48, 3)).astype(np.float32)

    t = get_transforms("default", {"mean": 0.5, "std": 0.5})
    out = t(im)
    np.testing.assert_allclose(out, im * 2 - 1, atol=1e-6)

    out = get_transforms("bicubic_norm", {"scale": 0.5})(im)
    assert out.shape == (20, 24, 3) and out.min() >= -1 - 1e-6

    out = get_transforms("bicubic_back_norm", {"scale": 0.5})(im)
    assert out.shape == im.shape

    out = get_transforms("resize_ccrop_norm", {"size": 32})(im)
    assert out.shape == (32, 32, 3)

    out = get_transforms("rcrop_aug_norm", {"pch_size": 16})(
        im, np.random.default_rng(1))
    assert out.shape == (16, 16, 3)

    out = get_transforms("aug_norm", {"only_hflip": True})(
        im, np.random.default_rng(2))
    assert out.shape == im.shape

    out = get_transforms("lama_distortions", {"pch_size": 32})(
        (im * 255).astype(np.uint8), np.random.default_rng(3))
    assert out.shape == (32, 32, 3) and 0 <= out.min() and out.max() <= 1

    out = get_transforms("rgb2gray", {})(im)
    assert out.shape == im.shape
    np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-6)

    import pytest

    with pytest.raises(ValueError):
        get_transforms("nope", {})
