"""Training-usability wiring tests:

  * pretrained checkpoint loading into Trainer (`model.ckpt_path` /
    `autoencoder.ckpt_path` — reference trainer.py:204-234,444-469);
  * LPIPS trainer variant selection + loss metric (trainer.py:952-988);
  * convert_lpips against the full `lpips.LPIPS(net='vgg')` state_dict
    layout (net.slice{s}.{idx} keys);
  * per-host RNG decorrelation (reference rank-offset seeding,
    trainer.py:66-79);
  * train image grids + validation progressive strips on disk
    (trainer.py:379-418,898-938).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from resshift_tpu.train_loop import Trainer, iteration_key
from test_train_loop import tiny_train_config

TD = "/root/reference/testdata"


# ---------------------------------------------------------------- ckpts

def _tiny_torch_models():
    from ref_loader import load_reference

    RefUNet, RefVQ = load_reference()
    torch.manual_seed(0)
    unet = RefUNet(image_size=16, in_channels=3, model_channels=32,
                   out_channels=3, num_res_blocks=[1, 1],
                   attention_resolutions=[16, 8], channel_mult=[1, 2],
                   num_head_channels=16, use_scale_shift_norm=True,
                   resblock_updown=False, swin_depth=2, swin_embed_dim=32,
                   window_size=4, mlp_ratio=2, cond_lq=True, lq_size=16,
                   dropout=0, conv_resample=True, dims=2, use_fp16=False)
    vq = RefVQ(ddconfig=dict(double_z=False, z_channels=3, resolution=64,
                             in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2, 4],
                             num_res_blocks=1, attn_resolutions=[], dropout=0.0),
               n_embed=64, embed_dim=3)
    return unet, vq


def test_trainer_loads_pretrained_torch_ckpts(tmp_path):
    """Finetune from converted torch checkpoints: the VQGAN must stay equal
    to the converted weights (frozen), the UNet must start from them and
    then move."""
    unet, vq = _tiny_torch_models()
    up, vp = tmp_path / "unet.pth", tmp_path / "vq.pth"
    torch.save({"state_dict": unet.state_dict()}, up)
    torch.save({"state_dict": vq.state_dict()}, vp)

    cfg = tiny_train_config("bicubic", iterations=2)
    cfg["model"]["ckpt_path"] = str(up)
    cfg["autoencoder"]["ckpt_path"] = str(vp)
    tr = Trainer(cfg, save_dir=str(tmp_path / "run"), seed=0)

    want_unet = tr.pipe.load_unet_checkpoint(str(up))
    want_vq = tr.pipe.load_vqgan_checkpoint(str(vp))
    # init equals the converted torch weights
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.params),
                    jax.tree_util.tree_leaves(want_unet)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    state = tr.train()
    # UNet moved (finetuned), frozen VQGAN untouched
    deltas = [float(jnp.abs(a - b).max()) for a, b in
              zip(jax.tree_util.tree_leaves(state.params),
                  jax.tree_util.tree_leaves(want_unet))]
    assert max(deltas) > 0
    for a, b in zip(jax.tree_util.tree_leaves(tr.vq_params),
                    jax.tree_util.tree_leaves(want_vq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_loads_native_ckpt(tmp_path):
    """orbax param checkpoints work for both ckpt_path keys."""
    from resshift_tpu.checkpoint import save_params
    from resshift_tpu.pipeline import ResShiftPipeline

    cfg = tiny_train_config("bicubic", iterations=1)
    pipe = ResShiftPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(7))
    save_params(tmp_path / "native", params)

    cfg2 = tiny_train_config("bicubic", iterations=1)
    cfg2["model"]["ckpt_path"] = str(tmp_path / "native")
    cfg2["autoencoder"]["ckpt_path"] = str(tmp_path / "native")
    tr = Trainer(cfg2, save_dir=str(tmp_path / "run"), seed=1)
    a = jax.tree_util.tree_leaves(tr.state.params)[0]
    b = jax.tree_util.tree_leaves(params["unet"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    va = jax.tree_util.tree_leaves(tr.vq_params)[0]
    vb = jax.tree_util.tree_leaves(params["vqgan"])[0]
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


# ---------------------------------------------------------------- LPIPS

def test_lpips_trainer_variant(tmp_path):
    """`trainer: difir_lpips` builds the frozen LPIPS and the loss shows up
    in the metrics (TrainerDifIRLPIPS, trainer.py:952-988)."""
    cfg = tiny_train_config("bicubic", iterations=2)
    cfg["trainer"] = "difir_lpips"
    cfg["train"]["loss_coef"] = [1.0, 1.0]
    tr = Trainer(cfg, save_dir=str(tmp_path), seed=0)
    assert tr.lpips_fn is not None
    tr.train()
    import json

    log = (tmp_path / "train_log.jsonl").read_text().strip().splitlines()
    m = json.loads(log[-1])
    assert "lpips" in m and np.isfinite(m["lpips"])


def test_convert_lpips_full_package_layout():
    """The one-arg converter accepts the actual lpips.LPIPS(net='vgg')
    state_dict key layout: net.slice{1-5}.{torchvision idx}.weight +
    lin{i}.model.1.weight."""
    from resshift_tpu.models.lpips import LPIPS, convert_lpips

    torch.manual_seed(1)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
           512, 512, 512, "M"]
    slices = ((0, 4), (4, 9), (9, 16), (16, 23), (23, 30))
    full = {}
    in_ch, seq_idx = 3, 0
    flat_sd = {}
    for v in cfg:
        if v == "M":
            seq_idx += 1
            continue
        w = torch.randn(v, in_ch, 3, 3) * 0.05
        b = torch.randn(v) * 0.05
        flat_sd[f"{seq_idx}.weight"], flat_sd[f"{seq_idx}.bias"] = w, b
        s = next(i for i, (lo, hi) in enumerate(slices) if lo <= seq_idx < hi) + 1
        full[f"net.slice{s}.{seq_idx}.weight"] = w
        full[f"net.slice{s}.{seq_idx}.bias"] = b
        in_ch = v
        seq_idx += 2
    for i, c in enumerate((64, 128, 256, 512, 512)):
        lw = torch.rand(1, c, 1, 1)
        full[f"lin{i}.model.1.weight"] = lw
        flat_sd[f"lin{i}.model.1.weight"] = lw
    full["scaling_layer.shift"] = torch.zeros(1, 3, 1, 1)
    full["scaling_layer.scale"] = torch.ones(1, 3, 1, 1)

    p_full = convert_lpips(full)
    p_two = convert_lpips(flat_sd, flat_sd)
    fa = {jax.tree_util.keystr(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(p_full)}
    fb = {jax.tree_util.keystr(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(p_two)}
    assert sorted(fa) == sorted(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k])

    # converted params drive the model
    model = LPIPS()
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)),
                    jnp.float32)
    out = model.apply({"params": p_full}, x, -x)
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------------------------ RNG

def test_iteration_key_rank_offset():
    k0 = iteration_key(123, 10, process_index=0)
    k1 = iteration_key(123, 10, process_index=1)
    assert not np.array_equal(np.asarray(k0), np.asarray(k1))
    # deterministic per (seed, it, rank)
    np.testing.assert_array_equal(np.asarray(k0),
                                  np.asarray(iteration_key(123, 10, 0)))


def test_degradation_differs_across_hosts():
    """Two hosts degrade the same raw batch differently (reference
    trainer.py:66-79 per-rank seeding)."""
    from resshift_tpu.data.realesrgan import (DegradationConfig,
                                              RealESRGANDegrader)
    from resshift_tpu.data.datasets import create_dataset

    ds = create_dataset(dict(type="realesrgan", params=dict(
        dir_paths=[f"{TD}/Bicubicx4/gt"], gt_size=128, rescale_gt=True)))
    items = [ds[0], ds[1]]
    raw = {k: (np.stack([it[k] for it in items])
               if not isinstance(items[0][k], str) else [it[k] for it in items])
           for k in items[0]}
    deg = RealESRGANDegrader(DegradationConfig(sf=4, gt_size=64, queue_size=4))
    outs = []
    for rank in (0, 1):
        rng = np.random.default_rng(0 + rank)
        key = jax.random.fold_in(iteration_key(0, 0, rank), 1)
        outs.append(deg(rng, key, {k: np.array(v) if not isinstance(v, list)
                                   else v for k, v in raw.items()}))
    d = np.abs(np.asarray(outs[0]["lq"]) - np.asarray(outs[1]["lq"])).max()
    assert d > 1e-4


# ------------------------------------------------------- image logging

def test_train_grids_and_val_progressive(tmp_path):
    """Image-logging parity: lq/gt/x_t/x0-pred train grids at log_freq[1]
    and a progressive strip + LPIPS during validation."""
    import cv2

    lqd, gtd = tmp_path / "lq", tmp_path / "gt"
    lqd.mkdir(), gtd.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(str(lqd / f"im{i}.png"),
                    rng.integers(0, 255, (16, 16, 3), dtype=np.uint8))
        cv2.imwrite(str(gtd / f"im{i}.png"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))

    cfg = tiny_train_config("bicubic", iterations=2)
    cfg["trainer"] = "difir_lpips"
    cfg["train"]["log_freq"] = [2, 2]
    cfg["train"]["val_freq"] = 2
    cfg["data"]["val"] = dict(type="base", params=dict(
        dir_path=str(lqd), extra_dir_path=str(gtd)))
    tr = Trainer(cfg, save_dir=str(tmp_path / "run"), seed=0)
    tr.train()

    tdir = tmp_path / "run" / "images" / "train"
    vdir = tmp_path / "run" / "images" / "val"
    for name in ("lq", "gt", "xt", "x0pred"):
        assert list(tdir.glob(f"{name}_*.png")), f"missing train grid {name}"
    assert list(vdir.glob("progress_*.png")), "missing progressive strip"
    assert list(vdir.glob("val_*.png"))
