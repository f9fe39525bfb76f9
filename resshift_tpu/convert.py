"""PyTorch -> JAX checkpoint conversion.

Maps the reference's released `.pth` state_dicts (UNetModelSwin denoisers,
VQGAN f4/f8 autoencoders — see inference_resshift.py:15-35 for the registry)
onto this framework's Flax param pytrees.

The key walk mirrors the reference's module construction order
(models/unet.py:632-863, ldm/modules/diffusionmodules/model.py:452-660), so
the mapping is purely mechanical:
  * Conv2d  OIHW -> HWIO `kernel`
  * Linear  (out,in) -> (in,out) `kernel`
  * 1x1 Conv2d used as a channel MLP -> Dense `kernel`
  * GroupNorm weight/bias -> scale/bias
Handles the `module.` / `_orig_mod.` checkpoint prefixes the reference
strips in utils/util_net.py:86-98.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Mapping

import numpy as np

try:  # torch is only needed when actually loading .pth files
    import torch
except Exception:  # pragma: no cover
    torch = None

from flax.traverse_util import unflatten_dict

__all__ = ["convert_unet_swin", "convert_vqgan", "load_torch_state_dict"]


def _np(x) -> np.ndarray:
    if torch is not None and isinstance(x, torch.Tensor):
        return x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def _strip_prefixes(sd: Mapping[str, Any]) -> dict[str, Any]:
    out = {}
    for k, v in sd.items():
        for p in ("module.", "_orig_mod."):
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def load_torch_state_dict(path: str) -> dict[str, Any]:
    if torch is None:
        raise RuntimeError("torch is required to load .pth checkpoints")
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return _strip_prefixes(obj)


# ---------------------------------------------------------------- leaf kinds

def _emit(flat: dict, sd: Mapping, tkey: str, fpath: tuple[str, ...], kind: str):
    w = sd.get(f"{tkey}.weight")
    b = sd.get(f"{tkey}.bias")
    if kind == "conv":
        flat[fpath + ("kernel",)] = _np(w).transpose(2, 3, 1, 0)
        if b is not None:
            flat[fpath + ("bias",)] = _np(b)
    elif kind == "linear":
        flat[fpath + ("kernel",)] = _np(w).T
        if b is not None:
            flat[fpath + ("bias",)] = _np(b)
    elif kind == "dense1x1":
        flat[fpath + ("kernel",)] = _np(w)[:, :, 0, 0].T
        if b is not None:
            flat[fpath + ("bias",)] = _np(b)
    elif kind == "gn":
        flat[fpath + ("scale",)] = _np(w)
        flat[fpath + ("bias",)] = _np(b)
    elif kind == "raw":
        flat[fpath] = _np(sd[tkey])
    else:  # pragma: no cover
        raise ValueError(kind)


def _map_resblock(flat, sd, t: str, f: tuple[str, ...]):
    _emit(flat, sd, f"{t}.in_layers.0", f + ("in_norm",), "gn")
    _emit(flat, sd, f"{t}.in_layers.2", f + ("in_conv",), "conv")
    _emit(flat, sd, f"{t}.emb_layers.1", f + ("emb_proj",), "linear")
    _emit(flat, sd, f"{t}.out_layers.0", f + ("out_norm",), "gn")
    _emit(flat, sd, f"{t}.out_layers.3", f + ("out_conv",), "conv")
    if f"{t}.skip_connection.weight" in sd:
        _emit(flat, sd, f"{t}.skip_connection", f + ("skip_connection",), "conv")


def _map_basiclayer(flat, sd, t: str, f: tuple[str, ...], depth: int):
    _emit(flat, sd, f"{t}.patch_embed.proj", f + ("patch_embed_proj",), "conv")
    if f"{t}.patch_embed.norm.weight" in sd:
        _emit(flat, sd, f"{t}.patch_embed.norm", f + ("patch_embed_norm",), "gn")
    for i in range(depth):
        b = f"{t}.blocks.{i}"
        fb = f + (f"block{i}",)
        _emit(flat, sd, f"{b}.norm1", fb + ("norm1",), "gn")
        _emit(flat, sd, f"{b}.attn.relative_position_bias_table",
              fb + ("attn", "relative_position_bias_table"), "raw")
        _emit(flat, sd, f"{b}.attn.qkv", fb + ("attn", "qkv"), "linear")
        _emit(flat, sd, f"{b}.attn.proj", fb + ("attn", "proj"), "linear")
        _emit(flat, sd, f"{b}.norm2", fb + ("norm2",), "gn")
        _emit(flat, sd, f"{b}.mlp.fc1", fb + ("mlp_fc1",), "dense1x1")
        _emit(flat, sd, f"{b}.mlp.fc2", fb + ("mlp_fc2",), "dense1x1")
    _emit(flat, sd, f"{t}.patch_unembed.proj", f + ("patch_unembed_proj",), "conv")
    if f"{t}.patch_unembed.norm.weight" in sd:
        _emit(flat, sd, f"{t}.patch_unembed.norm", f + ("patch_unembed_norm",), "gn")


def convert_unet_swin(
    sd: Mapping[str, Any],
    *,
    image_size: int = 64,
    channel_mult: Iterable[int] = (1, 2, 2, 4),
    num_res_blocks: Iterable[int] | int = (2, 2, 2, 2),
    attention_resolutions: Iterable[int] = (64, 32, 16, 8),
    swin_depth: int = 2,
    cond_lq: bool = True,
    lq_size: int = 64,
    resblock_updown: bool = False,
) -> dict:
    """torch UNetModelSwin state_dict -> flax params for
    :class:`resshift_tpu.models.UNetModelSwin` (same hyperparameters)."""
    sd = _strip_prefixes(sd)
    channel_mult = list(channel_mult)
    nrb = ([num_res_blocks] * len(channel_mult)
           if isinstance(num_res_blocks, int) else list(num_res_blocks))
    attn = set(attention_resolutions)
    flat: dict[tuple[str, ...], np.ndarray] = {}

    _emit(flat, sd, "time_embed.0", ("time_embed_0",), "linear")
    _emit(flat, sd, "time_embed.2", ("time_embed_2",), "linear")

    if cond_lq and lq_size != image_size:
        for ii in range(int(math.log2(lq_size / image_size))):
            _emit(flat, sd, f"feature_extractor.{3 * ii}", (f"fe_conv{ii}",), "conv")
            _emit(flat, sd, f"feature_extractor.{3 * ii + 2}.op",
                  (f"fe_down{ii}", "op"), "conv")

    _emit(flat, sd, "input_blocks.0.0", ("conv_in",), "conv")

    n = 1
    ds = image_size
    for level in range(len(channel_mult)):
        for jj in range(nrb[level]):
            _map_resblock(flat, sd, f"input_blocks.{n}.0", (f"in_l{level}_b{jj}_res",))
            if ds in attn and jj == 0:
                _map_basiclayer(flat, sd, f"input_blocks.{n}.1",
                                (f"in_l{level}_b{jj}_swin",), swin_depth)
            n += 1
        if level != len(channel_mult) - 1:
            if resblock_updown:
                _map_resblock(flat, sd, f"input_blocks.{n}.0", (f"in_l{level}_down",))
            else:
                _emit(flat, sd, f"input_blocks.{n}.0.op", (f"in_l{level}_down", "op"), "conv")
            n += 1
            ds //= 2

    _map_resblock(flat, sd, "middle_block.0", ("mid_res0",))
    _map_basiclayer(flat, sd, "middle_block.1", ("mid_swin",), swin_depth)
    _map_resblock(flat, sd, "middle_block.2", ("mid_res1",))

    n = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(nrb[level] + 1):
            _map_resblock(flat, sd, f"output_blocks.{n}.0", (f"out_l{level}_b{i}_res",))
            j = 1
            if ds in attn and i == 0:
                _map_basiclayer(flat, sd, f"output_blocks.{n}.{j}",
                                (f"out_l{level}_b{i}_swin",), swin_depth)
                j += 1
            if level and i == nrb[level]:
                if resblock_updown:
                    _map_resblock(flat, sd, f"output_blocks.{n}.{j}", (f"out_l{level}_up",))
                else:
                    _emit(flat, sd, f"output_blocks.{n}.{j}.conv",
                          (f"out_l{level}_up", "conv"), "conv")
                ds *= 2
            n += 1

    _emit(flat, sd, "out.0", ("out_norm",), "gn")
    _emit(flat, sd, "out.2", ("out_conv",), "conv")
    return unflatten_dict(flat)


def _map_global_attn(flat, sd, t: str, f: tuple[str, ...]):
    """AttentionBlock (unet.py:224-263): norm + 1-D qkv/proj convs."""
    _emit(flat, sd, f"{t}.norm", f + ("norm",), "gn")
    # Conv1d weight (out, in, 1) -> Dense (in, out)
    for tname, fname in (("qkv", "qkv"), ("proj_out", "proj_out")):
        w = _np(sd[f"{t}.{tname}.weight"])[:, :, 0].T
        flat[f + (fname, "kernel")] = w
        flat[f + (fname, "bias")] = _np(sd[f"{t}.{tname}.bias"])


def convert_unet_plain(
    sd: Mapping[str, Any],
    *,
    image_size: int = 64,
    channel_mult: Iterable[int] = (1, 2, 4, 8),
    num_res_blocks: Iterable[int] | int = 2,
    attention_resolutions: Iterable[int] = (32, 16, 8),
    num_classes: int | None = None,
    resblock_updown: bool = False,
) -> dict:
    """torch UNetModel (guided-diffusion variant, unet.py:346-601)
    state_dict -> flax params for models.unet_variants.UNetModel."""
    sd = _strip_prefixes(sd)
    channel_mult = list(channel_mult)
    nrb = ([num_res_blocks] * len(channel_mult)
           if isinstance(num_res_blocks, int) else list(num_res_blocks))
    attn = set(attention_resolutions)
    flat: dict[tuple[str, ...], np.ndarray] = {}

    _emit(flat, sd, "time_embed.0", ("time_embed_0",), "linear")
    _emit(flat, sd, "time_embed.2", ("time_embed_2",), "linear")
    if num_classes is not None:
        flat[("label_emb", "embedding")] = _np(sd["label_emb.weight"])
    _emit(flat, sd, "input_blocks.0.0", ("conv_in",), "conv")

    n = 1
    ds = image_size
    for level in range(len(channel_mult)):
        for jj in range(nrb[level]):
            _map_resblock(flat, sd, f"input_blocks.{n}.0", (f"in_l{level}_b{jj}_res",))
            if ds in attn:
                _map_global_attn(flat, sd, f"input_blocks.{n}.1",
                                 (f"in_l{level}_b{jj}_attn",))
            n += 1
        if level != len(channel_mult) - 1:
            if resblock_updown:
                _map_resblock(flat, sd, f"input_blocks.{n}.0", (f"in_l{level}_down",))
            else:
                _emit(flat, sd, f"input_blocks.{n}.0.op", (f"in_l{level}_down", "op"), "conv")
            n += 1
            ds //= 2

    _map_resblock(flat, sd, "middle_block.0", ("mid_res0",))
    _map_global_attn(flat, sd, "middle_block.1", ("mid_attn",))
    _map_resblock(flat, sd, "middle_block.2", ("mid_res1",))

    n = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(nrb[level] + 1):
            _map_resblock(flat, sd, f"output_blocks.{n}.0", (f"out_l{level}_b{i}_res",))
            j = 1
            if ds in attn:
                _map_global_attn(flat, sd, f"output_blocks.{n}.{j}",
                                 (f"out_l{level}_b{i}_attn",))
                j += 1
            if level and i == nrb[level]:
                if resblock_updown:
                    _map_resblock(flat, sd, f"output_blocks.{n}.{j}", (f"out_l{level}_up",))
                else:
                    _emit(flat, sd, f"output_blocks.{n}.{j}.conv",
                          (f"out_l{level}_up", "conv"), "conv")
                ds *= 2
            n += 1

    _emit(flat, sd, "out.0", ("out_norm",), "gn")
    _emit(flat, sd, "out.2", ("out_conv",), "conv")
    return unflatten_dict(flat)


# ------------------------------------------------------------------- VQGAN

def _map_ae_resnet(flat, sd, t: str, f: tuple[str, ...]):
    _emit(flat, sd, f"{t}.norm1", f + ("norm1",), "gn")
    _emit(flat, sd, f"{t}.conv1", f + ("conv1",), "conv")
    _emit(flat, sd, f"{t}.norm2", f + ("norm2",), "gn")
    _emit(flat, sd, f"{t}.conv2", f + ("conv2",), "conv")
    if f"{t}.nin_shortcut.weight" in sd:
        _emit(flat, sd, f"{t}.nin_shortcut", f + ("nin_shortcut",), "conv")


def _map_ae_attn(flat, sd, t: str, f: tuple[str, ...]):
    _emit(flat, sd, f"{t}.norm", f + ("norm",), "gn")
    for p in ("q", "k", "v", "proj_out"):
        _emit(flat, sd, f"{t}.{p}", f + (p,), "conv")


def convert_vqgan(
    sd: Mapping[str, Any],
    *,
    ch_mult: Iterable[int] = (1, 2, 4),
    num_res_blocks: Iterable[int] | int = 2,
    attn_resolutions: Iterable[int] = (),
    resolution: int = 256,
) -> dict:
    """torch VQModelTorch state_dict -> flax params for
    :class:`resshift_tpu.models.VQModel`."""
    sd = _strip_prefixes(sd)
    ch_mult = list(ch_mult)
    nrb = ([num_res_blocks] * len(ch_mult)
           if isinstance(num_res_blocks, int) else list(num_res_blocks))
    attn = set(attn_resolutions)
    flat: dict[tuple[str, ...], np.ndarray] = {}

    # encoder
    enc = ("encoder",)
    _emit(flat, sd, "encoder.conv_in", enc + ("conv_in",), "conv")
    curr = resolution
    for i in range(len(ch_mult)):
        for j in range(nrb[i]):
            _map_ae_resnet(flat, sd, f"encoder.down.{i}.block.{j}",
                           enc + (f"down{i}_block{j}",))
            if curr in attn:
                _map_ae_attn(flat, sd, f"encoder.down.{i}.attn.{j}",
                             enc + (f"down{i}_attn{j}",))
        if i != len(ch_mult) - 1:
            _emit(flat, sd, f"encoder.down.{i}.downsample.conv",
                  enc + (f"down{i}_downsample", "conv"), "conv")
            curr //= 2
    _map_ae_resnet(flat, sd, "encoder.mid.block_1", enc + ("mid_block1",))
    _map_ae_attn(flat, sd, "encoder.mid.attn_1", enc + ("mid_attn1",))
    _map_ae_resnet(flat, sd, "encoder.mid.block_2", enc + ("mid_block2",))
    _emit(flat, sd, "encoder.norm_out", enc + ("norm_out",), "gn")
    _emit(flat, sd, "encoder.conv_out", enc + ("conv_out",), "conv")

    # decoder
    dec = ("decoder",)
    _emit(flat, sd, "decoder.conv_in", dec + ("conv_in",), "conv")
    _map_ae_resnet(flat, sd, "decoder.mid.block_1", dec + ("mid_block1",))
    _map_ae_attn(flat, sd, "decoder.mid.attn_1", dec + ("mid_attn1",))
    _map_ae_resnet(flat, sd, "decoder.mid.block_2", dec + ("mid_block2",))
    curr = resolution // 2 ** (len(ch_mult) - 1)
    for i in reversed(range(len(ch_mult))):
        for j in range(nrb[i] + 1):
            _map_ae_resnet(flat, sd, f"decoder.up.{i}.block.{j}",
                           dec + (f"up{i}_block{j}",))
            if curr in attn:
                _map_ae_attn(flat, sd, f"decoder.up.{i}.attn.{j}",
                             dec + (f"up{i}_attn{j}",))
        if i != 0:
            _emit(flat, sd, f"decoder.up.{i}.upsample.conv",
                  dec + (f"up{i}_upsample", "conv"), "conv")
            curr *= 2
    _emit(flat, sd, "decoder.norm_out", dec + ("norm_out",), "gn")
    _emit(flat, sd, "decoder.conv_out", dec + ("conv_out",), "conv")

    # quantizer + 1x1 convs
    flat[("quantize", "embedding")] = _np(sd["quantize.embedding.weight"])
    _emit(flat, sd, "quant_conv", ("quant_conv",), "conv")
    _emit(flat, sd, "post_quant_conv", ("post_quant_conv",), "conv")
    return unflatten_dict(flat)
