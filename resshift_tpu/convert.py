"""PyTorch <-> JAX checkpoint conversion.

Forward direction: maps the reference's released `.pth` state_dicts
(UNetModelSwin denoisers, VQGAN f4/f8 autoencoders — see
inference_resshift.py:15-35 for the registry) onto this framework's Flax
param pytrees.  Inverse direction (`export_*`): maps Flax params trained
here back to reference-layout torch state_dicts, so weights round-trip —
a reference user can train on TPU and deploy the result in the torch
ecosystem unchanged.

The key walk mirrors the reference's module construction order
(models/unet.py:632-863, ldm/modules/diffusionmodules/model.py:452-660), so
the mapping is purely mechanical:
  * Conv2d  OIHW <-> HWIO `kernel`
  * Linear  (out,in) <-> (in,out) `kernel`
  * 1x1 Conv2d used as a channel MLP <-> Dense `kernel`
  * GroupNorm weight/bias <-> scale/bias
Handles the `module.` / `_orig_mod.` checkpoint prefixes the reference
strips in utils/util_net.py:86-98.  One walk per architecture serves both
directions (`inv=` flag), so the two mappings cannot drift apart.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Mapping

import numpy as np

try:  # torch is only needed when actually loading .pth files
    import torch
except Exception:  # pragma: no cover
    torch = None

from flax.traverse_util import flatten_dict, unflatten_dict

__all__ = ["convert_unet_swin", "convert_unet_plain", "convert_vqgan",
           "export_unet_swin", "export_unet_plain", "export_vqgan",
           "load_torch_state_dict", "save_torch_state_dict"]


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

def _emit(flat: dict, sd, tkey: str, fpath: tuple[str, ...], kind: str,
          inv: bool = False):
    """Copy one (sub)module's tensors between the two layouts.

    Forward (`inv=False`): read torch keys from `sd`, write flax leaves
    into `flat`.  Inverse: read flax leaves from `flat`, write torch-layout
    arrays into `sd`."""
    if inv:
        if kind == "conv":
            sd[f"{tkey}.weight"] = _np(flat[fpath + ("kernel",)]).transpose(3, 2, 0, 1)
            if fpath + ("bias",) in flat:
                sd[f"{tkey}.bias"] = _np(flat[fpath + ("bias",)])
        elif kind == "linear":
            sd[f"{tkey}.weight"] = _np(flat[fpath + ("kernel",)]).T
            if fpath + ("bias",) in flat:
                sd[f"{tkey}.bias"] = _np(flat[fpath + ("bias",)])
        elif kind == "dense1x1":
            sd[f"{tkey}.weight"] = _np(flat[fpath + ("kernel",)]).T[:, :, None, None]
            if fpath + ("bias",) in flat:
                sd[f"{tkey}.bias"] = _np(flat[fpath + ("bias",)])
        elif kind == "gn":
            sd[f"{tkey}.weight"] = _np(flat[fpath + ("scale",)])
            sd[f"{tkey}.bias"] = _np(flat[fpath + ("bias",)])
        elif kind == "raw":
            sd[tkey] = _np(flat[fpath])
        else:  # pragma: no cover
            raise ValueError(kind)
        return
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


def _has(flat: dict, sd, tkey: str, fpath: tuple[str, ...], inv: bool) -> bool:
    """Does an OPTIONAL submodule exist on the source side of the walk?"""
    return (fpath in flat) if inv else (tkey in sd)


def _map_resblock(flat, sd, t: str, f: tuple[str, ...], inv: bool = False):
    _emit(flat, sd, f"{t}.in_layers.0", f + ("in_norm",), "gn", inv)
    _emit(flat, sd, f"{t}.in_layers.2", f + ("in_conv",), "conv", inv)
    _emit(flat, sd, f"{t}.emb_layers.1", f + ("emb_proj",), "linear", inv)
    _emit(flat, sd, f"{t}.out_layers.0", f + ("out_norm",), "gn", inv)
    _emit(flat, sd, f"{t}.out_layers.3", f + ("out_conv",), "conv", inv)
    if _has(flat, sd, f"{t}.skip_connection.weight",
            f + ("skip_connection", "kernel"), inv):
        _emit(flat, sd, f"{t}.skip_connection", f + ("skip_connection",), "conv", inv)


def _map_basiclayer(flat, sd, t: str, f: tuple[str, ...], depth: int,
                    inv: bool = False):
    _emit(flat, sd, f"{t}.patch_embed.proj", f + ("patch_embed_proj",), "conv", inv)
    if _has(flat, sd, f"{t}.patch_embed.norm.weight",
            f + ("patch_embed_norm", "scale"), inv):
        _emit(flat, sd, f"{t}.patch_embed.norm", f + ("patch_embed_norm",), "gn", inv)
    for i in range(depth):
        b = f"{t}.blocks.{i}"
        fb = f + (f"block{i}",)
        _emit(flat, sd, f"{b}.norm1", fb + ("norm1",), "gn", inv)
        _emit(flat, sd, f"{b}.attn.relative_position_bias_table",
              fb + ("attn", "relative_position_bias_table"), "raw", inv)
        _emit(flat, sd, f"{b}.attn.qkv", fb + ("attn", "qkv"), "linear", inv)
        _emit(flat, sd, f"{b}.attn.proj", fb + ("attn", "proj"), "linear", inv)
        _emit(flat, sd, f"{b}.norm2", fb + ("norm2",), "gn", inv)
        _emit(flat, sd, f"{b}.mlp.fc1", fb + ("mlp_fc1",), "dense1x1", inv)
        _emit(flat, sd, f"{b}.mlp.fc2", fb + ("mlp_fc2",), "dense1x1", inv)
    _emit(flat, sd, f"{t}.patch_unembed.proj", f + ("patch_unembed_proj",), "conv", inv)
    if _has(flat, sd, f"{t}.patch_unembed.norm.weight",
            f + ("patch_unembed_norm", "scale"), inv):
        _emit(flat, sd, f"{t}.patch_unembed.norm", f + ("patch_unembed_norm",), "gn", inv)


def _walk_unet_swin(
    flat: dict,
    sd,
    *,
    image_size: int = 64,
    channel_mult: Iterable[int] = (1, 2, 2, 4),
    num_res_blocks: Iterable[int] | int = (2, 2, 2, 2),
    attention_resolutions: Iterable[int] = (64, 32, 16, 8),
    swin_depth: int = 2,
    cond_lq: bool = True,
    lq_size: int = 64,
    resblock_updown: bool = False,
    inv: bool = False,
) -> None:
    channel_mult = list(channel_mult)
    nrb = ([num_res_blocks] * len(channel_mult)
           if isinstance(num_res_blocks, int) else list(num_res_blocks))
    attn = set(attention_resolutions)

    _emit(flat, sd, "time_embed.0", ("time_embed_0",), "linear", inv)
    _emit(flat, sd, "time_embed.2", ("time_embed_2",), "linear", inv)

    if cond_lq and lq_size != image_size:
        for ii in range(int(math.log2(lq_size / image_size))):
            _emit(flat, sd, f"feature_extractor.{3 * ii}", (f"fe_conv{ii}",), "conv", inv)
            _emit(flat, sd, f"feature_extractor.{3 * ii + 2}.op",
                  (f"fe_down{ii}", "op"), "conv", inv)

    _emit(flat, sd, "input_blocks.0.0", ("conv_in",), "conv", inv)

    n = 1
    ds = image_size
    for level in range(len(channel_mult)):
        for jj in range(nrb[level]):
            _map_resblock(flat, sd, f"input_blocks.{n}.0", (f"in_l{level}_b{jj}_res",), inv)
            if ds in attn and jj == 0:
                _map_basiclayer(flat, sd, f"input_blocks.{n}.1",
                                (f"in_l{level}_b{jj}_swin",), swin_depth, inv)
            n += 1
        if level != len(channel_mult) - 1:
            if resblock_updown:
                _map_resblock(flat, sd, f"input_blocks.{n}.0", (f"in_l{level}_down",), inv)
            else:
                _emit(flat, sd, f"input_blocks.{n}.0.op", (f"in_l{level}_down", "op"), "conv", inv)
            n += 1
            ds //= 2

    _map_resblock(flat, sd, "middle_block.0", ("mid_res0",), inv)
    _map_basiclayer(flat, sd, "middle_block.1", ("mid_swin",), swin_depth, inv)
    _map_resblock(flat, sd, "middle_block.2", ("mid_res1",), inv)

    n = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(nrb[level] + 1):
            _map_resblock(flat, sd, f"output_blocks.{n}.0", (f"out_l{level}_b{i}_res",), inv)
            j = 1
            if ds in attn and i == 0:
                _map_basiclayer(flat, sd, f"output_blocks.{n}.{j}",
                                (f"out_l{level}_b{i}_swin",), swin_depth, inv)
                j += 1
            if level and i == nrb[level]:
                if resblock_updown:
                    _map_resblock(flat, sd, f"output_blocks.{n}.{j}", (f"out_l{level}_up",), inv)
                else:
                    _emit(flat, sd, f"output_blocks.{n}.{j}.conv",
                          (f"out_l{level}_up", "conv"), "conv", inv)
                ds *= 2
            n += 1

    _emit(flat, sd, "out.0", ("out_norm",), "gn", inv)
    _emit(flat, sd, "out.2", ("out_conv",), "conv", inv)


def convert_unet_swin(sd: Mapping[str, Any], **cfg) -> dict:
    """torch UNetModelSwin state_dict -> flax params for
    :class:`resshift_tpu.models.UNetModelSwin` (same hyperparameters)."""
    sd = _strip_prefixes(sd)
    flat: dict[tuple[str, ...], np.ndarray] = {}
    _walk_unet_swin(flat, sd, **cfg)
    return unflatten_dict(flat)


def export_unet_swin(params: Mapping, **cfg) -> dict[str, np.ndarray]:
    """flax UNetModelSwin params -> reference-layout torch state_dict
    (numpy values; `save_torch_state_dict` writes a loadable .pth).  The
    derived buffers the reference registers (relative_position_index,
    attn_mask) are intentionally absent — torch recomputes them at module
    construction; load with strict=False or via the reference's
    reload_model (utils/util_net.py:86-98)."""
    flat = flatten_dict(params)
    sd: dict[str, np.ndarray] = {}
    _walk_unet_swin(flat, sd, inv=True, **cfg)
    return sd


def _map_global_attn(flat, sd, t: str, f: tuple[str, ...], inv: bool = False):
    """AttentionBlock (unet.py:224-263): norm + 1-D qkv/proj convs."""
    _emit(flat, sd, f"{t}.norm", f + ("norm",), "gn", inv)
    # Conv1d weight (out, in, 1) <-> Dense (in, out)
    for tname, fname in (("qkv", "qkv"), ("proj_out", "proj_out")):
        if inv:
            sd[f"{t}.{tname}.weight"] = _np(flat[f + (fname, "kernel")]).T[:, :, None]
            sd[f"{t}.{tname}.bias"] = _np(flat[f + (fname, "bias")])
        else:
            w = _np(sd[f"{t}.{tname}.weight"])[:, :, 0].T
            flat[f + (fname, "kernel")] = w
            flat[f + (fname, "bias")] = _np(sd[f"{t}.{tname}.bias"])


def _walk_unet_plain(
    flat: dict,
    sd,
    *,
    image_size: int = 64,
    channel_mult: Iterable[int] = (1, 2, 4, 8),
    num_res_blocks: Iterable[int] | int = 2,
    attention_resolutions: Iterable[int] = (32, 16, 8),
    num_classes: int | None = None,
    resblock_updown: bool = False,
    inv: bool = False,
) -> None:
    channel_mult = list(channel_mult)
    nrb = ([num_res_blocks] * len(channel_mult)
           if isinstance(num_res_blocks, int) else list(num_res_blocks))
    attn = set(attention_resolutions)

    _emit(flat, sd, "time_embed.0", ("time_embed_0",), "linear", inv)
    _emit(flat, sd, "time_embed.2", ("time_embed_2",), "linear", inv)
    if num_classes is not None:
        _emit(flat, sd, "label_emb.weight", ("label_emb", "embedding"), "raw", inv)
    _emit(flat, sd, "input_blocks.0.0", ("conv_in",), "conv", inv)

    n = 1
    ds = image_size
    for level in range(len(channel_mult)):
        for jj in range(nrb[level]):
            _map_resblock(flat, sd, f"input_blocks.{n}.0", (f"in_l{level}_b{jj}_res",), inv)
            if ds in attn:
                _map_global_attn(flat, sd, f"input_blocks.{n}.1",
                                 (f"in_l{level}_b{jj}_attn",), inv)
            n += 1
        if level != len(channel_mult) - 1:
            if resblock_updown:
                _map_resblock(flat, sd, f"input_blocks.{n}.0", (f"in_l{level}_down",), inv)
            else:
                _emit(flat, sd, f"input_blocks.{n}.0.op", (f"in_l{level}_down", "op"), "conv", inv)
            n += 1
            ds //= 2

    _map_resblock(flat, sd, "middle_block.0", ("mid_res0",), inv)
    _map_global_attn(flat, sd, "middle_block.1", ("mid_attn",), inv)
    _map_resblock(flat, sd, "middle_block.2", ("mid_res1",), inv)

    n = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(nrb[level] + 1):
            _map_resblock(flat, sd, f"output_blocks.{n}.0", (f"out_l{level}_b{i}_res",), inv)
            j = 1
            if ds in attn:
                _map_global_attn(flat, sd, f"output_blocks.{n}.{j}",
                                 (f"out_l{level}_b{i}_attn",), inv)
                j += 1
            if level and i == nrb[level]:
                if resblock_updown:
                    _map_resblock(flat, sd, f"output_blocks.{n}.{j}", (f"out_l{level}_up",), inv)
                else:
                    _emit(flat, sd, f"output_blocks.{n}.{j}.conv",
                          (f"out_l{level}_up", "conv"), "conv", inv)
                ds *= 2
            n += 1

    _emit(flat, sd, "out.0", ("out_norm",), "gn", inv)
    _emit(flat, sd, "out.2", ("out_conv",), "conv", inv)


def convert_unet_plain(sd: Mapping[str, Any], **cfg) -> dict:
    """torch UNetModel (guided-diffusion variant, unet.py:346-601)
    state_dict -> flax params for models.unet_variants.UNetModel."""
    sd = _strip_prefixes(sd)
    flat: dict[tuple[str, ...], np.ndarray] = {}
    _walk_unet_plain(flat, sd, **cfg)
    return unflatten_dict(flat)


def export_unet_plain(params: Mapping, **cfg) -> dict[str, np.ndarray]:
    """flax UNetModel params -> reference-layout torch state_dict."""
    flat = flatten_dict(params)
    sd: dict[str, np.ndarray] = {}
    _walk_unet_plain(flat, sd, inv=True, **cfg)
    return sd


# ------------------------------------------------------------------- VQGAN

def _map_ae_resnet(flat, sd, t: str, f: tuple[str, ...], inv: bool = False):
    _emit(flat, sd, f"{t}.norm1", f + ("norm1",), "gn", inv)
    _emit(flat, sd, f"{t}.conv1", f + ("conv1",), "conv", inv)
    _emit(flat, sd, f"{t}.norm2", f + ("norm2",), "gn", inv)
    _emit(flat, sd, f"{t}.conv2", f + ("conv2",), "conv", inv)
    if _has(flat, sd, f"{t}.nin_shortcut.weight",
            f + ("nin_shortcut", "kernel"), inv):
        _emit(flat, sd, f"{t}.nin_shortcut", f + ("nin_shortcut",), "conv", inv)


def _map_ae_attn(flat, sd, t: str, f: tuple[str, ...], inv: bool = False):
    _emit(flat, sd, f"{t}.norm", f + ("norm",), "gn", inv)
    for p in ("q", "k", "v", "proj_out"):
        _emit(flat, sd, f"{t}.{p}", f + (p,), "conv", inv)


def _walk_vqgan(
    flat: dict,
    sd,
    *,
    ch_mult: Iterable[int] = (1, 2, 4),
    num_res_blocks: Iterable[int] | int = 2,
    attn_resolutions: Iterable[int] = (),
    resolution: int = 256,
    inv: bool = False,
) -> None:
    ch_mult = list(ch_mult)
    nrb = ([num_res_blocks] * len(ch_mult)
           if isinstance(num_res_blocks, int) else list(num_res_blocks))
    attn = set(attn_resolutions)

    # encoder
    enc = ("encoder",)
    _emit(flat, sd, "encoder.conv_in", enc + ("conv_in",), "conv", inv)
    curr = resolution
    for i in range(len(ch_mult)):
        for j in range(nrb[i]):
            _map_ae_resnet(flat, sd, f"encoder.down.{i}.block.{j}",
                           enc + (f"down{i}_block{j}",), inv)
            if curr in attn:
                _map_ae_attn(flat, sd, f"encoder.down.{i}.attn.{j}",
                             enc + (f"down{i}_attn{j}",), inv)
        if i != len(ch_mult) - 1:
            _emit(flat, sd, f"encoder.down.{i}.downsample.conv",
                  enc + (f"down{i}_downsample", "conv"), "conv", inv)
            curr //= 2
    _map_ae_resnet(flat, sd, "encoder.mid.block_1", enc + ("mid_block1",), inv)
    _map_ae_attn(flat, sd, "encoder.mid.attn_1", enc + ("mid_attn1",), inv)
    _map_ae_resnet(flat, sd, "encoder.mid.block_2", enc + ("mid_block2",), inv)
    _emit(flat, sd, "encoder.norm_out", enc + ("norm_out",), "gn", inv)
    _emit(flat, sd, "encoder.conv_out", enc + ("conv_out",), "conv", inv)

    # decoder
    dec = ("decoder",)
    _emit(flat, sd, "decoder.conv_in", dec + ("conv_in",), "conv", inv)
    _map_ae_resnet(flat, sd, "decoder.mid.block_1", dec + ("mid_block1",), inv)
    _map_ae_attn(flat, sd, "decoder.mid.attn_1", dec + ("mid_attn1",), inv)
    _map_ae_resnet(flat, sd, "decoder.mid.block_2", dec + ("mid_block2",), inv)
    curr = resolution // 2 ** (len(ch_mult) - 1)
    for i in reversed(range(len(ch_mult))):
        for j in range(nrb[i] + 1):
            _map_ae_resnet(flat, sd, f"decoder.up.{i}.block.{j}",
                           dec + (f"up{i}_block{j}",), inv)
            if curr in attn:
                _map_ae_attn(flat, sd, f"decoder.up.{i}.attn.{j}",
                             dec + (f"up{i}_attn{j}",), inv)
        if i != 0:
            _emit(flat, sd, f"decoder.up.{i}.upsample.conv",
                  dec + (f"up{i}_upsample", "conv"), "conv", inv)
            curr *= 2
    _emit(flat, sd, "decoder.norm_out", dec + ("norm_out",), "gn", inv)
    _emit(flat, sd, "decoder.conv_out", dec + ("conv_out",), "conv", inv)

    # quantizer + 1x1 convs
    _emit(flat, sd, "quantize.embedding.weight", ("quantize", "embedding"), "raw", inv)
    _emit(flat, sd, "quant_conv", ("quant_conv",), "conv", inv)
    _emit(flat, sd, "post_quant_conv", ("post_quant_conv",), "conv", inv)


def convert_vqgan(sd: Mapping[str, Any], **cfg) -> dict:
    """torch VQModelTorch state_dict -> flax params for
    :class:`resshift_tpu.models.VQModel`."""
    sd = _strip_prefixes(sd)
    flat: dict[tuple[str, ...], np.ndarray] = {}
    _walk_vqgan(flat, sd, **cfg)
    return unflatten_dict(flat)


def export_vqgan(params: Mapping, **cfg) -> dict[str, np.ndarray]:
    """flax VQModel params -> reference-layout torch state_dict (numpy
    values), the inverse of :func:`convert_vqgan` — e.g. to hand a VQGAN
    pretrained with tools/vqgan_pretrain.py back to the torch ecosystem."""
    flat = flatten_dict(params)
    sd: dict[str, np.ndarray] = {}
    _walk_vqgan(flat, sd, inv=True, **cfg)
    return sd


def save_torch_state_dict(path: str, sd: Mapping[str, np.ndarray]) -> None:
    """Write an export_* result as a torch `.pth` loadable by the
    reference's `reload_model`/`load_state_dict`."""
    if torch is None:
        raise RuntimeError("torch is required to write .pth checkpoints")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v).copy())
                for k, v in sd.items()}, path)
