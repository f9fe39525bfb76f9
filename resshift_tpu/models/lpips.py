"""LPIPS (VGG16 backbone + linear heads) in Flax.

The reference uses the `lpips` package's frozen LPIPS(net='vgg') both as a
training loss (TrainerDifIRLPIPS, trainer.py:952-988) and as the evaluation
metric (trainer.py:472-482,919-923).  This is the JAX port: VGG16 feature
trunk -> per-stage unit-normalized feature differences -> 1x1 linear heads
-> spatial mean -> sum over stages.

Weights: the standard `lpips` checkpoint is the torchvision VGG16 features
state_dict + the package's `vgg.pth` linear heads.  `convert_lpips`
converts both (this environment has no egress, so the .pth files must be
provided out-of-band; everything is tested structurally with random
weights, and the converter is exercised against synthetically-keyed
state_dicts in tests).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = ["LPIPS", "convert_lpips"]

# VGG16 'features' layout: conv indices within torchvision's Sequential
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
            512, 512, 512, "M"]
# feature taps after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_TAPS = (3, 8, 15, 22, 29)
_STAGE_CH = (64, 128, 256, 512, 512)

# ImageNet normalization in the lpips package's scaling layer
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class _VGG16Features(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        feats = []
        conv_i = 0
        layer_idx = 0
        for v in _VGG_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                layer_idx += 1
            else:
                x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{layer_idx}")(x)
                layer_idx += 1
                x = nn.relu(x)
                if layer_idx in _TAPS:
                    feats.append(x)
                layer_idx += 1
                conv_i += 1
        return feats


class LPIPS(nn.Module):
    """lpips.LPIPS(net='vgg') equivalent.  Inputs NHWC in [-1, 1]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = _VGG16Features(dtype=self.dtype, name="vgg")
        fx = vgg((x - shift) / scale)
        fy = vgg((y - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            # lpips normalize_tensor: feat / (||feat||_c + 1e-10)
            a = a / (jnp.sqrt(jnp.sum(a.astype(jnp.float32) ** 2, -1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b.astype(jnp.float32) ** 2, -1, keepdims=True)) + 1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones, (_STAGE_CH[i],), jnp.float32)
            d = jnp.sum(d * w[None, None, None, :], axis=-1)  # 1x1 conv head
            total = total + jnp.mean(d, axis=(1, 2))
        return total  # (B,)


# torchvision Sequential index of each VGG16 conv, grouped into the lpips
# package's five slices (lpips/pretrained_networks.py vgg16: slice1=[0,4),
# slice2=[4,9), slice3=[9,16), slice4=[16,23), slice5=[23,30))
_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def _slice_of(conv_idx: int) -> int:
    bounds = (4, 9, 16, 23, 30)
    for s, b in enumerate(bounds):
        if conv_idx < b:
            return s + 1
    raise ValueError(conv_idx)


def convert_lpips(vgg_sd: Mapping[str, Any], lin_sd: Mapping[str, Any] | None = None) -> dict:
    """torch LPIPS weights -> flax params for :class:`LPIPS`.

    Accepted layouts (all produced by the `lpips` package / torchvision):
      * two-arg: (torchvision `vgg16().features` state_dict with plain
        '{idx}.weight' keys, lpips `vgg.pth` with 'lin{i}.model.1.weight');
      * one-arg full `lpips.LPIPS(net='vgg').state_dict()`: VGG convs under
        'net.slice{s}.{idx}.weight' (the package re-registers torchvision's
        Sequential indices inside five slices) plus the same lin heads;
      * one-arg torchvision prefix 'features.{idx}.weight' + lin heads.
    """
    import torch

    def npy(t):
        return t.detach().cpu().float().numpy() if isinstance(t, torch.Tensor) else np.asarray(t)

    if lin_sd is None:
        lin_sd = vgg_sd

    def vgg_tensor(conv_idx: int, kind: str):
        for k in (f"{conv_idx}.{kind}",
                  f"features.{conv_idx}.{kind}",
                  f"net.slice{_slice_of(conv_idx)}.{conv_idx}.{kind}"):
            if k in vgg_sd:
                return npy(vgg_sd[k])
        raise KeyError(f"no VGG conv {conv_idx} ({kind}) in state_dict; "
                       f"sample keys: {list(vgg_sd)[:5]}")

    params: dict[str, Any] = {"vgg": {}}
    for conv_idx in _CONV_IDX:
        w = vgg_tensor(conv_idx, "weight").transpose(2, 3, 1, 0)
        b = vgg_tensor(conv_idx, "bias")
        params["vgg"][f"conv{conv_idx}"] = {"kernel": w, "bias": b}
    for i in range(5):
        for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if k in lin_sd:
                params[f"lin{i}"] = npy(lin_sd[k]).reshape(-1)
                break
        else:
            raise KeyError(f"no lin{i} head in state_dict")
    return params
