"""LPIPS parity: torch mirror (VGG16 features + lpips math, random weights)
-> convert_lpips -> flax LPIPS.  The real pretrained weights cannot be
downloaded in this environment; structure + converter are what we verify."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from resshift_tpu.models.lpips import LPIPS, convert_lpips

CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
       512, 512, 512, "M"]
TAPS = (3, 8, 15, 22, 29)
SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def build_torch_vgg():
    layers, in_ch = [], 3
    for v in CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU())
            in_ch = v
    return nn.Sequential(*layers)


def torch_lpips(vgg, lins, x, y):
    def feats(z):
        out, h = [], (z - SHIFT) / SCALE
        for i, layer in enumerate(vgg):
            h = layer(h)
            if i in TAPS:
                out.append(h)
        return out

    def unit(f):
        return f / (torch.sqrt(torch.sum(f**2, dim=1, keepdim=True)) + 1e-10)

    total = 0
    for i, (a, b) in enumerate(zip(feats(x), feats(y))):
        d = (unit(a) - unit(b)) ** 2
        w = lins[i].view(1, -1, 1, 1)
        total = total + (d * w).sum(dim=1, keepdim=True).mean(dim=(2, 3))
    return total.squeeze(1)


def test_lpips_parity_random_weights():
    torch.manual_seed(0)
    vgg = build_torch_vgg().eval()
    lins = [torch.rand(c) for c in (64, 128, 256, 512, 512)]

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    yt = torch.from_numpy(y).permute(0, 3, 1, 2)
    with torch.no_grad():
        want = torch_lpips(vgg, lins, xt, yt).numpy()

    # state_dicts in the expected key formats
    vgg_sd = vgg.state_dict()  # '{idx}.weight'
    lin_sd = {f"lin{i}.model.1.weight": lins[i].view(1, -1, 1, 1) for i in range(5)}
    params = convert_lpips(vgg_sd, lin_sd)

    model = LPIPS()
    got = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-5)

    # identity -> 0
    zero = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(zero), 0.0, atol=1e-6)


def test_lpips_as_training_loss():
    """LPIPS plugs into the trainer's loss hook and is differentiable."""
    model = LPIPS()
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(key, x, x)["params"]

    def lpips_fn(a, b):
        return model.apply({"params": params}, a, b)

    g = jax.grad(lambda v: jnp.sum(lpips_fn(v, jnp.ones_like(v))))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
