"""Parity tests for resize ops against PyTorch (CPU) and PIL.

torch's F.interpolate is the behavior the reference relies on at
gaussian_diffusion.py:503-504 (bicubic x4 upsample) and trainer.py:560-575
(area/bilinear/bicubic random rescale in the degradation pipeline).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from resshift_tpu.ops.resize import resize, upsample_nearest


def _rand(n, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, h, w, c)).astype(np.float32)


def _torch_resize(x_nhwc, out_hw, mode, antialias=False):
    t = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    y = F.interpolate(t, size=out_hw, mode=mode, antialias=antialias)
    return y.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("in_hw,out_hw", [((16, 16), (64, 64)), ((13, 17), (52, 68)), ((64, 48), (256, 192))])
def test_bicubic_upsample_matches_torch(in_hw, out_hw):
    x = _rand(2, *in_hw, 3)
    want = _torch_resize(x, out_hw, "bicubic")
    got = np.asarray(resize(jnp.asarray(x), out_hw, "bicubic_torch"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((64, 64), (23, 31)), ((100, 80), (50, 40))])
def test_bicubic_downsample_matches_torch(in_hw, out_hw):
    x = _rand(1, *in_hw, 3, seed=1)
    want = _torch_resize(x, out_hw, "bicubic")
    got = np.asarray(resize(jnp.asarray(x), out_hw, "bicubic_torch", antialias=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(32, 32), (17, 23)])
def test_bilinear_matches_torch(out_hw):
    x = _rand(1, 64, 64, 3, seed=2)
    want = _torch_resize(x, out_hw, "bilinear")
    got = np.asarray(resize(jnp.asarray(x), out_hw, "bilinear"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(32, 32), (21, 13), (50, 40)])
def test_area_matches_torch(out_hw):
    x = _rand(1, 64, 64, 3, seed=3)
    want = _torch_resize(x, out_hw, "area")
    got = np.asarray(resize(jnp.asarray(x), out_hw, "area"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_nearest_matches_torch():
    x = _rand(1, 16, 16, 3, seed=4)
    want = _torch_resize(x, (37, 11), "nearest")
    got = np.asarray(resize(jnp.asarray(x), (37, 11), "nearest"))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # integer-factor upsample helper
    want2 = _torch_resize(x, (32, 32), "nearest")
    got2 = np.asarray(upsample_nearest(jnp.asarray(x), 2))
    np.testing.assert_allclose(got2, want2, rtol=1e-6)


def test_matlab_bicubic_downscale_interior_matches_pil():
    """PIL's BICUBIC resize uses the same a=-0.5 antialiased kernel as MATLAB
    imresize; border handling differs, so compare the interior."""
    from PIL import Image

    rng = np.random.default_rng(5)
    img = (rng.random((64, 64)) * 255).astype(np.float32)
    pil = Image.fromarray(img, mode="F").resize((16, 16), Image.BICUBIC)
    want = np.asarray(pil)
    got = np.asarray(resize(jnp.asarray(img), (16, 16), "bicubic_matlab"))
    np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2], rtol=2e-3, atol=2e-2)


@pytest.mark.parametrize("out_hw", [(16, 16), (23, 31)])
def test_torch_antialias_bicubic_exact(out_hw):
    """torch antialias=True bicubic is the PIL port (a=-0.5, clipped+renorm
    borders) — must match everywhere including borders."""
    x = _rand(1, 64, 64, 3, seed=6)
    want = _torch_resize(x, out_hw, "bicubic", antialias=True)
    got = np.asarray(resize(jnp.asarray(x), out_hw, "bicubic_torch", antialias=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_torch_antialias_bilinear_exact():
    x = _rand(1, 64, 64, 3, seed=8)
    want = _torch_resize(x, (20, 28), "bilinear", antialias=True)
    got = np.asarray(resize(jnp.asarray(x), (20, 28), "bilinear", antialias=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_matlab_bicubic_identity_and_partition_of_unity():
    x = jnp.asarray(_rand(1, 32, 32, 3, seed=7))
    same = resize(x, (32, 32), "bicubic_matlab")
    np.testing.assert_allclose(np.asarray(same), np.asarray(x), atol=1e-6)
    const = resize(jnp.ones((1, 40, 40, 1)), (11, 17), "bicubic_matlab")
    np.testing.assert_allclose(np.asarray(const), 1.0, atol=1e-6)
