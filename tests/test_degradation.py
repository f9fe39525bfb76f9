"""Degradation pipeline parity tests.

DiffJPEG and filter2D/USMSharp compare against the actual reference torch
code (importable without torchvision).  Kernel synthesis compares against
the reference's formula modules where importable, else golden properties.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")


def _load_ref_module(name, path):
    """Import a single reference file, bypassing package __init__ (which
    pulls torchvision, absent here)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_diffjpeg = _load_ref_module("ref_diffjpeg", "/root/reference/basicsr/utils/diffjpeg.py")
ref_imgproc = _load_ref_module("ref_imgproc", "/root/reference/basicsr/utils/img_process_util.py")

from resshift_tpu.data import degradations as deg
from resshift_tpu.data.noise import add_gaussian_noise, add_poisson_noise
from resshift_tpu.data.realesrgan import DegradationConfig, RealESRGANDegrader
from resshift_tpu.ops.diffjpeg import diff_jpeg
from resshift_tpu.ops.filters import filter2d, usm_sharp


def _nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).contiguous()


def _nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


# ---------------------------------------------------------------- DiffJPEG

@pytest.mark.parametrize("quality", [(30.0, 30.0), (95.0, 40.0)])
def test_diffjpeg_matches_reference(quality):
    DiffJPEG = ref_diffjpeg.DiffJPEG

    rng = np.random.default_rng(0)
    x = rng.random((2, 40, 56, 3)).astype(np.float32)  # non-16-multiple dims
    jpeger = DiffJPEG(differentiable=False).eval()
    q = torch.tensor(quality)
    with torch.no_grad():
        want = _nhwc(jpeger(_nchw(x), quality=q.clone()))
    got = np.asarray(diff_jpeg(jnp.asarray(x), jnp.asarray(np.array(quality, np.float32))))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_diffjpeg_differentiable_round():
    DiffJPEG = ref_diffjpeg.DiffJPEG

    rng = np.random.default_rng(1)
    x = rng.random((1, 32, 32, 3)).astype(np.float32)
    jpeger = DiffJPEG(differentiable=True).eval()
    with torch.no_grad():
        want = _nhwc(jpeger(_nchw(x), quality=torch.tensor([50.0])))
    got = np.asarray(diff_jpeg(jnp.asarray(x), jnp.asarray([50.0], np.float32),
                               differentiable=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)
    # and it actually has nonzero gradients
    g = jax.grad(lambda v: jnp.sum(diff_jpeg(v, jnp.asarray([50.0]), True)))(jnp.asarray(x))
    assert np.abs(np.asarray(g)).max() > 0


# ---------------------------------------------------------------- filter2D

def test_filter2d_matches_reference():
    t_filter2D = ref_imgproc.filter2D

    rng = np.random.default_rng(2)
    x = rng.random((3, 24, 24, 3)).astype(np.float32)
    k = rng.random((3, 7, 7)).astype(np.float32)
    k /= k.sum(axis=(1, 2), keepdims=True)
    with torch.no_grad():
        want = _nhwc(t_filter2D(_nchw(x), torch.from_numpy(k)))
    got = np.asarray(filter2d(jnp.asarray(x), jnp.asarray(k)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # shared-kernel path
    with torch.no_grad():
        want1 = _nhwc(t_filter2D(_nchw(x), torch.from_numpy(k[:1])))
    got1 = np.asarray(filter2d(jnp.asarray(x), jnp.asarray(k[:1])))
    np.testing.assert_allclose(got1, want1, rtol=1e-4, atol=1e-5)


def test_usm_sharp_matches_reference():
    USMSharp = ref_imgproc.USMSharp

    rng = np.random.default_rng(3)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    m = USMSharp().eval()
    with torch.no_grad():
        want = _nhwc(m(_nchw(x)))
    got = np.asarray(usm_sharp(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


# ------------------------------------------------------------ blur kernels

def test_kernel_formulas_match_reference_shapes_and_mass():
    rng = np.random.default_rng(4)
    for fn in (lambda: deg.bivariate_gaussian(21, 2.0),
               lambda: deg.bivariate_generalized_gaussian(21, 2.0, 1.0, 0.3, 2.0, False),
               lambda: deg.bivariate_plateau(21, 2.0, 1.0, 0.3, 1.5, False),
               lambda: deg.circular_lowpass_kernel(np.pi / 2, 13, pad_to=21)):
        k = fn()
        assert k.shape == (21, 21)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    k = deg.random_mixed_kernels(
        rng, ["iso", "aniso", "generalized_iso", "generalized_aniso",
              "plateau_iso", "plateau_aniso"],
        [0.45, 0.25, 0.12, 0.03, 0.12, 0.03], 21, (0.2, 3.0), (0.2, 3.0),
        betag_range=(0.5, 4.0), betap_range=(1.0, 2.0))
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-5)


def test_gaussian_kernel_matches_reference_formula():
    """Cross-check bivariate Gaussian against the reference's pdf2 chain,
    re-derived here with scipy (multivariate normal pdf is proportional)."""
    from scipy.stats import multivariate_normal

    k = deg.bivariate_gaussian(21, 1.7, 0.9, 0.7, isotropic=False)
    grid, _, _ = deg.mesh_grid(21)
    sigma = deg._sigma_matrix(1.7, 0.9, 0.7)
    want = multivariate_normal([0, 0], sigma).pdf(grid.reshape(-1, 2)).reshape(21, 21)
    want /= want.sum()
    np.testing.assert_allclose(k, want, rtol=1e-8)


def test_sinc_kernel_matches_reference_formula():
    from scipy import special

    cutoff, ks = np.pi / 3, 15
    k = deg.circular_lowpass_kernel(cutoff, ks)
    c = (ks - 1) / 2
    x, y = np.meshgrid(np.arange(ks), np.arange(ks), indexing="ij")
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        want = cutoff * special.j1(cutoff * r) / (2 * np.pi * r)
    want[int(c), int(c)] = cutoff**2 / (4 * np.pi)
    want /= want.sum()
    np.testing.assert_allclose(k, want, rtol=1e-10)


# ----------------------------------------------------------------- noise

def test_gaussian_noise_stats():
    key = jax.random.PRNGKey(0)
    img = jnp.full((4, 32, 32, 3), 0.5)
    sigma = jnp.asarray([5.0, 10.0, 20.0, 0.0])
    gray = jnp.asarray([0.0, 1.0, 0.0, 0.0])
    out = add_gaussian_noise(key, img, sigma, gray, clip=False)
    res = np.asarray(out) - 0.5
    # per-sample std ~ sigma/255
    for i, s in enumerate([5, 10, 20, 0]):
        np.testing.assert_allclose(res[i].std(), s / 255.0, rtol=0.1, atol=1e-4)
    # gray sample: identical noise across channels
    assert np.abs(res[1][..., 0] - res[1][..., 2]).max() < 1e-7
    assert np.abs(res[0][..., 0] - res[0][..., 2]).max() > 1e-4


def test_poisson_noise_stats():
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    scale = jnp.asarray([1.0, 2.0])
    gray = jnp.asarray([0.0, 1.0])
    out = add_poisson_noise(key, img, scale, gray, clip=True)
    o = np.asarray(out)
    assert o.min() >= 0 and o.max() <= 1
    # shot noise is signal-dependent and nonzero
    assert np.abs(o - np.asarray(img)).mean() > 1e-3
    # gray sample: identical noise in all channels (check unclipped output)
    o_raw = np.asarray(add_poisson_noise(key, img, scale, gray, clip=False))
    d = o_raw[1] - np.asarray(img)[1]  # = noise_gray * scale, channel-independent
    assert np.abs(d[..., 0] - d[..., 1]).max() < 1e-5
    d0 = o_raw[0] - np.asarray(img)[0]
    assert np.abs(d0[..., 0] - d0[..., 1]).max() > 1e-4


# ------------------------------------------------------ full pipeline

def test_realesrgan_degrader_end_to_end():
    cfg = DegradationConfig(sf=4, gt_size=64, queue_size=8)
    degr = RealESRGANDegrader(cfg)
    rng = np.random.default_rng(6)
    b = 2
    kern = np.stack([deg.random_sinc_or_mixed(
        rng, 21, 0.1, ["iso", "aniso"], [0.7, 0.3], (0.2, 3.0),
        (0.5, 4.0), (1.0, 2.0)) for _ in range(b)])
    sinc = np.stack([deg.circular_lowpass_kernel(np.pi / 2, 21) for _ in range(b)])
    batch = {"gt": np.random.default_rng(7).random((b, 128, 128, 3)).astype(np.float32),
             "kernel1": kern, "kernel2": kern, "sinc_kernel": sinc}
    for i in range(5):  # exercise queue fill + swap
        out = degr(rng, jax.random.PRNGKey(i), dict(batch))
        assert out["gt"].shape == (b, 64, 64, 3)
        assert out["lq"].shape == (b, 16, 16, 3)
        assert np.isfinite(out["gt"]).all() and np.isfinite(out["lq"]).all()
        assert out["lq"].min() >= -1.0 and out["lq"].max() <= 1.0
