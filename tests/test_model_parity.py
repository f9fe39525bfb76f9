"""End-to-end numerical parity: reference torch models (random weights) ->
checkpoint converter -> flax models.  This is the strongest correctness
evidence available without the released .pth files (zero egress)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from resshift_tpu.convert import convert_unet_swin, convert_vqgan
from resshift_tpu.models import UNetModelSwin, VQModel

from ref_loader import load_reference


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def _nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


SMALL = dict(
    image_size=16,
    in_channels=3,
    model_channels=32,
    out_channels=3,
    num_res_blocks=[1, 2],
    attention_resolutions=[16, 8],
    channel_mult=[1, 2],
    num_head_channels=16,
    use_scale_shift_norm=True,
    swin_depth=2,
    swin_embed_dim=32,
    window_size=4,
    mlp_ratio=2,
    cond_lq=True,
    lq_size=16,
)


@pytest.fixture(scope="module")
def ref_classes():
    return load_reference()


def test_unet_swin_parity_small(ref_classes):
    RefUNet, _ = ref_classes
    torch.manual_seed(0)
    tnet = RefUNet(dropout=0, conv_resample=True, dims=2, use_fp16=False,
                   resblock_updown=False, **SMALL).eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    lq = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([3, 11], dtype=np.int32)

    with torch.no_grad():
        want = _nhwc(tnet(_nchw(x), torch.from_numpy(t), lq=_nchw(lq)))

    fnet = UNetModelSwin(
        image_size=16, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=(1, 2), attention_resolutions=(16, 8), channel_mult=(1, 2),
        num_head_channels=16, use_scale_shift_norm=True, swin_depth=2,
        swin_embed_dim=32, window_size=4, mlp_ratio=2, cond_lq=True, lq_size=16,
    )
    params = convert_unet_swin(
        tnet.state_dict(), image_size=16, channel_mult=(1, 2), num_res_blocks=(1, 2),
        attention_resolutions=(16, 8), swin_depth=2, cond_lq=True, lq_size=16,
    )
    got = fnet.apply({"params": params}, jnp.asarray(x), jnp.asarray(t), lq=jnp.asarray(lq))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_unet_swin_parity_larger_resolution(ref_classes):
    """Run the converted net at 2x the build resolution — exercises the
    runtime mask-recompute path (swin_transformer.py:262-265)."""
    RefUNet, _ = ref_classes
    torch.manual_seed(1)
    tnet = RefUNet(dropout=0, conv_resample=True, dims=2, use_fp16=False,
                   resblock_updown=False, **SMALL).eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    lq = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    t = np.array([7], dtype=np.int32)
    with torch.no_grad():
        want = _nhwc(tnet(_nchw(x), torch.from_numpy(t), lq=_nchw(lq)))
    fnet = UNetModelSwin(
        image_size=16, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=(1, 2), attention_resolutions=(16, 8), channel_mult=(1, 2),
        num_head_channels=16, use_scale_shift_norm=True, swin_depth=2,
        swin_embed_dim=32, window_size=4, mlp_ratio=2, cond_lq=True, lq_size=16,
    )
    params = convert_unet_swin(
        tnet.state_dict(), image_size=16, channel_mult=(1, 2), num_res_blocks=(1, 2),
        attention_resolutions=(16, 8), swin_depth=2, cond_lq=True, lq_size=16,
    )
    got = fnet.apply({"params": params}, jnp.asarray(x), jnp.asarray(t), lq=jnp.asarray(lq))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_unet_swin_parity_feature_extractor_and_mask(ref_classes):
    """lq_size > image_size -> strided-conv feature extractor; plus mask
    channel (inpainting config shape, unet.py:689-705,876-882)."""
    RefUNet, _ = ref_classes
    torch.manual_seed(2)
    cfg = dict(SMALL, lq_size=64, cond_mask=True)
    tnet = RefUNet(dropout=0, conv_resample=True, dims=2, use_fp16=False,
                   resblock_updown=False, **cfg).eval()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    lq = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    mask = (rng.random((1, 64, 64, 1)) > 0.5).astype(np.float32)
    t = np.array([2], dtype=np.int32)
    with torch.no_grad():
        want = _nhwc(tnet(_nchw(x), torch.from_numpy(t), lq=_nchw(lq), mask=_nchw(mask)))
    fnet = UNetModelSwin(
        image_size=16, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=(1, 2), attention_resolutions=(16, 8), channel_mult=(1, 2),
        num_head_channels=16, use_scale_shift_norm=True, swin_depth=2,
        swin_embed_dim=32, window_size=4, mlp_ratio=2, cond_lq=True,
        cond_mask=True, lq_size=64,
    )
    params = convert_unet_swin(
        tnet.state_dict(), image_size=16, channel_mult=(1, 2), num_res_blocks=(1, 2),
        attention_resolutions=(16, 8), swin_depth=2, cond_lq=True, lq_size=64,
    )
    got = fnet.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                     lq=jnp.asarray(lq), mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)

    # hoisted-pyramid path: features_only + lq_feat == the direct call
    # (samplers compute the timestep-invariant features once per call)
    feat = fnet.apply({"params": params}, None, None, lq=jnp.asarray(lq),
                      mask=jnp.asarray(mask), features_only=True)
    assert feat.shape[1:3] == (16, 16)
    got2 = fnet.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                      lq_feat=feat)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got),
                               rtol=1e-6, atol=1e-7)


DD_SMALL = dict(double_z=False, z_channels=3, resolution=64, in_channels=3,
                out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=2,
                attn_resolutions=[], dropout=0.0)


def test_vqgan_parity(ref_classes):
    _, RefVQ = ref_classes
    torch.manual_seed(3)
    tvq = RefVQ(ddconfig=DD_SMALL, n_embed=128, embed_dim=3).eval()

    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        tz = tvq.encode(_nchw(img))
        trec = tvq.decode(tz)

    fvq = VQModel(ddconfig=DD_SMALL, n_embed=128, embed_dim=3)
    params = convert_vqgan(tvq.state_dict(), ch_mult=(1, 2), num_res_blocks=2,
                           attn_resolutions=(), resolution=64)
    z = fvq.apply({"params": params}, jnp.asarray(img), method=fvq.encode)
    np.testing.assert_allclose(np.asarray(z), _nhwc(tz), rtol=1e-3, atol=1e-4)

    rec = fvq.apply({"params": params}, z, method=fvq.decode)
    np.testing.assert_allclose(np.asarray(rec), _nhwc(trec), rtol=1e-3, atol=2e-4)


def test_vqgan_f8_style_parity(ref_classes):
    """f8-face-style config: per-level num_res_blocks, deeper ch_mult
    (SURVEY §2.2: ch=64, ch_mult [1,2,4,8], nrb [1,2,3,4], z=8)."""
    _, RefVQ = ref_classes
    dd = dict(double_z=False, z_channels=8, resolution=64, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 2, 4, 8], num_res_blocks=[1, 2, 3, 4],
              attn_resolutions=[], dropout=0.0)
    torch.manual_seed(4)
    tvq = RefVQ(ddconfig=dd, n_embed=64, embed_dim=8).eval()
    rng = np.random.default_rng(4)
    img = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        tz = tvq.encode(_nchw(img))
        trec = tvq.decode(tz)
    fvq = VQModel(ddconfig=dd, n_embed=64, embed_dim=8)
    params = convert_vqgan(tvq.state_dict(), ch_mult=(1, 2, 4, 8),
                           num_res_blocks=(1, 2, 3, 4), attn_resolutions=(), resolution=64)
    z = fvq.apply({"params": params}, jnp.asarray(img), method=fvq.encode)
    np.testing.assert_allclose(np.asarray(z), _nhwc(tz), rtol=1e-3, atol=1e-4)
    rec = fvq.apply({"params": params}, z, method=fvq.decode)
    np.testing.assert_allclose(np.asarray(rec), _nhwc(trec), rtol=1e-3, atol=2e-4)


def test_chunked_attention_matches_dense():
    """The flash-style chunked bottleneck attention must equal the dense path."""
    from resshift_tpu.models.vqgan import _chunked_attention

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((2, 100, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 100, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 100, 16)).astype(np.float32))
    dense = jnp.einsum(
        "bqk,bkc->bqc",
        jax.nn.softmax(jnp.einsum("bqc,bkc->bqk", q * 16**-0.5, k), axis=-1),
        v,
    )
    chunked = _chunked_attention(q, k, v, chunk=32)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense), rtol=1e-4, atol=1e-5)


def test_unet_swin_parity_full_realsr_config(ref_classes):
    """The shipped 119M-param realsr config
    (configs/realsr_swinunet_realesrgan256.yaml:4-27): every converted tensor
    must land, and outputs must match to fp32 tolerance."""
    RefUNet, _ = ref_classes
    cfg = dict(image_size=64, in_channels=3, model_channels=160, out_channels=3,
               num_res_blocks=[2, 2, 2, 2], attention_resolutions=[64, 32, 16, 8],
               channel_mult=[1, 2, 2, 4], num_head_channels=32,
               use_scale_shift_norm=True, swin_depth=2, swin_embed_dim=192,
               window_size=8, mlp_ratio=4, cond_lq=True, lq_size=64)
    torch.manual_seed(0)
    tnet = RefUNet(dropout=0, conv_resample=True, dims=2, use_fp16=False,
                   resblock_updown=False, **cfg).eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    lq = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    t = np.array([7], dtype=np.int32)
    with torch.no_grad():
        want = _nhwc(tnet(_nchw(x), torch.from_numpy(t), lq=_nchw(lq)))
    params = convert_unet_swin(tnet.state_dict(), image_size=64,
                               channel_mult=(1, 2, 2, 4), num_res_blocks=(2, 2, 2, 2),
                               attention_resolutions=(64, 32, 16, 8), swin_depth=2,
                               cond_lq=True, lq_size=64)
    # every non-buffer torch tensor must have landed in the flax tree
    from flax.traverse_util import flatten_dict
    buffers = {k for k, _ in tnet.named_buffers()}
    n_torch = len([k for k in tnet.state_dict() if k not in buffers])
    assert len(flatten_dict(params)) == n_torch == 540
    fnet = UNetModelSwin(image_size=64, in_channels=3, model_channels=160,
                         out_channels=3, num_res_blocks=(2, 2, 2, 2),
                         attention_resolutions=(64, 32, 16, 8), channel_mult=(1, 2, 2, 4),
                         num_head_channels=32, use_scale_shift_norm=True, swin_depth=2,
                         swin_embed_dim=192, window_size=8, mlp_ratio=4,
                         cond_lq=True, lq_size=64)
    got = fnet.apply({"params": params}, jnp.asarray(x), jnp.asarray(t), lq=jnp.asarray(lq))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
