"""Inverse checkpoint conversion (flax -> reference-layout torch .pth).

The forward converter (torch -> flax) is proven by the parity suites;
these tests pin the INVERSE (convert.py export_*): weights trained in
this framework must land back in the torch ecosystem bit-identically —
every reference parameter tensor covered, layouts inverted exactly, and
the result loadable by the reference modules (whose derived buffers —
relative_position_index, attn_mask — are recomputed at construction and
deliberately not exported; reference EMA skips them too,
trainer.py:366-377).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from resshift_tpu.convert import (
    convert_unet_swin, convert_vqgan, export_unet_swin, export_vqgan,
    save_torch_state_dict)

from ref_loader import load_reference
from test_model_parity import SMALL, _nchw, _nhwc


DERIVED_BUFFERS = ("relative_position_index", "attn_mask")


def _is_derived(key: str) -> bool:
    return any(key.endswith(b) for b in DERIVED_BUFFERS)


CFG = dict(image_size=16, channel_mult=(1, 2), num_res_blocks=(1, 2),
           attention_resolutions=(16, 8), swin_depth=2, cond_lq=True,
           lq_size=16)


@pytest.fixture(scope="module")
def ref_classes():
    return load_reference()


def test_unet_swin_roundtrip_bit_identical(ref_classes):
    """torch sd -> flax -> torch sd covers every parameter tensor
    bit-identically (layout transposes are exact inverses)."""
    RefUNet, _ = ref_classes
    torch.manual_seed(0)
    tnet = RefUNet(dropout=0, conv_resample=True, dims=2, use_fp16=False,
                   resblock_updown=False, **SMALL).eval()
    sd = {k: v for k, v in tnet.state_dict().items()}

    params = convert_unet_swin(sd, **CFG)
    back = export_unet_swin(params, **CFG)

    want_keys = {k for k in sd if not _is_derived(k)}
    assert set(back) == want_keys  # full coverage, nothing extra
    for k in sorted(want_keys):
        np.testing.assert_array_equal(
            back[k], sd[k].numpy(), err_msg=k)


def test_exported_sd_loads_into_reference_model(ref_classes, tmp_path):
    """A from-scratch flax init exports to a .pth the reference model
    loads (strict on parameters), and the loaded torch model matches the
    flax forward — the full train-on-TPU -> deploy-in-torch path."""
    RefUNet, _ = ref_classes
    from resshift_tpu.models import UNetModelSwin

    fnet = UNetModelSwin(
        image_size=16, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=(1, 2), attention_resolutions=(16, 8),
        channel_mult=(1, 2), num_head_channels=16, use_scale_shift_norm=True,
        swin_depth=2, swin_embed_dim=32, window_size=4, mlp_ratio=2,
        cond_lq=True, lq_size=16)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    lq = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    t = np.array([3], dtype=np.int32)
    params = fnet.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(t), lq=jnp.asarray(lq))["params"]

    sd = export_unet_swin(params, **CFG)
    path = tmp_path / "exported.pth"
    save_torch_state_dict(str(path), sd)

    tnet = RefUNet(dropout=0, conv_resample=True, dims=2, use_fp16=False,
                   resblock_updown=False, **SMALL).eval()
    loaded = torch.load(str(path), map_location="cpu", weights_only=True)
    missing, unexpected = tnet.load_state_dict(loaded, strict=False)
    assert not unexpected
    assert all(_is_derived(k) for k in missing), missing

    with torch.no_grad():
        want = _nhwc(tnet(_nchw(x), torch.from_numpy(t), lq=_nchw(lq)))
    got = fnet.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                     lq=jnp.asarray(lq))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_vqgan_roundtrip_bit_identical(ref_classes):
    _, RefVQ = ref_classes
    torch.manual_seed(1)
    dd = dict(double_z=False, z_channels=3, resolution=32, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=2,
              attn_resolutions=[], dropout=0.0)
    tvq = RefVQ(ddconfig=dd, n_embed=64, embed_dim=3).eval()
    sd = {k: v for k, v in tvq.state_dict().items()}

    cfg = dict(ch_mult=(1, 2), num_res_blocks=2, attn_resolutions=(),
               resolution=32)
    params = convert_vqgan(sd, **cfg)
    back = export_vqgan(params, **cfg)
    assert set(back) == set(sd)
    for k in sorted(sd):
        np.testing.assert_array_equal(back[k], sd[k].numpy(), err_msg=k)

    # and it loads strictly — the AE has no derived buffers
    tvq2 = RefVQ(ddconfig=dd, n_embed=64, embed_dim=3)
    tvq2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in back.items()}, strict=True)


def test_unet_plain_roundtrip_bit_identical():
    """The guided-diffusion UNet variant roundtrips too (global attention,
    label embedding when class-conditional)."""
    load_reference()  # installs the timm stub + reference sys.path
    from resshift_tpu.convert import convert_unet_plain, export_unet_plain
    from models.unet import UNetModel as RefPlain  # reference module

    torch.manual_seed(2)
    tnet = RefPlain(image_size=16, in_channels=3, model_channels=32,
                    out_channels=3, num_res_blocks=1,
                    attention_resolutions=[8], channel_mult=(1, 2),
                    num_head_channels=16, use_scale_shift_norm=True,
                    dropout=0, use_fp16=False).eval()
    sd = {k: v for k, v in tnet.state_dict().items()}
    cfg = dict(image_size=16, channel_mult=(1, 2), num_res_blocks=1,
               attention_resolutions=(8,))
    params = convert_unet_plain(sd, **cfg)
    back = export_unet_plain(params, **cfg)
    assert set(back) == set(sd)
    for k in sorted(sd):
        np.testing.assert_array_equal(back[k], sd[k].numpy(), err_msg=k)
