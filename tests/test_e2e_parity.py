"""FULL-STACK bit-comparability test.

Runs the reference's actual torch pipeline (UNetSwin + VQGAN + SpacedDiffusion
p_sample_loop) and our single-scan JAX sampler with IDENTICAL weights
(through the converter) and IDENTICAL injected Gaussian noise, and demands
the final RGB outputs agree to fp32 tolerance.  This is the strongest
correctness statement available without the released checkpoints: every
component — schedule constants, input scaling, predictor inversion,
posterior step, VQGAN encode/decode, bicubic upsample — must match at once.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import load_reference


@pytest.fixture(scope="module")
def stack():
    RefUNet, RefVQ = load_reference()
    import sys

    sys.path.insert(0, "/root/reference")
    from models.script_util import create_gaussian_diffusion

    torch.manual_seed(0)
    unet_kwargs = dict(image_size=16, in_channels=3, model_channels=32,
                       out_channels=3, num_res_blocks=[1, 1],
                       attention_resolutions=[16, 8], channel_mult=[1, 2],
                       num_head_channels=16, use_scale_shift_norm=True,
                       swin_depth=2, swin_embed_dim=32, window_size=4,
                       mlp_ratio=2, cond_lq=True, lq_size=16, dropout=0,
                       conv_resample=True, dims=2, use_fp16=False,
                       resblock_updown=False)
    tnet = RefUNet(**unet_kwargs).eval()
    dd = dict(double_z=False, z_channels=3, resolution=64, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 2, 4], num_res_blocks=1,
              attn_resolutions=[], dropout=0.0)
    tvq = RefVQ(ddconfig=dd, n_embed=64, embed_dim=3).eval()
    tdiff = create_gaussian_diffusion(
        normalize_input=True, schedule_name="exponential", sf=4,
        min_noise_level=0.2, steps=4, kappa=2.0, etas_end=0.99,
        schedule_kwargs={"power": 0.3}, weighted_mse=False,
        predict_type="xstart", timestep_respacing=None, scale_factor=1.0,
        latent_flag=True)
    return tnet, tvq, tdiff, dd


def test_full_sampler_bit_comparability(stack):
    tnet, tvq, tdiff, dd = stack
    from resshift_tpu.convert import convert_unet_swin, convert_vqgan
    from resshift_tpu.diffusion import build_schedule
    from resshift_tpu.diffusion import resshift as rs
    from resshift_tpu.models import UNetModelSwin, VQModel
    from resshift_tpu.ops.resize import resize

    rng = np.random.default_rng(0)
    b, hw = 2, 16
    lq = rng.uniform(-1, 1, (b, hw, hw, 3)).astype(np.float32)
    prior_noise = rng.standard_normal((b, hw, hw, 3)).astype(np.float32)
    step_noise = rng.standard_normal((4, b, hw, hw, 3)).astype(np.float32)

    # ---------------- reference path (torch), noise injected ----------------
    lq_t = torch.from_numpy(lq).permute(0, 3, 1, 2)
    with torch.no_grad():
        z_y = tdiff.encode_first_stage(lq_t, tvq, up_sample=True)
        z = tdiff.prior_sample(z_y, torch.from_numpy(prior_noise).permute(0, 3, 1, 2))
        for i, t_val in enumerate(range(tdiff.num_timesteps - 1, -1, -1)):
            t = torch.tensor([t_val] * b)
            out = tdiff.p_mean_variance(tnet, z, z_y, t, clip_denoised=False,
                                        model_kwargs={"lq": lq_t})
            nz = float(t_val != 0)
            eps = torch.from_numpy(step_noise[i]).permute(0, 3, 1, 2)
            z = out["mean"] + nz * torch.exp(0.5 * out["log_variance"]) * eps
        want = tdiff.decode_first_stage(z, first_stage_model=tvq)
    want = want.permute(0, 2, 3, 1).numpy()

    # ---------------- our path (jax), same weights + noise ----------------
    sched = build_schedule(steps=4, min_noise_level=0.2, kappa=2.0, sf=4)
    fnet = UNetModelSwin(image_size=16, in_channels=3, model_channels=32,
                         out_channels=3, num_res_blocks=(1, 1),
                         attention_resolutions=(16, 8), channel_mult=(1, 2),
                         num_head_channels=16, use_scale_shift_norm=True,
                         swin_depth=2, swin_embed_dim=32, window_size=4,
                         mlp_ratio=2, cond_lq=True, lq_size=16)
    fvq = VQModel(ddconfig=dd, n_embed=64, embed_dim=3)
    up = convert_unet_swin(tnet.state_dict(), image_size=16, channel_mult=(1, 2),
                           num_res_blocks=(1, 1), attention_resolutions=(16, 8),
                           swin_depth=2, cond_lq=True, lq_size=16)
    vp = convert_vqgan(tvq.state_dict(), ch_mult=(1, 2, 4), num_res_blocks=1,
                       attn_resolutions=(), resolution=64)

    lq_j = jnp.asarray(lq)
    y_up = resize(lq_j, (hw * 4, hw * 4), "bicubic_torch")
    z_y_j = fvq.apply({"params": vp}, y_up, method=fvq.encode).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(z_y_j),
                               z_y.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=1e-3)

    def model_fn(x, t_orig, **kw):
        return fnet.apply({"params": up}, x, t_orig, **kw)

    z0 = rs.sample_loop(sched, model_fn, z_y_j, jax.random.PRNGKey(0),
                        noise=jnp.asarray(prior_noise), clip_denoised=False,
                        model_kwargs={"lq": lq_j},
                        step_noise=jnp.asarray(step_noise))
    got = fvq.apply({"params": vp}, z0, method=fvq.decode)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=5e-3)
    # and they're not trivially equal-because-constant
    assert np.asarray(got).std() > 0.05
