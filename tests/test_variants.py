"""Tests for ablation-path components: plain UNet (global attention), conv
UNet, DDPM/DDIM, likelihood helpers, timestep resamplers, AutoencoderKL."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import load_reference


def _nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).contiguous()


def _nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


def test_unet_plain_parity_vs_reference():
    load_reference()
    from models.unet import UNetModel as RefUNet

    from resshift_tpu.convert import convert_unet_plain
    from resshift_tpu.models import UNetModel

    torch.manual_seed(0)
    # reference in_channels must already include the pixel-unshuffled LQ
    # concat channels (3 + 3*4 = 15) — unet.py:569-573
    cfg = dict(image_size=16, in_channels=15, model_channels=32, out_channels=3,
               num_res_blocks=1, attention_resolutions=[8, 4], channel_mult=[1, 2],
               num_head_channels=16, use_scale_shift_norm=True, cond_lq=True)
    tnet = RefUNet(dropout=0, conv_resample=True, dims=2, use_fp16=False,
                   num_classes=None, resblock_updown=False,
                   use_new_attention_order=False, **cfg).eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    lq = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)  # pixel-unshuffled
    t = np.array([5], dtype=np.int32)
    with torch.no_grad():
        want = _nhwc(tnet(_nchw(x), torch.from_numpy(t), lq=_nchw(lq)))
    fnet = UNetModel(image_size=16, in_channels=3, model_channels=32, out_channels=3,
                     num_res_blocks=1, attention_resolutions=(8, 4), channel_mult=(1, 2),
                     num_head_channels=16, use_scale_shift_norm=True, cond_lq=True)
    params = convert_unet_plain(tnet.state_dict(), image_size=16,
                                channel_mult=(1, 2), num_res_blocks=1,
                                attention_resolutions=(8, 4))
    got = fnet.apply({"params": params}, jnp.asarray(x), jnp.asarray(t), lq=jnp.asarray(lq))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_pixel_unshuffle_matches_torch():
    from resshift_tpu.models.unet_variants import pixel_unshuffle

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    want = _nhwc(torch.nn.functional.pixel_unshuffle(_nchw(x), 2))
    got = np.asarray(pixel_unshuffle(jnp.asarray(x), 2))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_unet_conv_smoke():
    from resshift_tpu.models import UNetModelConv

    net = UNetModelConv(in_channels=3, model_channels=16, out_channels=3,
                        num_res_blocks=1, channel_mult=(1, 2),
                        use_scale_shift_norm=True, cond_lq=True)
    x = jnp.zeros((1, 16, 16, 3))
    lq = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = net.init(jax.random.PRNGKey(0), x, t, lq=lq)["params"]
    out = net.apply({"params": params}, x, t, lq=lq)
    assert out.shape == (1, 16, 16, 3)


def test_ddpm_schedule_golden():
    """DDPM constants match the reference formulas (gd.py:611-680)."""
    from resshift_tpu.diffusion import build_ddpm_schedule

    s = build_ddpm_schedule(steps=100, beta_start=0.0001, beta_end=0.02)
    betas = np.linspace(0.0001**0.5, 0.02**0.5, 100) ** 2
    acp = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), acp, rtol=1e-6)
    acp_prev = np.append(1.0, acp[:-1])
    np.testing.assert_allclose(
        np.asarray(s.posterior_mean_coef1),
        betas * np.sqrt(acp_prev) / (1 - acp), rtol=1e-5)
    # respaced: cumprod must be preserved at kept steps (respace.py:78-89);
    # the kept indices follow the reference's section algorithm
    # (respace.py:6-18): one section of 4 -> stride (100-1)/3
    s4 = build_ddpm_schedule(steps=100, beta_start=0.0001, beta_end=0.02,
                             timestep_respacing=4)
    np.testing.assert_allclose(np.asarray(s4.alphas_cumprod),
                               acp[[0, 33, 66, 99]], rtol=1e-5)


def test_ddpm_and_ddim_sampling():
    from resshift_tpu.diffusion import build_ddpm_schedule, ddpm

    s = build_ddpm_schedule(steps=10)

    def model_fn(x, t):  # fake eps predictor
        return 0.1 * x

    out = ddpm.p_sample_loop(s, model_fn, (2, 8, 8, 3), jax.random.PRNGKey(0))
    assert out.shape == (2, 8, 8, 3) and np.isfinite(np.asarray(out)).all()
    out2 = ddpm.ddim_sample_loop(s, model_fn, (2, 8, 8, 3), jax.random.PRNGKey(0), eta=0.0)
    assert np.isfinite(np.asarray(out2)).all()
    # DDIM with eta=0 is deterministic given x_T
    out3 = ddpm.ddim_sample_loop(s, model_fn, (2, 8, 8, 3), jax.random.PRNGKey(0), eta=0.0)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out3))
    # q_sample/eps inversion consistency
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (2, 4, 4, 3))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 4, 3))
    t = jnp.array([3, 7])
    xt = ddpm.q_sample(s, x0, t, eps)
    x0_hat = ddpm.predict_xstart_from_eps(s, xt, t, eps)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_likelihood_helpers_vs_reference():
    load_reference()
    import models.losses as ref_losses

    from resshift_tpu.diffusion.losses import (discretized_gaussian_log_likelihood,
                                               normal_kl)

    rng = np.random.default_rng(2)
    m1, lv1 = rng.standard_normal((4, 8)), rng.standard_normal((4, 8))
    m2, lv2 = rng.standard_normal((4, 8)), rng.standard_normal((4, 8))
    want = ref_losses.normal_kl(torch.tensor(m1), torch.tensor(lv1),
                                torch.tensor(m2), torch.tensor(lv2)).numpy()
    got = np.asarray(normal_kl(m1, lv1, m2, lv2))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    x = np.clip(rng.standard_normal((4, 8)), -1, 1)
    means = rng.standard_normal((4, 8)) * 0.1
    ls = rng.standard_normal((4, 8)) * 0.1
    want = ref_losses.discretized_gaussian_log_likelihood(
        torch.tensor(x), means=torch.tensor(means), log_scales=torch.tensor(ls)).numpy()
    got = np.asarray(discretized_gaussian_log_likelihood(
        jnp.asarray(x), means=jnp.asarray(means), log_scales=jnp.asarray(ls)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_timestep_samplers():
    from resshift_tpu.diffusion.losses import LossSecondMomentResampler, UniformSampler

    u = UniformSampler(15)
    t, w = u.sample(jax.random.PRNGKey(0), 1000)
    assert t.shape == (1000,) and int(t.min()) >= 0 and int(t.max()) < 15
    np.testing.assert_array_equal(np.asarray(w), 1.0)

    r = LossSecondMomentResampler(4, history_per_term=2)
    t, w = r.sample(jax.random.PRNGKey(1), 100)  # warmup: uniform
    np.testing.assert_allclose(np.asarray(w), 1.0, rtol=1e-5)
    # feed history: timestep 3 has huge loss -> gets oversampled after warmup
    for _ in range(2):
        r.update(np.arange(4), np.array([0.01, 0.01, 0.01, 10.0]))
    assert r._warmed_up()
    t, w = r.sample(jax.random.PRNGKey(2), 2000)
    frac3 = float((np.asarray(t) == 3).mean())
    assert frac3 > 0.5


def test_autoencoder_kl_and_identity():
    from resshift_tpu.models import AutoencoderKL, IdentityFirstStage

    dd = dict(double_z=True, z_channels=4, resolution=32, in_channels=3, out_ch=3,
              ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[], dropout=0.0)
    ae = AutoencoderKL(ddconfig=dd, embed_dim=4)
    x = jnp.zeros((1, 32, 32, 3))
    params = ae.init(jax.random.PRNGKey(0), x)["params"]
    z = ae.apply({"params": params}, x, method=ae.encode)
    assert z.shape == (1, 16, 16, 4)
    rec = ae.apply({"params": params}, z, method=ae.decode)
    assert rec.shape == (1, 32, 32, 3)
    # sampled posterior differs from mode
    z2 = ae.apply({"params": params}, x, jax.random.PRNGKey(1), True,
                  method=ae.encode)
    assert np.abs(np.asarray(z2) - np.asarray(z)).max() > 0

    ident = IdentityFirstStage()
    y = jnp.ones((1, 4, 4, 3))
    np.testing.assert_array_equal(np.asarray(ident.apply({}, y)), np.asarray(y))


def test_vqgan_census_ablation_fields():
    """The profiling-only ablation fields (tools/profile_decoder_census.py)
    must be shape-preserving and default off."""
    import jax
    import jax.numpy as jnp

    from resshift_tpu.models.vqgan import AttnBlock, ResnetBlock, Upsample

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 16), jnp.float32)
    # defaults: real compute (output differs from input)
    blk = ResnetBlock(in_channels=16)
    p = blk.init(jax.random.PRNGKey(0), x)
    assert not jnp.allclose(blk.apply(p, x), x)
    # skip_only same-channel: exact identity, no params needed
    skip = ResnetBlock(in_channels=16, skip_only=True)
    ps = skip.init(jax.random.PRNGKey(0), x)
    assert jnp.array_equal(skip.apply(ps, x), x)
    # skip_only channel-change: 1x1 shortcut, shape preserved
    skip2 = ResnetBlock(in_channels=16, out_channels=32, skip_only=True)
    p2 = skip2.init(jax.random.PRNGKey(0), x)
    assert skip2.apply(p2, x).shape == (1, 8, 8, 32)
    # attn identity
    attn = AttnBlock(in_channels=16, identity=True)
    pa = attn.init(jax.random.PRNGKey(0), x)
    assert jnp.array_equal(attn.apply(pa, x), x)
    # cheap upsample = nearest repeat
    up = Upsample(in_channels=16, cheap=True)
    pu = up.init(jax.random.PRNGKey(0), x)
    out = up.apply(pu, x)
    assert out.shape == (1, 16, 16, 16)
    assert jnp.array_equal(out, jnp.repeat(jnp.repeat(x, 2, 1), 2, 2))


def test_ddpm_variant_config_reachable_e2e():
    """`diffusion.variant: ddpm` routes the full pipeline (pad -> tile ->
    chain -> decode -> crop) through the classic-DDPM/DDIM sampler — the
    user-surface equivalent of the reference's
    create_gaussian_diffusion_ddpm (models/script_util.py:57-92)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from resshift_tpu.diffusion.ddpm import DDPMSchedule
    from resshift_tpu.pipeline import ResShiftPipeline

    from test_pipeline import tiny_config

    cfg = tiny_config()
    cfg["diffusion"] = dict(variant="ddpm", steps=40, beta_start=1e-4,
                            beta_end=0.02, predict_type="epsilon",
                            timestep_respacing=8, scale_factor=1.0, sf=4)
    pipe = ResShiftPipeline(cfg, dtype=jnp.float32)
    assert isinstance(pipe.sched, DDPMSchedule)
    assert pipe.sched.num_timesteps == 8
    params = pipe.init_params(jax.random.PRNGKey(0))
    lq = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3),
                            jnp.float32, -1.0, 1.0)
    out = np.asarray(pipe.sample(params, lq, jax.random.PRNGKey(2)))
    assert out.shape == (2, 64, 64, 3)
    assert np.isfinite(out).all()
    assert out.min() >= -1.0 and out.max() <= 1.0
    # conditioning is live: different LQ -> different samples under one key
    out2 = np.asarray(pipe.sample(params, lq[::-1], jax.random.PRNGKey(2)))
    assert not np.allclose(out, out2[::-1])
    # DDIM sub-variant via the same config surface
    cfg2 = dict(cfg)
    cfg2["diffusion"] = dict(cfg["diffusion"], sampler="ddim", eta=0.0)
    pipe2 = ResShiftPipeline(cfg2, dtype=jnp.float32)
    out3 = np.asarray(pipe2.sample(params, lq, jax.random.PRNGKey(2)))
    assert out3.shape == (2, 64, 64, 3) and np.isfinite(out3).all()
    # deterministic at eta=0: same key -> same output
    out4 = np.asarray(pipe2.sample(params, lq, jax.random.PRNGKey(2)))
    np.testing.assert_array_equal(out3, out4)
    # chopped path composes with the variant (input > chop_size 16)
    big = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3),
                             jnp.float32, -1.0, 1.0)
    outc = np.asarray(pipe.sample(params, big, jax.random.PRNGKey(4)))
    assert outc.shape == (1, 128, 128, 3) and np.isfinite(outc).all()


def test_ddpm_variant_unknown_rejected():
    import jax.numpy as jnp
    import pytest

    from resshift_tpu.pipeline import ResShiftPipeline

    from test_pipeline import tiny_config

    cfg = tiny_config()
    cfg["diffusion"]["variant"] = "nonsense"
    with pytest.raises(ValueError, match="variant"):
        ResShiftPipeline(cfg, dtype=jnp.float32)
