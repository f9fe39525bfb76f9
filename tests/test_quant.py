"""Int8 quantized VQGAN mode (ops/quant.py) — EXPERIMENTAL.

Isolated conv chains measure 1.6-1.7x on the v5e MXU, but the composed
VQGAN phases measured net-negative (PERF.md "Negative result: int8 VQGAN
serving mode") — the mode ships as an opt-in experiment.  These tests pin
the numerics and the checkpoint compatibility on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from resshift_tpu.ops.quant import QConv, qconv, quantize_weight


def test_quantize_weight_per_channel():
    w = np.zeros((3, 3, 4, 2), np.float32)
    w[..., 0] = np.linspace(-1, 1, 36).reshape(3, 3, 4)
    w[..., 1] = 100.0 * np.linspace(-1, 1, 36).reshape(3, 3, 4)
    wq, s = quantize_weight(jnp.asarray(w))
    assert wq.dtype == jnp.int8 and s.shape == (2,)
    # per-channel scales differ by the 100x factor
    np.testing.assert_allclose(float(s[1] / s[0]), 100.0, rtol=1e-5)
    # dequantized weight close to original (<= half-step error)
    back = np.asarray(wq, np.float32) * np.asarray(s)
    np.testing.assert_allclose(back, w, atol=float(s[1]) * 0.5 + 1e-9)


def test_qconv_close_to_f32_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, 8, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(8).astype(np.float32) * 0.01)
    exact = lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    q = qconv(x, w, b)
    err = float(jnp.max(jnp.abs(q - exact)))
    ref = float(jnp.max(jnp.abs(exact)))
    assert err < 0.02 * ref  # 8-bit symmetric quant band
    # strided/1x1 variants
    q2 = qconv(x, w, b, strides=(2, 2))
    assert q2.shape == (2, 8, 8, 8)
    w1 = jnp.asarray(0.1 * rng.standard_normal((1, 1, 8, 4)).astype(np.float32))
    q3 = qconv(x, w1, None, padding=((0, 0), (0, 0)))
    assert q3.shape == (2, 16, 16, 4)


def test_qconv_module_param_compat_with_nn_conv():
    """QConv must expose nn.Conv's exact param layout so converted
    checkpoints load unchanged."""
    import flax.linen as nn

    x = jnp.ones((1, 8, 8, 4), jnp.float32)
    ref = nn.Conv(6, (3, 3), padding=1)
    qcv = QConv(6, (3, 3), padding=1)
    pr = ref.init(jax.random.PRNGKey(0), x)["params"]
    pq = qcv.init(jax.random.PRNGKey(0), x)["params"]
    assert {k: (v.shape, v.dtype) for k, v in pr.items()} == \
           {k: (v.shape, v.dtype) for k, v in pq.items()}
    # apply the REFERENCE conv's params through the quantized module
    out = qcv.apply({"params": pr}, x)
    want = ref.apply({"params": pr}, x)
    assert float(jnp.max(jnp.abs(out - want))) < 0.02 * float(jnp.max(jnp.abs(want)) + 1e-6)


def test_vqmodel_int8_shares_param_tree():
    """VQModel(quant='int8') uses the identical param tree as the exact
    model — decode through both and compare within the 8-bit band."""
    from resshift_tpu.models.vqgan import VQModel

    dd = dict(double_z=False, z_channels=3, resolution=64, in_channels=3,
              out_ch=3, ch=16, ch_mult=[1, 2], num_res_blocks=1,
              attn_resolutions=[], dropout=0.0)
    exact = VQModel(ddconfig=dd, n_embed=32, embed_dim=3)
    quant = VQModel(ddconfig=dd, n_embed=32, embed_dim=3, quant="int8")
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3),
                           jnp.float32, -1, 1)
    p = exact.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p) == jax.tree.structure(
        quant.init(jax.random.PRNGKey(0), x)["params"])
    z_e = exact.apply({"params": p}, x, method=lambda m, xx: m.encode(xx))
    z_q = quant.apply({"params": p}, x, method=lambda m, xx: m.encode(xx))
    # encode latents agree within the quantization band
    scale = float(jnp.max(jnp.abs(z_e)) + 1e-6)
    assert float(jnp.max(jnp.abs(z_e - z_q))) < 0.1 * scale
    # full roundtrip is finite and bounded
    y = quant.apply({"params": p}, x, method=lambda m, xx: m.decode(m.encode(xx), True))
    assert np.isfinite(np.asarray(y)).all()


def test_pipeline_quant_vqgan_end_to_end():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_pipeline import tiny_config

    from resshift_tpu.pipeline import ResShiftPipeline

    exact = ResShiftPipeline(tiny_config(), dtype=jnp.float32)
    quant = ResShiftPipeline(tiny_config(), dtype=jnp.float32,
                             quant_vqgan="int8")
    params = exact.init_params(jax.random.PRNGKey(0))
    lq = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3),
                            jnp.float32, -1, 1)
    out_e = np.asarray(exact.sample(params, lq, jax.random.PRNGKey(2)))
    out_q = np.asarray(quant.sample(params, lq, jax.random.PRNGKey(2)))
    assert out_q.shape == out_e.shape == (1, 64, 64, 3)
    assert np.isfinite(out_q).all()
    assert out_q.min() >= -1.0 and out_q.max() <= 1.0
