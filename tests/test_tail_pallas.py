"""Fused GN+SiLU+conv3x3 tail op (ops/tail_pallas.py).

On CPU the op runs its XLA reference composition — these tests pin that
composition to the pre-fusion module chain (GroupNorm32 -> nn.silu ->
nn.Conv) so the Decoder/UNet-head refactor is behavior-preserving; the
kernel==XLA comparison itself runs on the real chip
(tools/profile_tail.py + fidelity probe).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from resshift_tpu.ops.tail_pallas import gn_silu_conv3x3, tail_available


def _module_chain(x, scale, bias, kernel, cbias, eps, dtype):
    """The exact pre-refactor composition: GroupNorm32 -> silu -> nn.Conv."""
    import flax.linen as nn

    from resshift_tpu.models.layers import GroupNorm32

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, h):
            h = GroupNorm32(eps=eps, name="n")(h)
            h = nn.silu(h)
            return nn.Conv(kernel.shape[-1], (3, 3), padding=1, dtype=dtype,
                           name="c")(h)

    params = {"n": {"scale": scale, "bias": bias},
              "c": {"kernel": kernel, "bias": cbias}}
    return Tail().apply({"params": params}, x)


@pytest.mark.parametrize("c,co", [(64, 3), (128, 3)])
def test_fallback_matches_module_chain_f32(c, co):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.05, jnp.float32)
    cbias = jnp.asarray(rng.standard_normal(co) * 0.1, jnp.float32)
    want = _module_chain(x, scale, bias, kernel, cbias, 1e-5, jnp.float32)
    got = gn_silu_conv3x3(x, scale, bias, kernel, cbias, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fallback_matches_module_chain_bf16():
    rng = np.random.default_rng(1)
    c, co = 64, 3
    x = jnp.asarray(rng.standard_normal((2, 16, 16, c)), jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.05, jnp.float32)
    cbias = jnp.asarray(rng.standard_normal(co) * 0.1, jnp.float32)
    want = _module_chain(x, scale, bias, kernel, cbias, 1e-6, jnp.bfloat16)
    got = gn_silu_conv3x3(x, scale, bias, kernel, cbias, eps=1e-6)
    assert got.dtype == jnp.bfloat16
    # same rounding points up to one bf16 LSB of accumulation-order noise
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_gradients_flow_through_tail():
    """The LPIPS trainer backprops through the decoder tail — the custom
    VJP (XLA-recompute) must produce finite grads for all inputs."""
    rng = np.random.default_rng(2)
    c, co = 64, 3
    x = jnp.asarray(rng.standard_normal((1, 8, 8, c)), jnp.float32)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.05, jnp.float32)
    cbias = jnp.zeros((co,), jnp.float32)

    def loss(x, scale, bias, kernel, cbias):
        return jnp.sum(gn_silu_conv3x3(x, scale, bias, kernel, cbias) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, scale, bias, kernel, cbias)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(grads[0]))) > 0


def test_tail_available_gating():
    assert not tail_available((1, 16, 16, 64), 16)   # too many out channels
    assert not tail_available((1, 16, 12, 64), 3)    # W not sublane-aligned
    # on CPU everything is unavailable (pallas_available() is False)
    import jax

    if jax.devices()[0].platform != "tpu":
        assert not tail_available((1, 256, 256, 128), 3)


def test_model_init_param_names_unchanged():
    """The Decoder/UNet-head refactor must keep the param tree identical
    (checkpoint compatibility)."""
    from resshift_tpu.models.vqgan import Decoder

    dec = Decoder(ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32,
                  z_channels=3)
    p = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    assert set(p["norm_out"]) == {"scale", "bias"}
    assert p["conv_out"]["kernel"].shape == (3, 3, 32, 3)
    assert p["conv_out"]["bias"].shape == (3,)


def test_bf16_tail_grad_traces():
    """Regression: VQGAN *training* through the refactored decoder tail.

    With bf16 activations, the tail conv must not request
    preferred_element_type=f32 — conv's transpose-RHS rule rebuilds a conv
    from the (output-dtype) cotangent, and the mixed bf16/f32 operands
    raised at trace time, breaking tools/vqgan_pretrain.py.  eval_shape
    covers the trace without the (minutes-long on 1 CPU) compile."""
    from resshift_tpu.models.vqgan import VQModel

    dd = dict(double_z=False, z_channels=3, resolution=32, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
              attn_resolutions=[], dropout=0.0)
    m = VQModel(ddconfig=dd, n_embed=64, embed_dim=3, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p, x):
        r, vq = m.apply({"params": p}, x, method=m.training_recon)
        return jnp.mean((r.astype(jnp.float32) - x) ** 2) + vq

    shapes = jax.eval_shape(jax.grad(loss), p, x)  # raised before the fix
    assert jax.tree_util.tree_structure(shapes) == jax.tree_util.tree_structure(p)
