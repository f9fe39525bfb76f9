"""Spatially-sharded (sequence-parallel analog) sampler tests
(pipeline.sample_spatial).

Sharding the image HEIGHT axis never changes the math — GSPMD inserts halo
exchanges for conv borders and reshards around the swin window partitions —
so the tests are exactness against the single-device UNCHOPPED sampler on
the virtual CPU mesh.  This is the seam-exact large-image path: unlike
chopped inference it computes the true unchopped result (SURVEY §5.7).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from resshift_tpu.pipeline import ResShiftPipeline

from test_pipeline import tiny_config


def _mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def test_sample_spatial_exact_vs_single_device_pixel_space():
    # pixel-space diffusion (no VQ argmin): sharded-vs-single diffs are pure
    # reduction-order float noise, so the comparison can be tight
    pipe = ResShiftPipeline(tiny_config(sf=1), dtype=jnp.float32,
                            use_autoencoder=False)
    params = pipe.init_params(jax.random.PRNGKey(0))
    lq = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3),
                            jnp.float32, -1.0, 1.0)
    key = jax.random.PRNGKey(2)
    want = np.asarray(pipe.sample(params, lq, key))
    got = np.asarray(pipe.sample_spatial(params, lq, key,
                                         _mesh((4,), ("space",))))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_sample_spatial_full_pipeline_data_x_space_mesh():
    # full VQGAN pipeline on a 2x2 (data x space) mesh, odd batch (pad path).
    # The random-codebook VQ argmin can flip codes on reduction-order-level
    # score ties, so the agreement check is PSNR-style rather than tight.
    pipe = ResShiftPipeline(tiny_config(), dtype=jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(0))
    lq = jax.random.uniform(jax.random.PRNGKey(1), (3, 16, 16, 3),
                            jnp.float32, -1.0, 1.0)
    key = jax.random.PRNGKey(2)
    want = np.asarray(pipe.sample(params, lq, key))
    mesh = _mesh((2, 2), ("data", "space"))
    got = np.asarray(pipe.sample_spatial(params, lq, key, mesh))
    assert got.shape == want.shape == (3, 64, 64, 3)
    assert np.isfinite(got).all()
    mse = float(np.mean((got - want) ** 2))
    psnr = 10 * np.log10(4.0 / mse) if mse > 0 else np.inf
    assert psnr >= 35.0, f"SP-vs-single PSNR {psnr:.1f} dB"
    # each request must stay distinct (the pad row is cropped)
    assert not np.allclose(got[0], got[1])


def test_sample_spatial_beats_chopped_on_seams():
    """The load-bearing property: on an input bigger than chop_size the
    spatial program equals the single-device UNCHOPPED sampler (it IS the
    unchopped math, just sharded) — not the seam-approximated chopped one."""
    pipe = ResShiftPipeline(tiny_config(), dtype=jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(0))
    # 32x32 > chop_size 16: `sample` would chop; sample_spatial must not
    lq = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3),
                            jnp.float32, -1.0, 1.0)
    key = jax.random.PRNGKey(2)
    # unchopped truth: raise chop_size so the single-device path skips tiling
    want = np.asarray(pipe.sample(params, lq, key, chop_size=64,
                                  chop_stride=64))
    got = np.asarray(pipe.sample_spatial(params, lq, key,
                                         _mesh((4,), ("space",))))
    assert got.shape == want.shape == (1, 128, 128, 3)
    mse = float(np.mean((got - want) ** 2))
    psnr = 10 * np.log10(4.0 / mse) if mse > 0 else np.inf
    assert psnr >= 35.0, f"SP-vs-unchopped PSNR {psnr:.1f} dB"


def _train_step_once(mesh_shape, names):
    """One train step on tiny_train_config with the given mesh layout."""
    from resshift_tpu.parallel.mesh import (
        data_parallel_shardings, dp_sp_shardings)
    from resshift_tpu.trainer import TrainConfig, create_state, make_train_step
    from test_train_loop import tiny_train_config

    cfg = tiny_train_config("bicubic")
    pipe = ResShiftPipeline(cfg, dtype=jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(0))
    batch = {
        "gt": jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 64, 3),
                                 jnp.float32, -1.0, 1.0),
        "lq": jax.random.uniform(jax.random.PRNGKey(2), (8, 16, 16, 3),
                                 jnp.float32, -1.0, 1.0),
    }
    tcfg = TrainConfig(warmup_iterations=1, iterations=10)
    state = create_state(params["unet"], tcfg)
    step = make_train_step(pipe, tcfg)
    mesh = _mesh(mesh_shape, names)
    if "space" in names:
        state_sh, batch_sh = dp_sp_shardings(mesh, state, batch)
    else:
        state_sh, batch_sh = data_parallel_shardings(mesh, state, batch)
    vq_sh, _ = data_parallel_shardings(mesh, params["vqgan"], batch)
    key_sh, _ = data_parallel_shardings(mesh, jax.random.PRNGKey(0), batch)
    jstep = jax.jit(step, in_shardings=(state_sh, vq_sh, batch_sh, key_sh))
    with mesh:
        new_state, metrics = jstep(state, params["vqgan"], batch,
                                   jax.random.PRNGKey(3))
        jax.block_until_ready(new_state.params)
    return new_state, metrics


def test_dp_sp_train_step_matches_dp():
    """Same batch/key/init: the DP x SP train step (batch AND image-height
    sharded, parallel/mesh.py::dp_sp_shardings) computes the same update as
    plain DP — spatial sharding through fwd+bwd must not change the math."""
    s_dp, m_dp = _train_step_once((8,), ("data",))
    s_sp, m_sp = _train_step_once((4, 2), ("data", "space"))
    assert np.isfinite(float(m_sp["loss"]))
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_dp["loss"]),
                               rtol=1e-5)
    # params: Adam's first step is ~lr*sign(g) (vhat = g^2), so an element
    # whose gradient sits at reduction-noise level can move +-lr (5e-5) in
    # EITHER run independently — worst-case |Δ| is a full sign flip, 2·lr =
    # 1e-4.  atol must cover that mode (round-4 shipped atol=1e-5 and failed
    # on exactly one such element at 3.1e-5); the loss equality above is the
    # tight pin on the math itself.
    lr = 5e-5
    for a, b in zip(jax.tree_util.tree_leaves(s_dp.params),
                    jax.tree_util.tree_leaves(s_sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2.2 * lr)


def test_sample_spatial_divisibility_and_axis_errors():
    pipe = ResShiftPipeline(tiny_config(), dtype=jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(0))
    lq = jnp.zeros((1, 16, 16, 3), jnp.float32)
    with pytest.raises(ValueError, match="mesh axis"):
        pipe.sample_spatial(params, lq, jax.random.PRNGKey(0),
                            _mesh((4,), ("data",)))
    # latent height 16 over 3 devices does not divide
    with pytest.raises(ValueError, match="divide"):
        pipe.sample_spatial(params, lq, jax.random.PRNGKey(0),
                            _mesh((3,), ("space",)))
