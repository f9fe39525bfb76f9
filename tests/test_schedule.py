"""Golden tests for the diffusion schedule and core math.

Targets re-derived independently (numpy float64) from the forward/posterior
definitions in the reference (models/gaussian_diffusion.py:122-174,190-232).
"""

import math

import numpy as np
import pytest

from resshift_tpu.diffusion import build_schedule, exponential_sqrt_etas, space_timesteps
from resshift_tpu.diffusion import resshift as rs

import jax
import jax.numpy as jnp


def _golden_sqrt_etas(steps, min_noise_level, etas_end, kappa, power):
    etas_start = min(min_noise_level / kappa, min_noise_level)
    increaser = math.exp(1 / (steps - 1) * math.log(etas_end / etas_start))
    base = np.ones(steps) * increaser
    pt = np.linspace(0, 1, steps, endpoint=True) ** power
    pt *= steps - 1
    return np.power(base, pt) * etas_start


@pytest.mark.parametrize(
    "steps,mnl,kappa", [(15, 0.04, 2.0), (4, 0.2, 2.0), (1000, 0.01, 1.0)]
)
def test_exponential_schedule_matches_golden(steps, mnl, kappa):
    got = exponential_sqrt_etas(steps, mnl, 0.99, kappa, 0.3)
    want = _golden_sqrt_etas(steps, mnl, 0.99, kappa, 0.3)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # endpoint + domain invariants asserted by the reference (gd.py:145-146)
    assert abs(got[-1] - 0.99) < 1e-9
    assert ((got**2 > 0) & (got**2 <= 1)).all()


def test_schedule_constants_realsr15():
    sched = build_schedule(steps=15, min_noise_level=0.04, kappa=2.0)
    se = _golden_sqrt_etas(15, 0.04, 0.99, 2.0, 0.3)
    etas = se**2
    etas_prev = np.append(0.0, etas[:-1])
    alpha = etas - etas_prev
    np.testing.assert_allclose(np.asarray(sched.etas), etas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.alpha), alpha, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sched.posterior_variance), 4.0 * etas_prev / etas * alpha, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(sched.posterior_mean_coef1), etas_prev / etas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.posterior_mean_coef2), alpha / etas, rtol=1e-6)
    pv_clip = np.append(4.0 * etas_prev[1] / etas[1] * alpha[1], (4.0 * etas_prev / etas * alpha)[1:])
    np.testing.assert_allclose(np.asarray(sched.posterior_variance_clipped), pv_clip, rtol=1e-5)
    # xstart mse weights (gd.py:164-165)
    np.testing.assert_allclose(
        np.asarray(sched.weight_loss_mse), 0.5 / pv_clip * (alpha / etas) ** 2, rtol=1e-4
    )
    assert sched.num_timesteps == 15
    np.testing.assert_array_equal(np.asarray(sched.timestep_map), np.arange(15))


def test_space_timesteps():
    # respace.py:6-18 — section algorithm: one section of n keeps n steps
    # evenly strided over [0, T-1]
    assert space_timesteps(15, 15) == list(range(15))
    assert space_timesteps(1000, 4) == [0, 333, 666, 999]
    sched = build_schedule(steps=1000, min_noise_level=0.01, kappa=1.0, timestep_respacing=4)
    assert sched.num_timesteps == 4
    np.testing.assert_array_equal(np.asarray(sched.timestep_map), [0, 333, 666, 999])
    full = _golden_sqrt_etas(1000, 0.01, 0.99, 1.0, 0.3)
    np.testing.assert_allclose(np.asarray(sched.sqrt_etas), full[[0, 333, 666, 999]], rtol=1e-6)


def test_space_timesteps_ddim_and_sections():
    """The reference's "ddimN" and section-list forms (respace.py:6-18)."""
    # ddimN: uniform stride with exactly N steps
    assert space_timesteps(1000, "ddim4") == [0, 250, 500, 750]
    assert space_timesteps(100, "ddim10") == list(range(0, 100, 10))
    with np.testing.assert_raises(ValueError):
        space_timesteps(10, "ddim7")  # no integer stride gives 7 of 10
    # section list: 100 split into two 50s, keeping 2 and 3
    got = space_timesteps(100, [2, 3])
    assert got == [0, 49, 50, 74, 99]  # stride 49 then 24.5 within [50,100)
    assert space_timesteps(100, "2,3") == got
    # single-count section <= 1
    assert space_timesteps(10, [1]) == [0]


def test_ldm_mat_schedule(tmp_path):
    """schedule_name='ldm' reads sqrt_etas from a .mat file
    (gaussian_diffusion.py:59-63)."""
    import scipy.io as sio

    vals = np.linspace(0.1, 0.9, 7)
    sio.savemat(tmp_path / "s.mat", {"sqrt_etas": vals})
    sched = build_schedule(schedule_name="ldm", mat_path=str(tmp_path / "s.mat"),
                           kappa=1.0)
    assert sched.num_timesteps == 7
    np.testing.assert_allclose(np.asarray(sched.sqrt_etas), vals, rtol=1e-6)


def test_q_sample_and_posterior_roundtrip():
    sched = build_schedule(steps=15, min_noise_level=0.04, kappa=2.0)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (2, 8, 8, 3))
    y = jax.random.normal(k2, (2, 8, 8, 3))
    noise = jax.random.normal(k3, (2, 8, 8, 3))
    t = jnp.array([3, 14])

    xt = rs.q_sample(sched, x0, y, t, noise)
    etas = np.asarray(sched.etas)
    se = np.asarray(sched.sqrt_etas)
    want = (
        etas[np.array([3, 14])][:, None, None, None] * (np.asarray(y) - np.asarray(x0))
        + np.asarray(x0)
        + (se[np.array([3, 14])] * 2.0)[:, None, None, None] * np.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(xt), want, rtol=1e-5, atol=1e-6)

    mean, var, logvar = rs.q_posterior_mean_variance(sched, x0, xt, t)
    c1 = np.asarray(sched.posterior_mean_coef1)[np.array([3, 14])][:, None, None, None]
    c2 = np.asarray(sched.posterior_mean_coef2)[np.array([3, 14])][:, None, None, None]
    np.testing.assert_allclose(
        np.asarray(mean), c1 * np.asarray(xt) + c2 * np.asarray(x0), rtol=1e-5, atol=1e-6
    )


def test_predictor_inversions_consistent():
    """predict_xstart_from_eps must invert q_sample exactly."""
    sched = build_schedule(steps=15, min_noise_level=0.04, kappa=2.0)
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (2, 4, 4, 3))
    y = jax.random.normal(k2, (2, 4, 4, 3))
    eps = jax.random.normal(k3, (2, 4, 4, 3))
    t = jnp.array([5, 9])
    xt = rs.q_sample(sched, x0, y, t, eps)
    x0_hat = rs.predict_xstart_from_eps(sched, xt, y, t, eps)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), rtol=1e-3, atol=1e-4)
    eps_hat = rs.predict_eps_from_xstart(sched, xt, y, t, x0)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(eps), rtol=1e-3, atol=1e-4)
    # residual predictor
    np.testing.assert_allclose(
        np.asarray(rs.predict_xstart_from_residual(y, y - x0)), np.asarray(x0), rtol=1e-5, atol=1e-6
    )


def test_scale_input_latent():
    sched = build_schedule(steps=15, min_noise_level=0.04, kappa=2.0)
    x = jnp.ones((1, 2, 2, 3))
    t = jnp.array([7])
    got = rs.scale_input(sched, x, t)
    std = math.sqrt(float(sched.etas[7]) * 4.0 + 1.0)
    np.testing.assert_allclose(np.asarray(got), 1.0 / std, rtol=1e-6)


def test_prior_sample():
    sched = build_schedule(steps=15, min_noise_level=0.04, kappa=2.0)
    y = jnp.zeros((1, 2, 2, 3))
    noise = jnp.ones((1, 2, 2, 3))
    got = rs.prior_sample(sched, y, noise)
    np.testing.assert_allclose(
        np.asarray(got), 2.0 * float(sched.sqrt_etas[-1]), rtol=1e-6
    )


def test_sample_loop_shapes_and_determinism():
    """End-to-end scan with an identity-ish model: deterministic under same key."""
    sched = build_schedule(steps=4, min_noise_level=0.2, kappa=2.0)

    def model_fn(x, t_orig):
        return jnp.tanh(x)  # arbitrary bounded function standing in for the UNet

    z_y = jnp.full((2, 8, 8, 3), 0.3, dtype=jnp.float32)
    key = jax.random.PRNGKey(42)
    out1 = rs.sample_loop(sched, model_fn, z_y, key)
    out2 = rs.sample_loop(sched, model_fn, z_y, key)
    assert out1.shape == z_y.shape
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = rs.sample_loop(sched, model_fn, z_y, jax.random.PRNGKey(43))
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-6

    # progressive variant stacks T intermediates
    _, samples, preds = rs.sample_loop_progressive(sched, model_fn, z_y, key)
    assert samples.shape == (4, 2, 8, 8, 3) and preds.shape == (4, 2, 8, 8, 3)
    # final-step sample of progressive == sample_loop output under same key
    np.testing.assert_allclose(np.asarray(samples[-1]), np.asarray(out1), rtol=1e-6)


def test_training_losses_xstart_target():
    sched = build_schedule(steps=15, min_noise_level=0.04, kappa=2.0)
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    z0 = jax.random.normal(k1, (3, 4, 4, 3))
    zy = jax.random.normal(k2, (3, 4, 4, 3))
    noise = jax.random.normal(k3, (3, 4, 4, 3))
    t = jnp.array([0, 7, 14])

    def perfect_model(x, t_orig):
        return z0  # oracle predicting the true x0

    loss, z_t, pred = rs.training_losses(sched, perfect_model, z0, zy, t, noise)
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(z0))
    # z_t must equal q_sample
    np.testing.assert_allclose(
        np.asarray(z_t), np.asarray(rs.q_sample(sched, z0, zy, t, noise)), rtol=1e-6
    )

    def zero_model(x, t_orig):
        return jnp.zeros_like(x)

    loss0, _, _ = rs.training_losses(sched, zero_model, z0, zy, t, noise)
    want = np.mean(np.asarray(z0) ** 2, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(loss0), want, rtol=1e-5)
