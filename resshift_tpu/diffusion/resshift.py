"""Functional residual-shifting diffusion core.

Pure functions over a :class:`~resshift_tpu.diffusion.schedule.Schedule`
pytree.  Shapes are NHWC.  Every function is jit/vmap/scan friendly: no
Python branching on traced values, PRNG via explicit `jax.random` keys.

Reference semantics: `models/gaussian_diffusion.py` in zsyOAOA/ResShift
(q_sample :190, q_posterior :210, p_mean_variance :234, predictor
inversions :309-330, p_sample :332, prior_sample :517, training_losses
:531, _scale_input :598).  The reverse chain that the reference runs as a
host loop (p_sample_loop_progressive :421-472) is here a single
`lax.scan`, so the whole sampler compiles to one XLA program.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from .schedule import Schedule

# model_fn(x_scaled, t_original, **cond) -> model_output, where t_original is
# the timestep after mapping through sched.timestep_map (respacing).
ModelFn = Callable[..., jnp.ndarray]


def _extract(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep scalars and broadcast over trailing dims.

    `t` is either a scalar or a [B] vector (matching the reference's
    _extract_into_tensor at gaussian_diffusion.py:92-105).
    """
    out = arr[t].astype(jnp.float32)
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def q_sample(sched: Schedule, x_start, y, t, noise):
    """Sample q(x_t | x0, y) = x0 + eta_t (y - x0) + kappa sqrt(eta_t) eps."""
    nd = x_start.ndim
    etas = _extract(sched.etas, t, nd)
    std = _extract(sched.sqrt_etas, t, nd) * sched.kappa
    return etas * (y - x_start) + x_start + std * noise


def q_mean_variance(sched: Schedule, x_start, y, t):
    nd = x_start.ndim
    etas = _extract(sched.etas, t, nd)
    mean = etas * (y - x_start) + x_start
    variance = etas * sched.kappa**2
    return mean, variance, jnp.log(variance)


def q_posterior_mean_variance(sched: Schedule, x_start, x_t, t):
    nd = x_t.ndim
    mean = (
        _extract(sched.posterior_mean_coef1, t, nd) * x_t
        + _extract(sched.posterior_mean_coef2, t, nd) * x_start
    )
    variance = _extract(sched.posterior_variance, t, nd)
    log_variance = _extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, variance, log_variance


def scale_input(sched: Schedule, x, t):
    """Input normalization before the denoiser (gaussian_diffusion.py:598-609)."""
    if not sched.normalize_input:
        return x
    nd = x.ndim
    if sched.latent_flag:
        std = jnp.sqrt(_extract(sched.etas, t, nd) * sched.kappa**2 + 1.0)
        return x / std
    max_val = _extract(sched.sqrt_etas, t, nd) * sched.kappa * 3.0 + 1.0
    return x / max_val


def predict_xstart_from_eps(sched: Schedule, x_t, y, t, eps):
    nd = x_t.ndim
    return (
        x_t
        - _extract(sched.sqrt_etas, t, nd) * sched.kappa * eps
        - _extract(sched.etas, t, nd) * y
    ) / _extract(1.0 - sched.etas, t, nd)


def predict_xstart_from_eps_scale(sched: Schedule, x_t, y, t, eps):
    nd = x_t.ndim
    return (x_t - eps - _extract(sched.etas, t, nd) * y) / _extract(1.0 - sched.etas, t, nd)


def predict_xstart_from_residual(y, residual):
    return y - residual


def predict_eps_from_xstart(sched: Schedule, x_t, y, t, pred_xstart):
    nd = x_t.ndim
    return (
        x_t
        - _extract(1.0 - sched.etas, t, nd) * pred_xstart
        - _extract(sched.etas, t, nd) * y
    ) / _extract(sched.kappa * sched.sqrt_etas, t, nd)


def prior_sample(sched: Schedule, y, noise):
    """x_T ~ q(x_T | y) = y + kappa sqrt(eta_T) eps (gaussian_diffusion.py:517-529)."""
    t = sched.num_timesteps - 1
    return y + sched.kappa * sched.sqrt_etas[t] * noise


class PMeanVariance(NamedTuple):
    mean: jnp.ndarray
    variance: jnp.ndarray
    log_variance: jnp.ndarray
    pred_xstart: jnp.ndarray


def p_mean_variance(
    sched: Schedule,
    model_fn: ModelFn,
    x_t,
    y,
    t,
    *,
    clip_denoised: bool = True,
    model_kwargs: dict[str, Any] | None = None,
) -> PMeanVariance:
    """Model posterior p(x_{t-1} | x_t) (gaussian_diffusion.py:234-307).

    `t` is a scalar (inside scan) or [B] vector of respaced indices; the
    denoiser sees the original-schedule timestep via `timestep_map`.
    """
    model_kwargs = model_kwargs or {}
    nd = x_t.ndim
    t_vec = jnp.broadcast_to(jnp.asarray(t), (x_t.shape[0],))
    t_orig = sched.timestep_map[t_vec]
    model_output = model_fn(scale_input(sched, x_t, t_vec), t_orig, **model_kwargs)
    model_output = model_output.astype(jnp.float32)

    variance = _extract(sched.posterior_variance, t_vec, nd)
    log_variance = _extract(sched.posterior_log_variance_clipped, t_vec, nd)

    mtype = sched.model_mean_type
    if mtype == "xstart":
        pred_xstart = model_output
    elif mtype == "residual":
        pred_xstart = predict_xstart_from_residual(y, model_output)
    elif mtype == "epsilon":
        pred_xstart = predict_xstart_from_eps(sched, x_t, y, t_vec, model_output)
    elif mtype == "epsilon_scale":
        pred_xstart = predict_xstart_from_eps_scale(sched, x_t, y, t_vec, model_output)
    else:
        raise ValueError(f"unknown model_mean_type: {mtype}")
    if clip_denoised:
        pred_xstart = jnp.clip(pred_xstart, -1.0, 1.0)

    mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x_t, t_vec)
    return PMeanVariance(mean, variance, log_variance, pred_xstart)


def p_sample(
    sched: Schedule,
    model_fn: ModelFn,
    x_t,
    y,
    t,
    key: jax.Array,
    *,
    clip_denoised: bool = True,
    model_kwargs: dict[str, Any] | None = None,
    noise_repeat: bool = False,
):
    """One reverse step: sample x_{t-1} (gaussian_diffusion.py:332-365).
    `noise_repeat` repeats sample-0's noise across the batch (:359-360)."""
    out = p_mean_variance(
        sched, model_fn, x_t, y, t, clip_denoised=clip_denoised, model_kwargs=model_kwargs
    )
    noise = jax.random.normal(key, x_t.shape, dtype=jnp.float32)
    if noise_repeat:
        noise = jnp.broadcast_to(noise[:1], noise.shape)
    t_vec = jnp.broadcast_to(jnp.asarray(t), (x_t.shape[0],))
    nonzero = (t_vec != 0).astype(jnp.float32).reshape((-1,) + (1,) * (x_t.ndim - 1))
    sample = out.mean + nonzero * jnp.exp(0.5 * out.log_variance) * noise
    return sample, out.pred_xstart


def sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    z_y,
    key: jax.Array,
    *,
    noise: jnp.ndarray | None = None,
    clip_denoised: bool = True,
    model_kwargs: dict[str, Any] | None = None,
    noise_repeat: bool = False,
    step_noise: jnp.ndarray | None = None,
    unroll: int = 1,
):
    """Full reverse chain as one `lax.scan` over t = T-1 .. 0.

    `z_y` is the (latent) encoded LQ; returns the final latent x_0 sample.
    Replaces the reference's host loop (gaussian_diffusion.py:421-472).
    `step_noise` (T, B, ...) optionally fixes the per-step Gaussian draws —
    used for bit-comparability tests against the reference.  `unroll`
    forwards to `lax.scan` (lets XLA schedule across consecutive denoising
    steps; identical math, larger program).
    """
    key, prior_key = jax.random.split(key)
    if noise is None:
        noise = jax.random.normal(prior_key, z_y.shape, dtype=jnp.float32)
    x_T = prior_sample(sched, z_y, noise)

    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)
    step_keys = jax.random.split(key, sched.num_timesteps)

    def step(x, inputs):
        if step_noise is None:
            t, k = inputs
            x_next, _ = p_sample(
                sched, model_fn, x, z_y, t, k,
                clip_denoised=clip_denoised, model_kwargs=model_kwargs,
                noise_repeat=noise_repeat,
            )
        else:
            t, eps = inputs
            out = p_mean_variance(sched, model_fn, x, z_y, t,
                                  clip_denoised=clip_denoised,
                                  model_kwargs=model_kwargs)
            t_vec = jnp.broadcast_to(jnp.asarray(t), (x.shape[0],))
            nz = (t_vec != 0).astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
            x_next = out.mean + nz * jnp.exp(0.5 * out.log_variance) * eps
        return x_next, ()

    xs = (ts, step_keys) if step_noise is None else (ts, step_noise)
    x0, _ = jax.lax.scan(step, x_T, xs, unroll=unroll)
    return x0


def sample_loop_parallel(
    sched: Schedule,
    model_fn: ModelFn,
    z_y,
    key: jax.Array,
    *,
    sweeps: int | None = None,
    noise: jnp.ndarray | None = None,
    clip_denoised: bool = True,
    model_kwargs: dict[str, Any] | None = None,
    noise_repeat: bool = False,
    shard_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
):
    """Time-parallel (Picard / fixed-point) reverse chain.

    The sequential sampler is a triangular system x_{j+1} = F_j(x_j) over
    scan positions j = 0..T-1 (t = T-1-j).  With the per-step Gaussian
    draws FIXED (same PRNG consumption as :func:`sample_loop`), Picard
    iteration sweeps the whole trajectory at once:

        X^{k+1}[j+1] = F_j(X^k[j])   for all j in parallel,

    evaluating the denoiser on a (T*B) batch per sweep.  After k sweeps the
    first k positions are EXACT, so `sweeps=T` reproduces `sample_loop`
    bit-for-bit; fewer sweeps trade accuracy for wall-clock — on a device
    mesh the (T*B) batch is shardable, so S sweeps cost ~S/num_devices of
    the sequential chain's latency (parallel sampling of diffusion models,
    arXiv:2305.16317, here specialized to the residual-shift chain).

    The reference has no such mode (its loop is host-sequential,
    gaussian_diffusion.py:421-472); this is a TPU-mesh-native extra.
    """
    model_kwargs = model_kwargs or {}
    t_steps = sched.num_timesteps
    if sweeps is None:
        sweeps = max(1, t_steps // 3)
    key, prior_key = jax.random.split(key)
    if noise is None:
        noise = jax.random.normal(prior_key, z_y.shape, dtype=jnp.float32)
        if noise_repeat:
            noise = jnp.broadcast_to(noise[:1], noise.shape)
    x_T = prior_sample(sched, z_y, noise)

    ts = jnp.arange(t_steps - 1, -1, -1)
    step_keys = jax.random.split(key, t_steps)
    eps = jax.vmap(lambda k: jax.random.normal(k, z_y.shape, jnp.float32))(step_keys)
    if noise_repeat:
        eps = jnp.broadcast_to(eps[:, :1], eps.shape)

    b = z_y.shape[0]
    tiled_kwargs = {k: jnp.concatenate([v] * t_steps, axis=0)
                    for k, v in model_kwargs.items()}
    z_y_tiled = jnp.concatenate([z_y] * t_steps, axis=0)
    t_vec = jnp.repeat(ts, b)

    def sweep(X, _):
        # X: (T+1, B, ...); one Picard sweep updates positions 1..T
        xs = X[:-1].reshape((t_steps * b,) + z_y.shape[1:])
        if shard_fn is not None:
            xs = shard_fn(xs)  # spread the (T*B) batch over the mesh
        out = p_mean_variance(sched, model_fn, xs, z_y_tiled, t_vec,
                              clip_denoised=clip_denoised,
                              model_kwargs=tiled_kwargs)
        mean = out.mean.reshape((t_steps,) + z_y.shape)
        # log_variance is broadcast-shaped (T*B, 1, ..., 1)
        logv = out.log_variance.reshape((t_steps, b) + (1,) * (z_y.ndim - 1))
        nz = (ts != 0).astype(jnp.float32).reshape(
            (t_steps, 1) + (1,) * (z_y.ndim - 1))
        nxt = mean + nz * jnp.exp(0.5 * logv) * eps
        return jnp.concatenate([X[:1], nxt], axis=0), ()

    X0 = jnp.broadcast_to(x_T[None], (t_steps + 1,) + x_T.shape)
    X, _ = jax.lax.scan(sweep, X0, None, length=sweeps)
    return X[-1]


def sample_loop_progressive(
    sched: Schedule,
    model_fn: ModelFn,
    z_y,
    key: jax.Array,
    *,
    noise: jnp.ndarray | None = None,
    clip_denoised: bool = True,
    model_kwargs: dict[str, Any] | None = None,
    noise_repeat: bool = False,
):
    """Like :func:`sample_loop` but also returns all intermediate samples and
    x0 predictions, stacked on a leading time axis (T, B, H, W, C)."""
    key, prior_key = jax.random.split(key)
    if noise is None:
        noise = jax.random.normal(prior_key, z_y.shape, dtype=jnp.float32)
    x_T = prior_sample(sched, z_y, noise)

    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)
    step_keys = jax.random.split(key, sched.num_timesteps)

    def step(x, inputs):
        t, k = inputs
        x_next, pred_x0 = p_sample(
            sched, model_fn, x, z_y, t, k,
            clip_denoised=clip_denoised, model_kwargs=model_kwargs,
            noise_repeat=noise_repeat,
        )
        return x_next, (x_next, pred_x0)

    x0, (samples, pred_x0s) = jax.lax.scan(step, x_T, (ts, step_keys))
    return x0, samples, pred_x0s


def training_losses(
    sched: Schedule,
    model_fn: ModelFn,
    z_start,
    z_y,
    t,
    noise,
    *,
    model_kwargs: dict[str, Any] | None = None,
    weighted_mse: bool = False,
):
    """Per-sample MSE loss in latent space (gaussian_diffusion.py:531-596).

    `z_start`/`z_y` are already encoded latents (the encode step lives in the
    trainer so it can be fused into the same jit).  Returns (loss[B], z_t,
    pred_zstart).
    """
    model_kwargs = model_kwargs or {}
    nd = z_start.ndim
    z_t = q_sample(sched, z_start, z_y, t, noise)
    t_orig = sched.timestep_map[t]
    model_output = model_fn(scale_input(sched, z_t, t), t_orig, **model_kwargs)
    model_output = model_output.astype(jnp.float32)

    mtype = sched.model_mean_type
    if mtype == "xstart":
        target = z_start
    elif mtype == "residual":
        target = z_y - z_start
    elif mtype == "epsilon":
        target = noise
    elif mtype == "epsilon_scale":
        target = noise * sched.kappa * _extract(sched.sqrt_etas, t, nd)
    else:
        raise ValueError(f"unknown model_mean_type: {mtype}")

    mse = jnp.mean((target - model_output) ** 2, axis=tuple(range(1, nd)))
    if mtype == "epsilon_scale":
        mse = mse / (sched.kappa**2 * _extract(sched.etas, t, 1).reshape(-1))
    if weighted_mse:
        mse = mse * _extract(sched.weight_loss_mse, t, 1).reshape(-1)

    if mtype == "xstart":
        pred_zstart = model_output
    elif mtype == "epsilon":
        pred_zstart = predict_xstart_from_eps(sched, z_t, z_y, t, model_output)
    elif mtype == "residual":
        pred_zstart = predict_xstart_from_residual(z_y, model_output)
    else:
        pred_zstart = predict_xstart_from_eps_scale(sched, z_t, z_y, t, model_output)

    return mse, z_t, pred_zstart
