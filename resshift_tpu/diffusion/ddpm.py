"""Classic DDPM utilities + DDIM sampler (ablation path).

The reference keeps a full DDPM implementation alongside ResShift for
ablations (`models/gaussian_diffusion.py:611-1238` GaussianDiffusionDDPM,
`ddim_sample*` :985-1147, respaced variant models/respace.py:65-99,
factory `create_gaussian_diffusion_ddpm` models/script_util.py:57-92).
Functional JAX equivalent: one `DDPMSchedule` pytree + pure q/p/ddim
functions; the reverse chains are single `lax.scan`s.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import linear_betas, space_timesteps

__all__ = ["DDPMSchedule", "build_ddpm_schedule", "q_sample", "p_sample_loop",
           "ddim_sample_loop", "training_losses"]


@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    _static_fields = ("num_timesteps", "model_mean_type", "scale_factor", "sf")

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    timestep_map: jnp.ndarray

    num_timesteps: int = 1000
    model_mean_type: str = "epsilon"  # epsilon | xstart
    scale_factor: float = 1.0
    sf: int = 4


jax.tree_util.register_dataclass(
    DDPMSchedule,
    [f.name for f in dataclasses.fields(DDPMSchedule)
     if f.name not in DDPMSchedule._static_fields],
    list(DDPMSchedule._static_fields),
)


def build_ddpm_schedule(
    *,
    steps: int = 1000,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
    predict_xstart: bool = False,
    timestep_respacing: int | str | list | None = None,
    scale_factor: float = 1.0,
    sf: int = 4,
) -> DDPMSchedule:
    betas = linear_betas(steps, beta_start, beta_end)
    if timestep_respacing is None:
        tmap = np.arange(steps, dtype=np.int32)
        new_betas = betas
    else:
        # respaced betas via cumprod ratios (models/respace.py:78-89)
        keep = set(space_timesteps(steps, timestep_respacing))
        acp = np.cumprod(1.0 - betas)
        last = 1.0
        new_betas, tmap = [], []
        for i, a in enumerate(acp):
            if i in keep:
                new_betas.append(1 - a / last)
                last = a
                tmap.append(i)
        new_betas = np.asarray(new_betas)
        tmap = np.asarray(tmap, np.int32)

    alphas = 1.0 - new_betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    acp_next = np.append(acp[1:], 0.0)
    post_var = new_betas * (1.0 - acp_prev) / (1.0 - acp)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return DDPMSchedule(
        betas=f32(new_betas),
        alphas_cumprod=f32(acp),
        alphas_cumprod_prev=f32(acp_prev),
        alphas_cumprod_next=f32(acp_next),
        sqrt_alphas_cumprod=f32(np.sqrt(acp)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1 - acp)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1)),
        posterior_variance=f32(post_var),
        posterior_log_variance_clipped=f32(np.log(np.append(post_var[1], post_var[1:]))),
        posterior_mean_coef1=f32(new_betas * np.sqrt(acp_prev) / (1.0 - acp)),
        posterior_mean_coef2=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        timestep_map=jnp.asarray(tmap),
        num_timesteps=len(tmap),
        model_mean_type="xstart" if predict_xstart else "epsilon",
        scale_factor=scale_factor,
        sf=sf,
    )


def _ex(arr, t, ndim):
    out = arr[t].astype(jnp.float32)
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def q_sample(s: DDPMSchedule, x0, t, noise):
    nd = x0.ndim
    return (_ex(s.sqrt_alphas_cumprod, t, nd) * x0
            + _ex(s.sqrt_one_minus_alphas_cumprod, t, nd) * noise)


def predict_xstart_from_eps(s: DDPMSchedule, x_t, t, eps):
    nd = x_t.ndim
    return (_ex(s.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - _ex(s.sqrt_recipm1_alphas_cumprod, t, nd) * eps)


def predict_eps_from_xstart(s: DDPMSchedule, x_t, t, x0):
    nd = x_t.ndim
    return ((_ex(s.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0)
            / _ex(s.sqrt_recipm1_alphas_cumprod, t, nd))


def p_mean_variance(s: DDPMSchedule, model_fn, x_t, t, *, clip_denoised=True,
                    model_kwargs=None):
    model_kwargs = model_kwargs or {}
    t_vec = jnp.broadcast_to(jnp.asarray(t), (x_t.shape[0],))
    out = model_fn(x_t, s.timestep_map[t_vec], **model_kwargs).astype(jnp.float32)
    if s.model_mean_type == "epsilon":
        x0 = predict_xstart_from_eps(s, x_t, t_vec, out)
    else:
        x0 = out
    if clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)
    nd = x_t.ndim
    mean = (_ex(s.posterior_mean_coef1, t_vec, nd) * x0
            + _ex(s.posterior_mean_coef2, t_vec, nd) * x_t)
    logvar = _ex(s.posterior_log_variance_clipped, t_vec, nd)
    return mean, logvar, x0


def p_sample_loop(s: DDPMSchedule, model_fn, shape, key, *, clip_denoised=True,
                  model_kwargs=None):
    """Ancestral sampling from pure noise, one lax.scan."""
    key, k0 = jax.random.split(key)
    x_T = jax.random.normal(k0, shape, jnp.float32)
    ts = jnp.arange(s.num_timesteps - 1, -1, -1)
    keys = jax.random.split(key, s.num_timesteps)

    def step(x, inp):
        t, k = inp
        mean, logvar, _ = p_mean_variance(s, model_fn, x, t,
                                          clip_denoised=clip_denoised,
                                          model_kwargs=model_kwargs)
        noise = jax.random.normal(k, x.shape, jnp.float32)
        nz = (jnp.broadcast_to(t, (x.shape[0],)) != 0).astype(jnp.float32)
        nz = nz.reshape((-1,) + (1,) * (x.ndim - 1))
        return mean + nz * jnp.exp(0.5 * logvar) * noise, ()

    x0, _ = jax.lax.scan(step, x_T, (ts, keys))
    return x0


def ddim_sample_loop(s: DDPMSchedule, model_fn, shape, key, *, eta=0.0,
                     clip_denoised=True, model_kwargs=None):
    """DDIM sampling (gaussian_diffusion.py:985-1147), one lax.scan."""
    key, k0 = jax.random.split(key)
    x_T = jax.random.normal(k0, shape, jnp.float32)
    ts = jnp.arange(s.num_timesteps - 1, -1, -1)
    keys = jax.random.split(key, s.num_timesteps)

    def step(x, inp):
        t, k = inp
        _, _, x0 = p_mean_variance(s, model_fn, x, t,
                                   clip_denoised=clip_denoised,
                                   model_kwargs=model_kwargs)
        t_vec = jnp.broadcast_to(t, (x.shape[0],))
        eps = predict_eps_from_xstart(s, x, t_vec, x0)
        nd = x.ndim
        ab = _ex(s.alphas_cumprod, t_vec, nd)
        ab_prev = _ex(s.alphas_cumprod_prev, t_vec, nd)
        sigma = (eta * jnp.sqrt((1 - ab_prev) / (1 - ab))
                 * jnp.sqrt(1 - ab / ab_prev))
        noise = jax.random.normal(k, x.shape, jnp.float32)
        mean = x0 * jnp.sqrt(ab_prev) + jnp.sqrt(1 - ab_prev - sigma**2) * eps
        nz = (t_vec != 0).astype(jnp.float32).reshape((-1,) + (1,) * (nd - 1))
        return mean + nz * sigma * noise, ()

    x0, _ = jax.lax.scan(step, x_T, (ts, keys))
    return x0


def training_losses(s: DDPMSchedule, model_fn, x0, t, noise, *, model_kwargs=None):
    """Simple-loss DDPM training (MSE on eps or x0)."""
    model_kwargs = model_kwargs or {}
    x_t = q_sample(s, x0, t, noise)
    out = model_fn(x_t, s.timestep_map[t], **model_kwargs).astype(jnp.float32)
    target = noise if s.model_mean_type == "epsilon" else x0
    return jnp.mean((target - out) ** 2, axis=tuple(range(1, x0.ndim)))
