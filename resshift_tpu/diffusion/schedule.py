"""Residual-shifting diffusion schedule.

Pure-host (numpy, float64) schedule construction; the result is a single
frozen pytree of f32 device constants that every diffusion function indexes
by timestep.  Semantics match the reference implementation
(`models/gaussian_diffusion.py:32-66,122-174` and `models/respace.py:6-63`
in zsyOAOA/ResShift): the exponential eta schedule, the posterior
coefficients derived from eta differences, and timestep respacing folded in
as a plain gather (`timestep_map`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Schedule",
    "exponential_sqrt_etas",
    "linear_betas",
    "space_timesteps",
    "build_schedule",
]


def exponential_sqrt_etas(
    steps: int,
    min_noise_level: float,
    etas_end: float = 0.99,
    kappa: float = 1.0,
    power: float = 0.3,
) -> np.ndarray:
    """Geometric eta interpolation with power-warped timesteps.

    sqrt_eta[t] = base**(linspace(0,1,T)**power * (T-1)) * eta_start with
    base chosen so sqrt_eta[T-1] == etas_end.  Mirrors the reference's
    ``get_named_eta_schedule('exponential')``
    (models/gaussian_diffusion.py:45-58).
    """
    etas_start = min(min_noise_level / kappa, min_noise_level)
    increaser = math.exp(1.0 / (steps - 1) * math.log(etas_end / etas_start))
    base = np.ones((steps,), dtype=np.float64) * increaser
    power_timestep = np.linspace(0.0, 1.0, steps, endpoint=True, dtype=np.float64) ** power
    power_timestep *= steps - 1
    return np.power(base, power_timestep) * etas_start


def linear_betas(steps: int, beta_start: float, beta_end: float) -> np.ndarray:
    """Classic DDPM linear-in-sqrt beta schedule (gaussian_diffusion.py:23-28)."""
    return np.linspace(beta_start**0.5, beta_end**0.5, steps, dtype=np.float64) ** 2


def space_timesteps(num_timesteps: int,
                    section_counts: int | str | Sequence[int]) -> list[int]:
    """Subsample timesteps for respacing (models/respace.py:6-18).

    Accepts every form the reference parses:
      * an int N — one section of N evenly strided steps;
      * "ddimN" — a fixed DDIM-style stride such that exactly N steps remain;
      * "a,b,c" or a sequence — per-section counts: the schedule is split
        into len(counts) near-equal sections and section i keeps counts[i]
        evenly spaced steps.

    Returns the sorted list of retained original-timestep indices.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            want = int(section_counts[4:])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == want:
                    return sorted(range(0, num_timesteps, stride))
            raise ValueError(
                f"no stride gives exactly {want} of {num_timesteps} steps")
        section_counts = [int(x) for x in section_counts.split(",")]
    elif isinstance(section_counts, int):
        section_counts = [section_counts]

    n_sections = len(section_counts)
    base, extra = divmod(num_timesteps, n_sections)
    kept: set[int] = set()
    start = 0
    for i, count in enumerate(section_counts):
        size = base + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"section of {size} steps cannot keep {count}")
        stride = 1.0 if count <= 1 else (size - 1) / (count - 1)
        kept.update(start + round(stride * j) for j in range(count))
        start += size
    return sorted(kept)


def _pytree_dataclass(cls):
    """Register a frozen dataclass as a JAX pytree (array fields = leaves)."""
    fields = [f.name for f in dataclasses.fields(cls)]
    meta_fields = tuple(f for f in fields if f in cls._static_fields)
    data_fields = tuple(f for f in fields if f not in cls._static_fields)
    jax.tree_util.register_dataclass(cls, data_fields, meta_fields)
    return cls


@dataclasses.dataclass(frozen=True)
class Schedule:
    """All per-timestep diffusion constants, as f32 device arrays.

    Forward process (reference gaussian_diffusion.py:190-208):
        q(x_t | x0, y) = N(x_t; x0 + eta_t (y - x0), kappa^2 eta_t I)
    Posterior (.:210-232):
        mean = coef1 * x_t + coef2 * x0,  var = kappa^2 etas_prev/etas * alpha
    """

    _static_fields = ("kappa", "num_timesteps", "model_mean_type", "normalize_input", "latent_flag", "scale_factor", "sf")

    sqrt_etas: jnp.ndarray
    etas: jnp.ndarray
    etas_prev: jnp.ndarray
    alpha: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_variance_clipped: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    weight_loss_mse: jnp.ndarray
    # timestep_map[t] = index in the *original* (pre-respacing) schedule; fed
    # to the denoiser's timestep embedding (models/respace.py:54-63).
    timestep_map: jnp.ndarray

    # static metadata
    kappa: float = 1.0
    num_timesteps: int = 15
    model_mean_type: str = "xstart"  # xstart | residual | epsilon | epsilon_scale
    normalize_input: bool = True
    latent_flag: bool = True
    scale_factor: float = 1.0
    sf: int = 4


_pytree_dataclass(Schedule)


def build_schedule(
    *,
    schedule_name: str = "exponential",
    steps: int = 15,
    min_noise_level: float = 0.04,
    etas_end: float = 0.99,
    kappa: float = 2.0,
    power: float = 0.3,
    predict_type: str = "xstart",
    timestep_respacing: int | str | Sequence[int] | None = None,
    mat_path: str | None = None,
    normalize_input: bool = True,
    latent_flag: bool = True,
    scale_factor: float = 1.0,
    sf: int = 4,
    sqrt_etas: Sequence[float] | None = None,
) -> Schedule:
    """Build the full ``Schedule`` pytree (float64 host math, f32 on device).

    Mirrors ``create_gaussian_diffusion`` + ``GaussianDiffusion.__init__``
    (models/script_util.py:7-55, models/gaussian_diffusion.py:122-174) with
    respacing (models/respace.py:20-52) folded in as a gather.
    """
    if sqrt_etas is not None:
        sqrt_etas = np.asarray(sqrt_etas, dtype=np.float64)
    elif schedule_name == "exponential":
        sqrt_etas = exponential_sqrt_etas(steps, min_noise_level, etas_end, kappa, power)
    elif schedule_name == "ldm":
        # schedule read from a MATLAB file (gaussian_diffusion.py:59-63)
        import scipy.io as sio

        sqrt_etas = np.asarray(sio.loadmat(mat_path)["sqrt_etas"],
                               dtype=np.float64).reshape(-1)
        steps = len(sqrt_etas)
    else:
        raise ValueError(f"unknown schedule_name: {schedule_name}")

    if timestep_respacing is None:
        timestep_map = np.arange(steps, dtype=np.int32)
    else:
        timestep_map = np.asarray(space_timesteps(steps, timestep_respacing), dtype=np.int32)
    sqrt_etas = sqrt_etas[timestep_map]

    etas = sqrt_etas**2
    assert etas.ndim == 1 and (etas > 0).all() and (etas <= 1).all()
    etas_prev = np.append(0.0, etas[:-1])
    alpha = etas - etas_prev

    posterior_variance = kappa**2 * etas_prev / etas * alpha
    posterior_variance_clipped = np.append(posterior_variance[1], posterior_variance[1:])
    posterior_log_variance_clipped = np.log(posterior_variance_clipped)
    posterior_mean_coef1 = etas_prev / etas
    posterior_mean_coef2 = alpha / etas

    if predict_type in ("xstart", "residual"):
        weight_loss_mse = 0.5 / posterior_variance_clipped * (alpha / etas) ** 2
    elif predict_type in ("epsilon", "epsilon_scale"):
        weight_loss_mse = (
            0.5 / posterior_variance_clipped * (kappa * alpha / ((1 - etas) * sqrt_etas)) ** 2
        )
    else:
        raise ValueError(f"unknown predict_type: {predict_type}")

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return Schedule(
        sqrt_etas=f32(sqrt_etas),
        etas=f32(etas),
        etas_prev=f32(etas_prev),
        alpha=f32(alpha),
        posterior_variance=f32(posterior_variance),
        posterior_variance_clipped=f32(posterior_variance_clipped),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(posterior_mean_coef1),
        posterior_mean_coef2=f32(posterior_mean_coef2),
        weight_loss_mse=f32(weight_loss_mse),
        timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
        kappa=float(kappa),
        num_timesteps=int(len(timestep_map)),
        model_mean_type=predict_type,
        normalize_input=bool(normalize_input),
        latent_flag=bool(latent_flag),
        scale_factor=float(scale_factor),
        sf=int(sf),
    )
