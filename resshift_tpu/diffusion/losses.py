"""Likelihood helpers + timestep samplers.

Parity: `models/losses.py:12-77` (normal_kl, discretized Gaussian
log-likelihood via CDF differences) and `models/resample.py:9-159`
(UniformSampler; LossSecondMomentResampler with cross-device loss sync —
the reference used `dist.all_gather`, here a `jax.lax` mean when run inside
pmap/shard_map, or plain host updates in the default DP trainer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["normal_kl", "approx_standard_normal_cdf",
           "discretized_gaussian_log_likelihood", "UniformSampler",
           "LossSecondMomentResampler"]


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N1 || N2) for diagonal Gaussians (losses.py:12-39)."""
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of 8-bit-discretized data under a Gaussian
    (losses.py:42-77): CDF difference over the +-1/255 bin."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )


class UniformSampler:
    """t ~ U[0, T) with unit weights (resample.py UniformSampler; the live
    trainer uses the same distribution via torch.randint — trainer.py:727)."""

    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, key: jax.Array, batch: int):
        t = jax.random.randint(key, (batch,), 0, self.num_timesteps)
        return t, jnp.ones((batch,), jnp.float32)


class LossSecondMomentResampler:
    """Importance-sample timesteps by recent loss second moments
    (resample.py:119-159).  Host-side state (numpy); feed per-batch (t, loss)
    back with `update`."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._history = np.zeros((num_timesteps, history_per_term), np.float64)
        self._counts = np.zeros((num_timesteps,), np.int64)

    def _warmed_up(self) -> bool:
        return bool((self._counts == self.history_per_term).all())

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones((self.num_timesteps,), np.float64) / self.num_timesteps
        w = np.sqrt(np.mean(self._history**2, axis=-1))
        w = w / w.sum()
        w = w * (1 - self.uniform_prob) + self.uniform_prob / len(w)
        return w

    def sample(self, key: jax.Array, batch: int):
        w = self.weights()
        t = jax.random.choice(key, self.num_timesteps, (batch,), p=jnp.asarray(w))
        weights = 1.0 / (self.num_timesteps * jnp.asarray(w, jnp.float32)[t])
        return t, weights

    def update(self, ts: np.ndarray, losses: np.ndarray):
        """Record per-sample losses (in multi-host training, gather ts/losses
        across processes first — replaces resample.py's dist.all_gather)."""
        for t, loss in zip(np.asarray(ts).ravel(), np.asarray(losses).ravel()):
            if self._counts[t] == self.history_per_term:
                self._history[t, :-1] = self._history[t, 1:]
                self._history[t, -1] = loss
            else:
                self._history[t, self._counts[t]] = loss
                self._counts[t] += 1
