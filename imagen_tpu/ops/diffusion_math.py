"""Continuous-time Gaussian diffusion math (log-SNR formulation), pure jnp.

Capability parity with the reference's `GaussianDiffusionContinuousTimes`
(/root/reference/imagen_pytorch/imagen_pytorch.py:212-318), re-designed TPU-first:

- A frozen dataclass of static config + pure functions of arrays. Everything traces into a
  single XLA program — the whole sampler (schedule, q_posterior, thresholding) compiles into
  one `lax.scan`.
- No implicit RNG: noise is always passed in (samplers thread explicit keys).
- fp32 math islands: log-SNR arithmetic is numerically touchy (the reference pins eps values
  at imagen_pytorch.py:218,269,318); we compute schedules in fp32 and cast at the edges.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from imagen_tpu.ops.tensor_utils import log, right_pad_dims_to
from imagen_tpu.utils.helpers import default, exists


def beta_linear_log_snr(t):
    """log-SNR of the linear-beta schedule; reference imagen_pytorch.py:212-214."""
    t = jnp.asarray(t, jnp.float32)
    return -jnp.log(jnp.expm1(1e-4 + 10 * (t ** 2)))


def alpha_cosine_log_snr(t, s: float = 0.008):
    """log-SNR of the cosine schedule; reference imagen_pytorch.py:216-218."""
    t = jnp.asarray(t, jnp.float32)
    return -log((jnp.cos((t + s) / (1 + s) * math.pi * 0.5) ** -2) - 1, eps=1e-5)


def log_snr_to_alpha_sigma(log_snr):
    """alpha = sqrt(sigmoid(log_snr)), sigma = sqrt(sigmoid(-log_snr));
    reference imagen_pytorch.py:220-221."""
    return jnp.sqrt(jax.nn.sigmoid(log_snr)), jnp.sqrt(jax.nn.sigmoid(-log_snr))


NOISE_SCHEDULES = {
    'linear': beta_linear_log_snr,
    'cosine': alpha_cosine_log_snr,
}


@dataclass(frozen=True)
class GaussianDiffusionContinuousTimes:
    """Static schedule config; all methods are pure functions (jit/vmap/scan-safe).

    Mirrors reference imagen_pytorch.py:223-318.
    """
    noise_schedule: str = 'cosine'
    timesteps: int = 1000

    def __post_init__(self):
        if self.noise_schedule not in NOISE_SCHEDULES:
            raise ValueError(f'invalid noise schedule {self.noise_schedule}')

    @property
    def num_timesteps(self):
        return self.timesteps

    def log_snr(self, t):
        return NOISE_SCHEDULES[self.noise_schedule](t)

    def get_times(self, batch_size, noise_level):
        """reference imagen_pytorch.py:235-236."""
        return jnp.full((batch_size,), noise_level, dtype=jnp.float32)

    def sample_random_times(self, key, batch_size):
        """Uniform t ~ U(0,1); reference imagen_pytorch.py:238-239 w/ explicit key."""
        return jax.random.uniform(key, (batch_size,), dtype=jnp.float32)

    def get_condition(self, times):
        """reference imagen_pytorch.py:241-242."""
        return self.log_snr(times) if exists(times) else None

    def get_sampling_timesteps(self, batch):
        """(t, t_next) pairs from linspace(1, 0, T+1); reference imagen_pytorch.py:245-250.

        Returns a pair of arrays each shaped (T, b) — a scan-friendly layout instead of the
        reference's python list of tuples.
        """
        times = jnp.linspace(1., 0., self.num_timesteps + 1, dtype=jnp.float32)
        times = jnp.tile(times[None], (batch, 1))          # (b, T+1)
        t = times[:, :-1].T                                 # (T, b)
        t_next = times[:, 1:].T                             # (T, b)
        return t, t_next

    def q_posterior(self, x_start, x_t, t, *, t_next=None):
        """Posterior q(x_{t_next} | x_t, x_start), eq. 33 of the VDM supplement.

        Reference imagen_pytorch.py:252-270.
        """
        t_next = default(
            t_next,
            lambda: jnp.clip(t - 1. / self.num_timesteps, min=0.),
        )

        log_snr = self.log_snr(t)
        log_snr_next = self.log_snr(t_next)
        log_snr, log_snr_next = map(
            partial(right_pad_dims_to, x_t), (log_snr, log_snr_next))

        alpha, _sigma = log_snr_to_alpha_sigma(log_snr)
        alpha_next, sigma_next = log_snr_to_alpha_sigma(log_snr_next)

        # c - as defined near eq 33
        c = -jnp.expm1(log_snr - log_snr_next)
        posterior_mean = alpha_next * (x_t * (1 - c) / alpha + c * x_start)

        # following (eq. 33)
        posterior_variance = (sigma_next ** 2) * c
        posterior_log_variance_clipped = log(posterior_variance, eps=1e-20)
        return posterior_mean, posterior_variance, posterior_log_variance_clipped

    def q_sample(self, x_start, t, noise):
        """Forward noising: alpha*x + sigma*eps; reference imagen_pytorch.py:272-284."""
        dtype = x_start.dtype

        if isinstance(t, float):
            batch = x_start.shape[0]
            t = jnp.full((batch,), t, dtype=dtype)

        log_snr = self.log_snr(t).astype(dtype)
        log_snr_padded_dim = right_pad_dims_to(x_start, log_snr)
        alpha, sigma = log_snr_to_alpha_sigma(log_snr_padded_dim)

        return alpha * x_start + sigma * noise, log_snr, alpha, sigma

    def q_sample_from_to(self, x_from, from_t, to_t, noise):
        """Re-noise from time `from_t` to earlier time `to_t` (RePaint inpaint resampling).

        Reference imagen_pytorch.py:286-306.
        """
        batch = x_from.shape[0]
        dtype = x_from.dtype

        if isinstance(from_t, float):
            from_t = jnp.full((batch,), from_t, dtype=dtype)
        if isinstance(to_t, float):
            to_t = jnp.full((batch,), to_t, dtype=dtype)

        log_snr = self.log_snr(from_t)
        log_snr_padded_dim = right_pad_dims_to(x_from, log_snr)
        alpha, sigma = log_snr_to_alpha_sigma(log_snr_padded_dim)

        log_snr_to = self.log_snr(to_t)
        log_snr_padded_dim_to = right_pad_dims_to(x_from, log_snr_to)
        alpha_to, sigma_to = log_snr_to_alpha_sigma(log_snr_padded_dim_to)

        return x_from * (alpha_to / alpha) + noise * (sigma_to * alpha - sigma * alpha_to) / alpha

    def predict_start_from_v(self, x_t, t, v):
        """x0 = alpha*x_t - sigma*v; reference imagen_pytorch.py:308-312."""
        log_snr = self.log_snr(t)
        log_snr = right_pad_dims_to(x_t, log_snr)
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        return alpha * x_t - sigma * v

    def predict_v_from_start_and_noise(self, x_start, t, noise):
        """v = alpha*eps - sigma*x0 (the v-objective target)."""
        log_snr = self.log_snr(t)
        log_snr = right_pad_dims_to(x_start, log_snr)
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        return alpha * noise - sigma * x_start

    def predict_start_from_noise(self, x_t, t, noise):
        """x0 = (x_t - sigma*eps) / alpha; reference imagen_pytorch.py:314-318."""
        log_snr = self.log_snr(t)
        log_snr = right_pad_dims_to(x_t, log_snr)
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        return (x_t - sigma * noise) / jnp.clip(alpha, min=1e-8)
