"""Karras-style EDM (Elucidated Diffusion Model) math, pure jnp.

Capability parity with the reference's `ElucidatedImagen` preconditioning / schedule /
loss-weight math (/root/reference/imagen_pytorch/elucidated_imagen.py:325-390,755-759),
as pure functions so the churn+Heun sampler compiles into one `lax.scan`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from imagen_tpu.ops.tensor_utils import log


class Hparams(NamedTuple):
    """Per-unet EDM hyperparameters; reference elucidated_imagen.py:54-68."""
    num_sample_steps: int = 32
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    sigma_data: float = 0.5
    rho: float = 7.0
    P_mean: float = -1.2
    P_std: float = 1.2
    S_churn: float = 80.0
    S_tmin: float = 0.05
    S_tmax: float = 50.0
    S_noise: float = 1.003


# derived preconditioning params — Table 1 of Karras et al. 2022;
# reference elucidated_imagen.py:325-335

def c_skip(sigma_data, sigma):
    return (sigma_data ** 2) / (sigma ** 2 + sigma_data ** 2)


def c_out(sigma_data, sigma):
    return sigma * sigma_data * (sigma_data ** 2 + sigma ** 2) ** -0.5


def c_in(sigma_data, sigma):
    return 1 * (sigma ** 2 + sigma_data ** 2) ** -0.5


def c_noise(sigma):
    return log(sigma) * 0.25


def sample_schedule(num_sample_steps, rho, sigma_min, sigma_max):
    """rho-spaced sigma schedule, eq. (5); reference elucidated_imagen.py:376-390.

    Returns (num_sample_steps + 1,) with a trailing 0.
    """
    N = num_sample_steps
    inv_rho = 1 / rho

    steps = jnp.arange(num_sample_steps, dtype=jnp.float32)
    sigmas = (sigma_max ** inv_rho
              + steps / (N - 1) * (sigma_min ** inv_rho - sigma_max ** inv_rho)) ** rho

    return jnp.pad(sigmas, (0, 1), constant_values=0.)  # last step is sigma of 0


def gammas_for_schedule(sigmas, num_sample_steps, S_churn, S_tmin, S_tmax):
    """Per-step churn factor; reference elucidated_imagen.py:430-436."""
    gamma_val = min(S_churn / num_sample_steps, 2 ** 0.5 - 1)
    in_range = (sigmas >= S_tmin) & (sigmas <= S_tmax)
    return jnp.where(in_range, gamma_val, 0.)


def loss_weight(sigma_data, sigma):
    """lambda(sigma); reference elucidated_imagen.py:755-756."""
    return (sigma ** 2 + sigma_data ** 2) * (sigma * sigma_data) ** -2


def noise_distribution(key, P_mean, P_std, batch_size):
    """Log-normal training sigma distribution; reference elucidated_imagen.py:758-759
    with an explicit PRNG key."""
    return jnp.exp(P_mean + P_std * jax.random.normal(key, (batch_size,)))
