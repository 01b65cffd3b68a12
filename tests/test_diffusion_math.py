"""Golden-value tests of the continuous-time diffusion math against closed forms
(formulas cited from the reference in SURVEY.md §2.1)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagen_tpu.ops.diffusion_math import (
    GaussianDiffusionContinuousTimes,
    alpha_cosine_log_snr,
    beta_linear_log_snr,
    log_snr_to_alpha_sigma,
)
from imagen_tpu.ops import edm_math


def test_beta_linear_log_snr_closed_form():
    t = np.linspace(0., 1., 11)
    expected = -np.log(np.expm1(1e-4 + 10 * t ** 2))
    got = np.asarray(beta_linear_log_snr(jnp.asarray(t)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_alpha_cosine_log_snr_closed_form():
    s = 0.008
    # t=1 excluded: cos(pi/2) rounds differently in fp32 vs fp64 and the log-snr there
    # is dominated by the eps clamp (reference has the identical fp32 behavior).
    t = np.linspace(0., 0.98, 11)
    inner = np.clip(np.cos((t + s) / (1 + s) * math.pi / 2) ** -2 - 1, 1e-5, None)
    expected = -np.log(inner)
    got = np.asarray(alpha_cosine_log_snr(jnp.asarray(t)))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_alpha_sigma_unit_norm():
    log_snr = jnp.linspace(-20, 20, 41)
    alpha, sigma = log_snr_to_alpha_sigma(log_snr)
    np.testing.assert_allclose(np.asarray(alpha ** 2 + sigma ** 2), 1., atol=1e-6)


@pytest.mark.parametrize('schedule', ['linear', 'cosine'])
def test_q_sample_and_inversion(schedule):
    sched = GaussianDiffusionContinuousTimes(noise_schedule=schedule, timesteps=1000)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (2, 8, 8, 3))
    noise = jax.random.normal(k2, (2, 8, 8, 3))
    t = jax.random.uniform(k3, (2,), minval=0.05, maxval=0.95)

    x_t, log_snr, alpha, sigma = sched.q_sample(x0, t, noise)
    np.testing.assert_allclose(
        np.asarray(x_t), np.asarray(alpha * x0 + sigma * noise), rtol=1e-5)

    # predict_start_from_noise inverts q_sample
    x0_rec = sched.predict_start_from_noise(x_t, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)

    # v-objective round trip
    v = sched.predict_v_from_start_and_noise(x0, t, noise)
    x0_rec_v = sched.predict_start_from_v(x_t, t, v)
    np.testing.assert_allclose(np.asarray(x0_rec_v), np.asarray(x0), atol=1e-4)


def test_q_sample_from_to_noiseless_algebra():
    sched = GaussianDiffusionContinuousTimes(noise_schedule='cosine')
    x0 = jnp.ones((2, 4, 4, 3)) * 0.5
    from_t, to_t = 0.3, 0.7
    # noiseless x_from at from_t is alpha_from * x0
    a_from, _ = log_snr_to_alpha_sigma(sched.log_snr(jnp.asarray(from_t)))
    a_to, _ = log_snr_to_alpha_sigma(sched.log_snr(jnp.asarray(to_t)))
    x_from = a_from * x0
    out = sched.q_sample_from_to(x_from, from_t, to_t, noise=jnp.zeros_like(x0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(a_to * x0), rtol=1e-5)


def test_q_posterior_closed_form():
    sched = GaussianDiffusionContinuousTimes(noise_schedule='cosine')
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (2, 4, 4, 3))
    noise = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 3))
    t = jnp.asarray([0.8, 0.5])
    t_next = jnp.asarray([0.7, 0.4])
    x_t, *_ = sched.q_sample(x0, t, noise)

    mean, var, log_var = sched.q_posterior(x0, x_t, t, t_next=t_next)

    ls = np.asarray(sched.log_snr(t))[:, None, None, None]
    ls_n = np.asarray(sched.log_snr(t_next))[:, None, None, None]
    a = np.sqrt(1 / (1 + np.exp(-ls)))
    a_n = np.sqrt(1 / (1 + np.exp(-ls_n)))
    s_n = np.sqrt(1 / (1 + np.exp(ls_n)))
    c = -np.expm1(ls - ls_n)
    exp_mean = a_n * (np.asarray(x_t) * (1 - c) / a + c * np.asarray(x0))
    exp_var = s_n ** 2 * c
    np.testing.assert_allclose(np.asarray(mean), exp_mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), exp_var, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(jnp.exp(log_var)), exp_var, rtol=1e-3, atol=1e-7)


def test_sampling_timesteps_layout():
    sched = GaussianDiffusionContinuousTimes(timesteps=10)
    t, t_next = sched.get_sampling_timesteps(batch=3)
    assert t.shape == (10, 3) and t_next.shape == (10, 3)
    np.testing.assert_allclose(np.asarray(t[0]), 1.)
    np.testing.assert_allclose(np.asarray(t_next[-1]), 0., atol=1e-7)
    # contiguous pairs
    np.testing.assert_allclose(np.asarray(t[1:]), np.asarray(t_next[:-1]), atol=1e-7)


# --- EDM math ---

def test_edm_schedule_endpoints():
    sig = edm_math.sample_schedule(32, rho=7., sigma_min=0.002, sigma_max=80.)
    assert sig.shape == (33,)
    np.testing.assert_allclose(float(sig[0]), 80., rtol=1e-5)
    np.testing.assert_allclose(float(sig[31]), 0.002, rtol=1e-4)
    assert float(sig[32]) == 0.
    assert np.all(np.diff(np.asarray(sig)) < 0)


def test_edm_preconditioning_identities():
    sd = 0.5
    sigma = jnp.asarray([0.002, 0.1, 1.0, 80.0])
    cs = edm_math.c_skip(sd, sigma)
    co = edm_math.c_out(sd, sigma)
    ci = edm_math.c_in(sd, sigma)
    # Table 1 identities: c_skip^2 + (c_out/sigma_data * sigma... ) boundary checks
    np.testing.assert_allclose(np.asarray(cs), sd**2 / (sigma**2 + sd**2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(co), np.asarray(sigma) * sd / np.sqrt(sigma**2 + sd**2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ci), 1 / np.sqrt(sigma**2 + sd**2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(edm_math.c_noise(sigma)), np.log(sigma) * 0.25, rtol=1e-5)


def test_edm_loss_weight_and_noise_dist():
    sd = 0.5
    sigma = jnp.asarray([0.1, 1.0])
    w = edm_math.loss_weight(sd, sigma)
    np.testing.assert_allclose(
        np.asarray(w), (sigma**2 + sd**2) / (sigma * sd) ** 2, rtol=1e-5)

    key = jax.random.PRNGKey(0)
    sig = edm_math.noise_distribution(key, P_mean=-1.2, P_std=1.2, batch_size=4096)
    logs = np.log(np.asarray(sig))
    assert abs(logs.mean() + 1.2) < 0.1
    assert abs(logs.std() - 1.2) < 0.1


def test_gammas():
    sig = edm_math.sample_schedule(32, 7., 0.002, 80.)
    g = edm_math.gammas_for_schedule(sig, 32, S_churn=80., S_tmin=0.05, S_tmax=50.)
    gv = np.asarray(g)
    assert gv[0] == 0.          # sigma_max=80 > S_tmax=50
    assert gv[-1] == 0.         # sigma=0 < S_tmin
    assert np.any(gv == min(80. / 32, 2 ** 0.5 - 1))


def test_topk_threshold_matches_quantile():
    """threshold_x_start's top-k order-statistic must equal jnp.quantile."""
    from imagen_tpu.diffusion.imagen import Imagen
    from imagen_tpu.models.unet2d import Unet
    from imagen_tpu.ops.tensor_utils import right_pad_dims_to

    imagen = Imagen(
        unets=(Unet(dim=8, dim_mults=(1, 2), text_embed_dim=16, cond_dim=8,
                    attn_dim_head=4, attn_heads=2, attn_pool_num_latents=2,
                    max_text_len=8, layer_attns=False,
                    layer_cross_attns=(False, True)),),
        image_sizes=(16,), text_embed_dim=16, timesteps=4)

    for pct in (0.95, 0.9, 0.995):
        imagen.dynamic_thresholding_percentile = pct
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 16, 16, 3)) * 2.5
        out = imagen.threshold_x_start(x, True)

        flat = jnp.abs(x.reshape(3, -1))
        s = jnp.clip(jnp.quantile(flat, pct, axis=-1), 1.)
        s = s[:, None, None, None]
        expected = jnp.clip(x, -s, s) / s
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), atol=1e-5, rtol=1e-5)
