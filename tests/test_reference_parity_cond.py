"""Cross-framework parity for the CONDITIONED paths (VERDICT r2 item 5):

  (a) inpaint / RePaint sampling      (reference imagen_pytorch.py:2248-2279)
  (b) init_images + skip_steps img2img (reference :2209-2234)
  (c) cond_images                      (reference :1622-1630, :2294-2498)
  (d) training-loss VALUE parity       (reference :2500-2638, elucidated :761-940)

Same harness as test_reference_parity.py: the torch reference runs in-process on
CPU with ported weights; all randomness is drawn host-side and fed to both
frameworks (noise_override / loss noise kwargs on ours, a torch.randn patch on
the reference).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tools.port_weights import port_unet_params
from tools.ref_compat import load_reference

ip = load_reference()

from imagen_tpu.diffusion.elucidated import ElucidatedImagen
from imagen_tpu.diffusion.imagen import Imagen
from imagen_tpu.models.unet2d import Unet

from test_reference_parity import (
    BASE_CFG, _NoiseQueue, _nchw, _nhwc, _port, _randomize_final_conv)


def _make_pair(cfg, timesteps=4, seed=2, cond_drop_prob=0.1, **imagen_kwargs):
    torch.manual_seed(seed)
    ref_unet = _randomize_final_conv(ip.Unet(**cfg).float())
    ref_imagen = ip.Imagen(
        unets=ref_unet, image_sizes=(16,), timesteps=timesteps,
        text_embed_dim=16, cond_drop_prob=cond_drop_prob, **imagen_kwargs).eval()

    mine = Imagen(
        unets=(Unet(**cfg),), image_sizes=(16,), timesteps=timesteps,
        text_embed_dim=16, cond_drop_prob=cond_drop_prob, **imagen_kwargs)

    init_kwargs = dict(text_embeds=jnp.zeros((1, 8, 16)),
                       text_mask=jnp.ones((1, 8), bool))
    if cfg.get('cond_images_channels', 0):
        init_kwargs['cond_images'] = jnp.zeros(
            (1, 16, 16, cfg['cond_images_channels']))
    variables = _port(ref_imagen.unets[0], mine.unets[0], (1, 16, 16, 3),
                      **init_kwargs)
    return ref_imagen, mine, variables


def test_repaint_inpaint_sample_parity():
    """RePaint resampling (R=2): per-(t, r) inpaint-noise, ancestral-step noise,
    and renoise draws are host-fed to both frameworks in the reference's draw
    order; the splice/renoise lattice must then agree to the pixel tolerance.

    T=2 x R=2 executes every semantic branch (inpaint splice each iteration,
    ancestral step, renoise at the non-last lattice point) in 4 unet
    evaluations. Longer lattices diverge numerically, not semantically: an
    UNTRAINED unet is ~20-40x expansive per step (see test_edm_sample_parity),
    so per-step fp32 round-off amplifies chaotically — measured drift here is
    1.2e-5 (1 eval) / 6.5e-4 (4 evals) / 0.199 (8 evals) with bit-identical
    loop mechanics."""
    T, R, b = 2, 2, 2
    ref_imagen, mine, variables = _make_pair(BASE_CFG, timesteps=T, seed=11)

    rng = np.random.RandomState(13)
    emb = rng.randn(b, 8, 16).astype(np.float32)
    inpaint = rng.rand(b, 3, 16, 16).astype(np.float32)
    mask = np.zeros((b, 16, 16), bool)
    mask[:, 4:12, 4:12] = True

    init = rng.randn(b, 3, 16, 16).astype(np.float32)
    inp_n = rng.randn(T, R, b, 3, 16, 16).astype(np.float32)
    step_n = rng.randn(T, R, b, 3, 16, 16).astype(np.float32)
    ren_n = rng.randn(T, R, b, 3, 16, 16).astype(np.float32)

    # reference draw order: per t, per r (reversed(range(R)) = our i=0..R-1):
    # q_sample inpaint noise, p_sample noise, then q_sample_from_to renoise
    # UNLESS last resample iteration or last timestep (those draws are skipped)
    queue = [init]
    for ti in range(T):
        for ri in range(R):
            queue.append(inp_n[ti, ri])
            queue.append(step_n[ti, ri])
            if not (ri == R - 1 or ti == T - 1):
                queue.append(ren_n[ti, ri])

    with torch.no_grad(), _NoiseQueue(queue) as q:
        out_ref = ref_imagen.sample(
            text_embeds=torch.tensor(emb),
            inpaint_images=torch.tensor(inpaint),
            inpaint_masks=torch.tensor(mask),
            inpaint_resample_times=R,
            cond_scale=2., use_tqdm=False).numpy()
    assert not q.arrays, 'reference consumed fewer noise draws than expected'

    def to_trj(a):  # (T, R, b, c, h, w) -> (T, R, b, h, w, c)
        return jnp.asarray(np.transpose(a, (0, 1, 2, 4, 5, 3)))

    out_mine = mine.sample(
        (variables,), jax.random.PRNGKey(0), text_embeds=jnp.asarray(emb),
        inpaint_images=jnp.asarray(_nhwc(inpaint)),
        inpaint_masks=jnp.asarray(mask),
        inpaint_resample_times=R, cond_scale=2.,
        noise_override=[(jnp.asarray(_nhwc(init)), to_trj(inp_n),
                         to_trj(step_n), to_trj(ren_n))])

    diff = np.abs(out_ref - _nchw(out_mine)).max()
    assert diff <= 1e-2, f'RePaint parity broke: max abs pixel diff {diff}'


def test_img2img_init_skip_parity():
    """init_images + skip_steps (img2img): the init image adds onto the noise
    draw and the trajectory starts skip_steps into the schedule."""
    T, skip, b = 6, 2, 2
    ref_imagen, mine, variables = _make_pair(BASE_CFG, timesteps=T, seed=17)

    rng = np.random.RandomState(19)
    emb = rng.randn(b, 8, 16).astype(np.float32)
    init_img = rng.rand(b, 3, 16, 16).astype(np.float32)
    used = T - skip
    init_noise = rng.randn(b, 3, 16, 16).astype(np.float32)
    step_noises = rng.randn(used, b, 3, 16, 16).astype(np.float32)

    with torch.no_grad(), _NoiseQueue([init_noise, *step_noises]) as q:
        out_ref = ref_imagen.sample(
            text_embeds=torch.tensor(emb),
            init_images=torch.tensor(init_img), skip_steps=skip,
            cond_scale=2., use_tqdm=False).numpy()
    assert not q.arrays

    out_mine = mine.sample(
        (variables,), jax.random.PRNGKey(0), text_embeds=jnp.asarray(emb),
        init_images=jnp.asarray(_nhwc(init_img)), skip_steps=skip,
        cond_scale=2.,
        noise_override=[(jnp.asarray(_nhwc(init_noise)),
                         jnp.asarray(np.stack([_nhwc(s) for s in step_noises])))])

    diff = np.abs(out_ref - _nchw(out_mine)).max()
    assert diff <= 1e-2, f'img2img parity broke: max abs pixel diff {diff}'


COND_IMG_CFG = dict(BASE_CFG, cond_images_channels=3)


def test_cond_images_sample_parity():
    """cond_images conditioning channel (reference :1622-1630): forward parity
    AND fixed-noise sample parity with the extra image conditioning."""
    T, b = 4, 2
    ref_imagen, mine, variables = _make_pair(COND_IMG_CFG, timesteps=T, seed=23)

    rng = np.random.RandomState(29)
    emb = rng.randn(b, 8, 16).astype(np.float32)
    cond_img = rng.rand(b, 3, 16, 16).astype(np.float32)
    x = rng.randn(b, 3, 16, 16).astype(np.float32)
    t = rng.rand(b).astype(np.float32)

    with torch.no_grad():
        out_ref = ref_imagen.unets[0](
            torch.tensor(x), torch.tensor(t),
            text_embeds=torch.tensor(emb),
            text_mask=torch.ones(b, 8, dtype=torch.bool),
            cond_images=torch.tensor(cond_img)).numpy()
    out_mine = mine.unets[0].apply(
        variables, jnp.asarray(_nhwc(x)), jnp.asarray(t),
        text_embeds=jnp.asarray(emb), text_mask=jnp.ones((b, 8), bool),
        cond_images=jnp.asarray(_nhwc(cond_img)))
    diff = np.abs(out_ref - _nchw(out_mine)).max()
    assert diff <= 1e-4, f'cond_images forward parity broke: {diff}'

    init_noise = rng.randn(b, 3, 16, 16).astype(np.float32)
    step_noises = rng.randn(T, b, 3, 16, 16).astype(np.float32)
    with torch.no_grad(), _NoiseQueue([init_noise, *step_noises]) as q:
        s_ref = ref_imagen.sample(
            text_embeds=torch.tensor(emb),
            cond_images=torch.tensor(cond_img),
            cond_scale=2., use_tqdm=False).numpy()
    assert not q.arrays

    s_mine = mine.sample(
        (variables,), jax.random.PRNGKey(0), text_embeds=jnp.asarray(emb),
        cond_images=jnp.asarray(_nhwc(cond_img)), cond_scale=2.,
        noise_override=[(jnp.asarray(_nhwc(init_noise)),
                         jnp.asarray(np.stack([_nhwc(s) for s in step_noises])))])
    sdiff = np.abs(s_ref - _nchw(s_mine)).max()
    assert sdiff <= 1e-2, f'cond_images sample parity broke: {sdiff}'


def test_p_losses_value_parity():
    """Training-loss VALUE parity: same ported weights + host-drawn times/noise
    give the same p_losses scalar (min-SNR weighting + fp32 loss islands
    included). cond_drop_prob=0 removes the only other randomness."""
    b = 2
    ref_imagen, mine, variables = _make_pair(
        BASE_CFG, timesteps=4, seed=31, cond_drop_prob=0.)

    rng = np.random.RandomState(37)
    images = rng.rand(b, 3, 16, 16).astype(np.float32)
    emb = rng.randn(b, 8, 16).astype(np.float32)
    times = rng.rand(b).astype(np.float32) * 0.9 + 0.05
    noise = rng.randn(b, 3, 16, 16).astype(np.float32)

    with torch.no_grad():
        loss_ref = float(ref_imagen.p_losses(
            ref_imagen.unets[0], torch.tensor(images), torch.tensor(times),
            noise_scheduler=ref_imagen.noise_schedulers[0],
            text_embeds=torch.tensor(emb),
            text_mask=torch.ones(b, 8, dtype=torch.bool),
            noise=torch.tensor(noise),
            pred_objective='noise', min_snr_gamma=5))

    loss_mine = float(mine.p_losses(
        mine.unets[0], variables, jnp.asarray(_nhwc(images)),
        jnp.asarray(times), jax.random.PRNGKey(0),
        noise_scheduler=mine.noise_schedulers[0],
        text_embeds=jnp.asarray(emb), text_mask=jnp.ones((b, 8), bool),
        noise=jnp.asarray(_nhwc(noise)),
        pred_objective='noise', min_snr_gamma=5))

    np.testing.assert_allclose(loss_ref, loss_mine, rtol=1e-4, atol=1e-5)


def test_edm_loss_value_parity():
    """EDM training-loss VALUE parity: the log-normal sigma draw and the unit
    noise are host-fed to both frameworks (sigmas/noise kwargs on ours, the
    randn patch on the reference); the preconditioned loss must agree."""
    b = 2
    torch.manual_seed(41)
    ref_unet = _randomize_final_conv(ip.Unet(**BASE_CFG).float())
    ref_edm = ip.ElucidatedImagen(
        unets=ref_unet, image_sizes=(16,), text_embed_dim=16,
        cond_drop_prob=0., num_sample_steps=4).eval()
    mine = ElucidatedImagen(
        unets=(Unet(**BASE_CFG),), image_sizes=(16,), text_embed_dim=16,
        cond_drop_prob=0., num_sample_steps=4)
    variables = _port(ref_edm.unets[0], mine.unets[0], (1, 16, 16, 3),
                      text_embeds=jnp.zeros((1, 8, 16)),
                      text_mask=jnp.ones((1, 8), bool))

    rng = np.random.RandomState(43)
    images = rng.rand(b, 3, 16, 16).astype(np.float32)
    emb = rng.randn(b, 8, 16).astype(np.float32)
    sigma_eps = rng.randn(b).astype(np.float32)
    noise = rng.randn(b, 3, 16, 16).astype(np.float32)

    with torch.no_grad(), _NoiseQueue([sigma_eps, noise]) as q:
        loss_ref = float(ref_edm(
            torch.tensor(images), text_embeds=torch.tensor(emb),
            text_masks=torch.ones(b, 8, dtype=torch.bool), unet_number=1))
    assert not q.arrays

    hp = ref_edm.hparams[0]
    sigmas = jnp.exp(hp.P_mean + hp.P_std * jnp.asarray(sigma_eps))
    loss_mine = float(mine.forward(
        (variables,), jnp.asarray(_nhwc(images)), jax.random.PRNGKey(0),
        text_embeds=jnp.asarray(emb), text_masks=jnp.ones((b, 8), bool),
        unet_number=1, sigmas=sigmas, noise=jnp.asarray(_nhwc(noise))))

    np.testing.assert_allclose(loss_ref, loss_mine, rtol=1e-4, atol=1e-5)
