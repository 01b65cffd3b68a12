"""End-to-end tests of the Imagen DDPM wrapper: loss decreases + sampling shapes.

Follows the reference's mock-embedding idiom (test_trainer.py:26-53): zero/noise
images + random text embeds of the configured width, tiny dims.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from imagen_tpu.diffusion.imagen import Imagen
from imagen_tpu.models.unet2d import NullUnet, Unet

KEY = jax.random.PRNGKey(0)

TINY_UNET = dict(
    dim=8,
    dim_mults=(1, 2),
    text_embed_dim=16,
    cond_dim=8,
    attn_dim_head=4,
    attn_heads=2,
    attn_pool_num_latents=2,
    max_text_len=8,
    layer_attns=False,
    layer_cross_attns=(False, True),
    memory_efficient=False,
)


def tiny_imagen(timesteps=8, **kwargs):
    base = dict(
        unets=(Unet(**TINY_UNET),),
        image_sizes=(16,),
        text_embed_dim=16,
        timesteps=timesteps,
        cond_drop_prob=0.1,
    )
    return Imagen(**{**base, **kwargs})


def batch(b=2, size=16, text_len=6, text_dim=16):
    images = jax.random.uniform(jax.random.PRNGKey(5), (b, size, size, 3))
    text_embeds = jax.random.normal(jax.random.PRNGKey(6), (b, text_len, text_dim))
    text_masks = jnp.ones((b, text_len), dtype=bool)
    return images, text_embeds, text_masks


def test_loss_and_sample_single_unet():
    imagen = tiny_imagen()
    params = imagen.init_params(KEY, text_len=6)
    images, text_embeds, text_masks = batch()

    loss = imagen.forward(params, images, jax.random.PRNGKey(1),
                          text_embeds=text_embeds, text_masks=text_masks)
    assert jnp.isfinite(loss) and loss.shape == ()

    out = imagen.sample(params, jax.random.PRNGKey(2), text_embeds=text_embeds,
                        text_masks=text_masks, cond_scale=1.)
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.asarray(out) >= 0.) and np.all(np.asarray(out) <= 1.)


def test_loss_decreases_with_training():
    """BASELINE config-1 shape: one pjit-able train step decreasing loss."""
    imagen = tiny_imagen()
    params = imagen.init_params(KEY, text_len=6)[0]
    images, text_embeds, text_masks = batch(b=4)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, key):
        def loss_fn(p):
            return imagen.forward((p,), images, key, text_embeds=text_embeds,
                                  text_masks=text_masks, unet_number=1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(30):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, sub)
        losses.append(float(loss))

    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_cascade_two_unets():
    sr_unet = Unet(**{**TINY_UNET, 'layer_cross_attns': (False, True)})
    imagen = Imagen(
        unets=(Unet(**TINY_UNET), sr_unet),
        image_sizes=(8, 16),
        text_embed_dim=16,
        timesteps=(4, 4),
        cond_drop_prob=0.1,
    )
    params = imagen.init_params(KEY, text_len=6)
    images, text_embeds, text_masks = batch(b=2, size=16)

    # train loss on each unet
    for n in (1, 2):
        loss = imagen.forward(params, images, jax.random.PRNGKey(n),
                              text_embeds=text_embeds, text_masks=text_masks,
                              unet_number=n)
        assert jnp.isfinite(loss)

    # full cascade sample with CFG
    out = imagen.sample(params, jax.random.PRNGKey(4), text_embeds=text_embeds,
                        text_masks=text_masks, cond_scale=3.)
    assert out.shape == (2, 16, 16, 3)

    # return all outputs
    outs = imagen.sample(params, jax.random.PRNGKey(4), text_embeds=text_embeds,
                         text_masks=text_masks, return_all_unet_outputs=True)
    assert len(outs) == 2 and outs[0].shape == (2, 8, 8, 3)

    # stop early
    out = imagen.sample(params, jax.random.PRNGKey(4), text_embeds=text_embeds,
                        text_masks=text_masks, stop_at_unet_number=1)
    assert out.shape == (2, 8, 8, 3)


def test_inpainting_and_init_images():
    imagen = tiny_imagen()
    params = imagen.init_params(KEY, text_len=6)
    images, text_embeds, text_masks = batch()

    inpaint_images = images
    inpaint_masks = jnp.zeros((2, 16, 16), dtype=bool).at[:, :8].set(True)
    out = imagen.sample(params, jax.random.PRNGKey(7), text_embeds=text_embeds,
                        text_masks=text_masks, inpaint_images=inpaint_images,
                        inpaint_masks=inpaint_masks, inpaint_resample_times=2)
    assert out.shape == (2, 16, 16, 3)
    # inpainted region must exactly match the (normalized-roundtrip) original
    exp = np.asarray(imagen.unnormalize_img(
        jnp.clip(imagen.normalize_img(images), -1, 1)))
    np.testing.assert_allclose(
        np.asarray(out)[:, :8], exp[:, :8], atol=1e-5)

    out = imagen.sample(params, jax.random.PRNGKey(8), text_embeds=text_embeds,
                        text_masks=text_masks, init_images=images,
                        skip_steps=2)
    assert out.shape == (2, 16, 16, 3)


def test_unconditional():
    unet = Unet(**{**TINY_UNET, 'cond_on_text': False,
                   'layer_cross_attns': False})
    imagen = Imagen(unets=(unet,), image_sizes=(16,), condition_on_text=False,
                    timesteps=4)
    params = imagen.init_params(KEY)
    images = jax.random.uniform(KEY, (2, 16, 16, 3))
    loss = imagen.forward(params, images, jax.random.PRNGKey(1))
    assert jnp.isfinite(loss)
    out = imagen.sample(params, jax.random.PRNGKey(2), batch_size=2)
    assert out.shape == (2, 16, 16, 3)


def test_pred_objectives_and_schedules():
    for obj in ('noise', 'x_start', 'v'):
        for sched in ('cosine', 'linear'):
            imagen = tiny_imagen(pred_objectives=obj, noise_schedules=sched,
                                 timesteps=4)
            params = imagen.init_params(KEY, text_len=6)
            images, text_embeds, text_masks = batch()
            loss = imagen.forward(params, images, jax.random.PRNGKey(1),
                                  text_embeds=text_embeds, text_masks=text_masks)
            assert jnp.isfinite(loss), (obj, sched)


def test_loss_types():
    for lt in ('l1', 'l2', 'huber'):
        imagen = tiny_imagen(loss_type=lt, timesteps=4)
        params = imagen.init_params(KEY, text_len=6)
        images, text_embeds, text_masks = batch()
        loss = imagen.forward(params, images, jax.random.PRNGKey(1),
                              text_embeds=text_embeds, text_masks=text_masks)
        assert jnp.isfinite(loss), lt
