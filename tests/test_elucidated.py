"""ElucidatedImagen (EDM) tests: loss, churn+Heun sampling, cascade."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagen_tpu.diffusion.elucidated import ElucidatedImagen
from imagen_tpu.models.unet2d import Unet

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
)


def tiny_elucidated(**kwargs):
    base = dict(
        unets=(Unet(**TINY_UNET),),
        image_sizes=(16,),
        text_embed_dim=16,
        cond_drop_prob=0.1,
        num_sample_steps=6,
    )
    return ElucidatedImagen(**{**base, **kwargs})


def batch(b=2, size=16, text_len=6, text_dim=16):
    images = jax.random.uniform(jax.random.PRNGKey(5), (b, size, size, 3))
    text_embeds = jax.random.normal(jax.random.PRNGKey(6), (b, text_len, text_dim))
    text_masks = jnp.ones((b, text_len), dtype=bool)
    return images, text_embeds, text_masks


def test_edm_loss_and_sample():
    imagen = tiny_elucidated()
    params = imagen.init_params(KEY, text_len=6)
    images, text_embeds, text_masks = batch()

    loss = imagen.forward(params, images, jax.random.PRNGKey(1),
                          text_embeds=text_embeds, text_masks=text_masks)
    assert jnp.isfinite(loss) and loss.shape == ()

    out = imagen.sample(params, jax.random.PRNGKey(2), text_embeds=text_embeds,
                        text_masks=text_masks, cond_scale=1.)
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.asarray(out) >= 0.) and np.all(np.asarray(out) <= 1.)


def test_edm_cascade_with_cfg_and_hparams():
    imagen = ElucidatedImagen(
        unets=(Unet(**TINY_UNET), Unet(**TINY_UNET)),
        image_sizes=(8, 16),
        text_embed_dim=16,
        cond_drop_prob=0.1,
        num_sample_steps=(4, 5),
        sigma_min=0.002,
        sigma_max=(80, 160),
    )
    assert imagen.hparams[0].num_sample_steps == 4
    assert imagen.hparams[1].sigma_max == 160

    params = imagen.init_params(KEY, text_len=6)
    images, text_embeds, text_masks = batch()

    for n in (1, 2):
        loss = imagen.forward(params, images, jax.random.PRNGKey(n),
                              text_embeds=text_embeds, text_masks=text_masks,
                              unet_number=n)
        assert jnp.isfinite(loss)

    out = imagen.sample(params, jax.random.PRNGKey(3), text_embeds=text_embeds,
                        text_masks=text_masks, cond_scale=3.)
    assert out.shape == (2, 16, 16, 3)


def test_edm_inpainting():
    imagen = tiny_elucidated()
    params = imagen.init_params(KEY, text_len=6)
    images, text_embeds, text_masks = batch()
    inpaint_masks = jnp.zeros((2, 16, 16), dtype=bool).at[:, :8].set(True)
    out = imagen.sample(params, jax.random.PRNGKey(4), text_embeds=text_embeds,
                        text_masks=text_masks, inpaint_images=images,
                        inpaint_masks=inpaint_masks, inpaint_resample_times=2)
    assert out.shape == (2, 16, 16, 3)
    exp = np.asarray(imagen.unnormalize_img(
        jnp.clip(imagen.normalize_img(images), -1, 1)))
    np.testing.assert_allclose(np.asarray(out)[:, :8], exp[:, :8], atol=1e-5)


def test_edm_trainer_integration():
    from imagen_tpu.trainer import ImagenTrainer
    trainer = ImagenTrainer(imagen=tiny_elucidated())
    assert trainer.is_elucidated
    images = np.zeros((4, 16, 16, 3), dtype=np.float32)
    embeds = np.zeros((4, 6, 16), dtype=np.float32)
    loss = trainer.forward(images=images, text_embeds=embeds, unet_number=1)
    trainer.update(1)
    assert np.isfinite(loss)
    assert trainer.num_steps_taken(1) == 1
