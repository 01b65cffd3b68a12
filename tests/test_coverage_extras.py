"""Coverage for remaining paths: cond_images end-to-end, only_train_unet_number,
checkpoint-folder step selection, uint8 input casting."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagen_tpu.diffusion.imagen import Imagen
from imagen_tpu.models.unet2d import Unet
from imagen_tpu.trainer import ImagenTrainer

KEY = jax.random.PRNGKey(0)

TINY = dict(
    dim=8, dim_mults=(1, 2), text_embed_dim=16, cond_dim=8, attn_dim_head=4,
    attn_heads=2, attn_pool_num_latents=2, max_text_len=8,
    layer_attns=False, layer_cross_attns=(False, True),
)


def test_cond_images_end_to_end():
    unet = Unet(**TINY, cond_images_channels=2)
    imagen = Imagen(unets=(unet,), image_sizes=(16,), text_embed_dim=16,
                    timesteps=3, cond_drop_prob=0.1)
    params = imagen.init_params(KEY, text_len=6)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    cond_images = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 2))
    embeds = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 16))
    masks = jnp.ones((2, 6), bool)

    loss = imagen.forward(params, images, jax.random.PRNGKey(4),
                          text_embeds=embeds, text_masks=masks,
                          cond_images=cond_images)
    assert jnp.isfinite(loss)

    out = imagen.sample(params, jax.random.PRNGKey(5), text_embeds=embeds,
                        text_masks=masks, cond_images=cond_images, cond_scale=2.)
    assert out.shape == (2, 16, 16, 3)


def test_uint8_images_accepted():
    imagen = Imagen(unets=(Unet(**TINY),), image_sizes=(16,), text_embed_dim=16,
                    timesteps=3, cond_drop_prob=0.1)
    params = imagen.init_params(KEY, text_len=6)
    images = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (2, 16, 16, 3), np.uint8))
    embeds = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 16))
    loss = imagen.forward(params, images, jax.random.PRNGKey(4),
                          text_embeds=embeds, text_masks=jnp.ones((2, 6), bool))
    assert jnp.isfinite(loss)


def test_only_train_unet_number_enforced():
    imagen = Imagen(unets=(Unet(**TINY), Unet(**TINY)), image_sizes=(8, 16),
                    text_embed_dim=16, timesteps=3, cond_drop_prob=0.1)
    trainer = ImagenTrainer(imagen=imagen, only_train_unet_number=2, verbose=False)
    batch = dict(images=jnp.zeros((2, 16, 16, 3)),
                 text_embeds=jnp.zeros((2, 6, 16)),
                 text_masks=jnp.ones((2, 6), bool))
    loss = trainer.step_with_batch(batch, unet_number=2)
    assert np.isfinite(loss)
    with pytest.raises(AssertionError):
        trainer.step_with_batch(batch, unet_number=1)


def test_load_from_checkpoint_folder_specific_step(tmp_path):
    imagen = Imagen(unets=(Unet(**TINY),), image_sizes=(16,), text_embed_dim=16,
                    timesteps=3, cond_drop_prob=0.1)
    trainer = ImagenTrainer(
        imagen=imagen, checkpoint_path=str(tmp_path / 'ckpts'),
        checkpoint_every=1, verbose=False)
    batch = dict(images=jnp.zeros((2, 16, 16, 3)),
                 text_embeds=jnp.zeros((2, 6, 16)),
                 text_masks=jnp.ones((2, 6), bool))
    trainer.step_with_batch(batch, unet_number=1)
    trainer.step_with_batch(batch, unet_number=1)
    assert len(trainer.all_checkpoints_sorted) == 2

    trainer.load_from_checkpoint_folder(last_total_steps=1)
    assert trainer.num_steps_taken(1) == 1
