"""ElucidatedImagen with Unet3D (EDM video path)."""
import jax
import jax.numpy as jnp
import pytest

from imagen_tpu.diffusion.elucidated import ElucidatedImagen
from imagen_tpu.models.unet3d import Unet3D

KEY = jax.random.PRNGKey(0)

TINY_3D = dict(
    dim=8, dim_mults=(1, 2), text_embed_dim=16, cond_dim=8, attn_dim_head=4,
    attn_heads=2, attn_pool_num_latents=2, max_text_len=8,
    layer_attns=False, layer_cross_attns=(False, True),
)


def test_edm_video_loss_and_sample():
    imagen = ElucidatedImagen(
        unets=(Unet3D(**TINY_3D),),
        image_sizes=(8,),
        text_embed_dim=16,
        cond_drop_prob=0.1,
        num_sample_steps=4,
    )
    assert imagen.is_video
    params = imagen.init_params(KEY, text_len=6)
    videos = jax.random.uniform(jax.random.PRNGKey(5), (1, 4, 8, 8, 3))
    embeds = jax.random.normal(jax.random.PRNGKey(6), (1, 6, 16))
    masks = jnp.ones((1, 6), bool)

    loss = imagen.forward(params, videos, jax.random.PRNGKey(1),
                          text_embeds=embeds, text_masks=masks)
    assert jnp.isfinite(loss)

    # still-image training via ignore_time
    images = jax.random.uniform(jax.random.PRNGKey(7), (2, 8, 8, 3))
    loss = imagen.forward(params, images, jax.random.PRNGKey(2),
                          text_embeds=jnp.zeros((2, 6, 16)),
                          text_masks=jnp.ones((2, 6), bool))
    assert jnp.isfinite(loss)

    out = imagen.sample(params, jax.random.PRNGKey(3), text_embeds=embeds,
                        text_masks=masks, video_frames=4, cond_scale=2.)
    assert out.shape == (1, 4, 8, 8, 3)
