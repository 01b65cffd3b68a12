"""End-to-end video Imagen: Unet3D inside the cascade wrapper (BASELINE config 5
shape: temporal attention + pseudo-3D convs, text-to-video sampling)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagen_tpu.diffusion.imagen import Imagen
from imagen_tpu.models.unet3d import Unet3D

KEY = jax.random.PRNGKey(0)

TINY_3D = dict(
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


def video_imagen(**kwargs):
    return Imagen(
        unets=(Unet3D(**TINY_3D),),
        image_sizes=(8,),
        text_embed_dim=16,
        timesteps=4,
        cond_drop_prob=0.1,
        **kwargs,
    )


def batch(b=1, f=4, size=8, text_len=6, text_dim=16):
    videos = jax.random.uniform(jax.random.PRNGKey(5), (b, f, size, size, 3))
    text_embeds = jax.random.normal(jax.random.PRNGKey(6), (b, text_len, text_dim))
    text_masks = jnp.ones((b, text_len), dtype=bool)
    return videos, text_embeds, text_masks


def test_video_loss_and_sample():
    imagen = video_imagen()
    assert imagen.is_video
    params = imagen.init_params(KEY, text_len=6)
    videos, text_embeds, text_masks = batch()

    loss = imagen.forward(params, videos, jax.random.PRNGKey(1),
                          text_embeds=text_embeds, text_masks=text_masks)
    assert jnp.isfinite(loss)

    out = imagen.sample(params, jax.random.PRNGKey(2), text_embeds=text_embeds,
                        text_masks=text_masks, video_frames=4)
    assert out.shape == (1, 4, 8, 8, 3)


def test_video_still_image_training():
    """Training a video unet on still images via ignore_time (reference :2644-2646)."""
    imagen = video_imagen()
    params = imagen.init_params(KEY, text_len=6)
    images = jax.random.uniform(jax.random.PRNGKey(7), (2, 8, 8, 3))
    text_embeds = jax.random.normal(jax.random.PRNGKey(6), (2, 6, 16))
    loss = imagen.forward(params, images, jax.random.PRNGKey(1),
                          text_embeds=text_embeds,
                          text_masks=jnp.ones((2, 6), bool))
    assert jnp.isfinite(loss)


def test_video_cascade_temporal_downsample():
    sr = Unet3D(**TINY_3D)
    imagen = Imagen(
        unets=(Unet3D(**TINY_3D), sr),
        image_sizes=(8, 16),
        text_embed_dim=16,
        timesteps=4,
        temporal_downsample_factor=(2, 1),
        cond_drop_prob=0.1,
    )
    params = imagen.init_params(KEY, text_len=6)
    videos, text_embeds, text_masks = batch(f=4, size=16)

    for n in (1, 2):
        loss = imagen.forward(params, videos, jax.random.PRNGKey(n),
                              text_embeds=text_embeds, text_masks=text_masks,
                              unet_number=n)
        assert jnp.isfinite(loss), n

    out = imagen.sample(params, jax.random.PRNGKey(3), text_embeds=text_embeds,
                        text_masks=text_masks, video_frames=4)
    assert out.shape == (1, 4, 16, 16, 3)


def test_video_cond_frames_sampling():
    imagen = video_imagen()
    params = imagen.init_params(KEY, text_len=6)
    _, text_embeds, text_masks = batch()
    cond_frames = jax.random.uniform(jax.random.PRNGKey(8), (1, 2, 8, 8, 3))
    out = imagen.sample(params, jax.random.PRNGKey(2), text_embeds=text_embeds,
                        text_masks=text_masks, video_frames=4,
                        cond_video_frames=cond_frames)
    assert out.shape == (1, 4, 8, 8, 3)
