"""Three-stage cascade (BASELINE config 4 shape): base + memory-efficient SR stages
with pixel-shuffle upsamplers, plus host-offload of non-active stage params."""
import jax
import jax.numpy as jnp
import numpy as np

from imagen_tpu.diffusion.imagen import Imagen
from imagen_tpu.models.unet2d import NullUnet, Unet

KEY = jax.random.PRNGKey(0)

BASE = dict(
    dim=8, dim_mults=(1, 2), text_embed_dim=16, cond_dim=8, attn_dim_head=4,
    attn_heads=2, attn_pool_num_latents=2, max_text_len=8,
    layer_attns=False, layer_cross_attns=(False, True),
)


def test_three_stage_cascade_sample_and_offload():
    imagen = Imagen(
        unets=(
            Unet(**BASE),
            Unet(**BASE, memory_efficient=True, pixel_shuffle_upsample=True),
            Unet(**BASE, memory_efficient=True, pixel_shuffle_upsample=True),
        ),
        image_sizes=(4, 8, 16),
        text_embed_dim=16,
        timesteps=(3, 3, 3),
        random_crop_sizes=(None, 8, 8),
        cond_drop_prob=0.1,
    )
    params = imagen.init_params(KEY, text_len=6)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    masks = jnp.ones((2, 6), bool)

    # train loss on the SR tail (exercises random-crop path)
    images = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3))
    for n in (1, 2, 3):
        loss = imagen.forward(params, images, jax.random.PRNGKey(n),
                              text_embeds=embeds, text_masks=masks, unet_number=n)
        assert jnp.isfinite(loss), n

    # full cascade with host-offloaded non-active params
    from imagen_tpu.parallel.mesh import device_restore, host_offload
    parked = tuple(host_offload(p) for p in params)
    restored = tuple(device_restore(p) for p in parked)
    out = imagen.sample(restored, jax.random.PRNGKey(4), text_embeds=embeds,
                        text_masks=masks, cond_scale=2.)
    assert out.shape == (2, 16, 16, 3)

    # AUTOMATIC offload: host-parked params go straight into sample(); each
    # stage is juggled on-device just-in-time (reference one_unet_in_gpu,
    # imagen_pytorch.py:2011-2028) and the result is identical
    out_auto = imagen.sample(parked, jax.random.PRNGKey(4), text_embeds=embeds,
                             text_masks=masks, cond_scale=2.,
                             offload_inactive_unets=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_auto))


def test_null_unet_first_stage():
    """NullUnet placeholder lets the cascade skip stage 1 at training time
    (reference test idiom with placeholder stages)."""
    imagen = Imagen(
        unets=(NullUnet(), Unet(**BASE)),
        image_sizes=(8, 16),
        text_embed_dim=16,
        timesteps=3,
        cond_drop_prob=0.1,
    )
    params = imagen.init_params(KEY, text_len=6)
    images = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3))
    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    loss = imagen.forward(params, images, jax.random.PRNGKey(1),
                          text_embeds=embeds,
                          text_masks=jnp.ones((2, 6), bool), unet_number=2)
    assert jnp.isfinite(loss)

    # sampling must start past the null stage, from a provided start image
    start = jax.random.uniform(jax.random.PRNGKey(3), (2, 8, 8, 3))
    out = imagen.sample(params, jax.random.PRNGKey(5), text_embeds=embeds,
                        text_masks=jnp.ones((2, 6), bool),
                        start_at_unet_number=2, start_image_or_video=start)
    assert out.shape == (2, 16, 16, 3)


def test_golden_seed_statistics():
    """Fixed-seed sampling produces deterministic, well-ranged output."""
    imagen = Imagen(unets=(Unet(**BASE),), image_sizes=(8,), text_embed_dim=16,
                    timesteps=4, cond_drop_prob=0.1)
    params = imagen.init_params(KEY, text_len=6)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    masks = jnp.ones((2, 6), bool)

    out1 = imagen.sample(params, jax.random.PRNGKey(7), text_embeds=embeds,
                         text_masks=masks)
    out2 = imagen.sample(params, jax.random.PRNGKey(7), text_embeds=embeds,
                         text_masks=masks)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.all(np.asarray(out1) >= 0.) and np.all(np.asarray(out1) <= 1.)
