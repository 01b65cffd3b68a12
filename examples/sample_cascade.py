"""Full-cascade sampling with classifier-free guidance, inpainting, and EMA params
(mirrors reference README sampling sections, README.md:204-308)."""
import jax
import jax.numpy as jnp

from imagen_tpu import ElucidatedImagen, Unet

unet1 = Unet(dim=32, cond_dim=128, dim_mults=(1, 2), text_embed_dim=768,
             layer_attns=(False, True), layer_cross_attns=(False, True),
             attn_dim_head=32, attn_heads=4, max_text_len=64,
             attn_pool_num_latents=8)
unet2 = Unet(dim=32, cond_dim=128, dim_mults=(1, 2), text_embed_dim=768,
             memory_efficient=True, layer_attns=(False, True),
             layer_cross_attns=(False, True), attn_dim_head=32, attn_heads=4,
             max_text_len=64, attn_pool_num_latents=8)

imagen = ElucidatedImagen(
    unets=(unet1, unet2),
    image_sizes=(16, 32),
    cond_drop_prob=0.1,
    num_sample_steps=(16, 8),
    sigma_min=0.002, sigma_max=80,
)

key = jax.random.PRNGKey(0)
params = imagen.init_params(key, text_len=8)

text_embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 768))

# plain cascade sampling with CFG
images = imagen.sample(params, key, text_embeds=text_embeds, cond_scale=3.)
print('cascade sample:', images.shape)

# inpainting (RePaint resampling)
inpaint_images = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
inpaint_masks = jnp.zeros((2, 32, 32), bool).at[:, 8:24, 8:24].set(True)
images = imagen.sample(params, key, text_embeds=text_embeds,
                       inpaint_images=inpaint_images,
                       inpaint_masks=inpaint_masks,
                       inpaint_resample_times=3)
print('inpainted sample:', images.shape)
