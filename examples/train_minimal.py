"""Minimal end-to-end training loop (mirrors the reference README usage,
README.md:57-111, with mock text embeddings).

Runs on CPU or TPU. Trains the base unet of a 2-stage 64->256 cascade for a few
steps, then samples.
"""
import jax
import jax.numpy as jnp

from imagen_tpu import Imagen, ImagenTrainer, Unet

unet1 = Unet(
    dim=32, cond_dim=128, dim_mults=(1, 2, 4), text_embed_dim=768,
    num_resnet_blocks=1, layer_attns=(False, False, True),
    layer_cross_attns=(False, False, True), attn_dim_head=32, attn_heads=4,
    max_text_len=64, attn_pool_num_latents=8,
)
unet2 = Unet(
    dim=32, cond_dim=128, dim_mults=(1, 2, 4), text_embed_dim=768,
    num_resnet_blocks=(2, 4, 4), memory_efficient=True,
    layer_attns=(False, False, True), layer_cross_attns=(False, False, True),
    attn_dim_head=32, attn_heads=4, max_text_len=64, attn_pool_num_latents=8,
)

imagen = Imagen(
    unets=(unet1, unet2),
    image_sizes=(16, 32),       # scale up to (64, 256) for real training
    timesteps=64,
    cond_drop_prob=0.1,
)

trainer = ImagenTrainer(imagen=imagen, lr=1e-4, use_ema=True,
                        ema_update_after_step=0, ema_update_every=1)


class MockData:
    """(images, text_embeds) pairs — swap for imagen_tpu.data.Dataset / Collator."""

    def __len__(self):
        return 64

    def __getitem__(self, i):
        import numpy as np
        rng = np.random.RandomState(i)
        return (rng.rand(32, 32, 3).astype('float32'),
                rng.randn(8, 768).astype('float32'))


trainer.add_train_dataset(MockData(), batch_size=8)

for step in range(5):
    loss = trainer.train_step(unet_number=1, max_batch_size=4)
    print(f'step {step}: loss {loss:.4f}')
print('timings:', trainer.timings())

images = trainer.sample(
    text_embeds=jnp.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, 8, 768))),
    stop_at_unet_number=1)
print('sampled:', images.shape)
