"""Tensor-parallel (model-axis) sharding: loss parity with replicated training."""
import jax
import jax.numpy as jnp
import numpy as np

from imagen_tpu.diffusion.imagen import Imagen
from imagen_tpu.models.unet2d import Unet
from imagen_tpu.parallel.mesh import (
    create_mesh, param_sharding_rules, replicate, shard_batch, shard_params)


def _tiny_imagen():
    unet = Unet(dim=8, dim_mults=(1, 2), text_embed_dim=16, cond_dim=8,
                attn_dim_head=4, attn_heads=2, attn_pool_num_latents=2,
                max_text_len=8, layer_attns=False,
                layer_cross_attns=(False, True))
    return Imagen(unets=(unet,), image_sizes=(16,), text_embed_dim=16,
                  timesteps=4, cond_drop_prob=0.)


def test_tp_sharding_rules():
    mesh = create_mesh(data=4, model=2)
    params = {'big': jnp.zeros((512, 256)), 'small': jnp.zeros((8,)),
              'odd': jnp.zeros((128, 509))}
    specs = param_sharding_rules(mesh, params, min_weight_size=1024)
    assert specs['big'].spec == jax.sharding.PartitionSpec(None, 'model')
    assert specs['small'].spec == jax.sharding.PartitionSpec()
    assert specs['odd'].spec == jax.sharding.PartitionSpec()  # not divisible


def test_tp_loss_matches_replicated():
    imagen = _tiny_imagen()
    key = jax.random.PRNGKey(0)
    params = imagen.init_unet_params(1, key, text_len=6)
    images = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3))
    embeds = jax.random.normal(jax.random.PRNGKey(2), (8, 6, 16))
    masks = jnp.ones((8, 6), bool)

    def loss_fn(p, im, em, mk, k):
        return imagen.forward(p, im, k, text_embeds=em, text_masks=mk)

    lkey = jax.random.PRNGKey(3)
    loss_ref = jax.jit(loss_fn)(params, images, embeds, masks, lkey)

    mesh = create_mesh(data=4, model=2)
    p_tp = shard_params(mesh, params, min_weight_size=64)
    batch = shard_batch(mesh, dict(im=images, em=embeds, mk=masks))
    loss_tp = jax.jit(loss_fn)(p_tp, batch['im'], batch['em'], batch['mk'], lkey)

    np.testing.assert_allclose(float(loss_ref), float(loss_tp), rtol=1e-4)


def test_tp_sample_matches_replicated():
    """Serving-side TP: Megatron-sharded params through the full scan-compiled
    sampler must reproduce the single-placement sample bit-for-bit (same key;
    GSPMD inserts the column/row collectives, the math is unchanged)."""
    imagen = _tiny_imagen()
    key = jax.random.PRNGKey(0)
    params = imagen.init_unet_params(1, key, text_len=6)
    embeds = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 16))
    masks = jnp.ones((4, 6), bool)
    skey = jax.random.PRNGKey(7)

    ref = imagen.sample((params,), skey, text_embeds=embeds, text_masks=masks,
                        batch_size=4, cond_scale=1.0)

    mesh = create_mesh(data=2, model=4)
    p_tp = shard_params(mesh, params, min_weight_size=64)
    emb_s = shard_batch(mesh, dict(em=embeds, mk=masks))
    out = imagen.sample((p_tp,), skey, text_embeds=emb_s['em'],
                        text_masks=emb_s['mk'], batch_size=4, cond_scale=1.0)

    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-5, rtol=1e-5)


def test_tp_trainer_step():
    from imagen_tpu.trainer import ImagenTrainer
    mesh = create_mesh(data=4, model=2)
    trainer = ImagenTrainer(imagen=_tiny_imagen(), mesh=mesh, verbose=False)
    batch = dict(
        images=jnp.zeros((8, 16, 16, 3)),
        text_embeds=jnp.zeros((8, 6, 16)),
        text_masks=jnp.ones((8, 6), bool),
    )
    loss = trainer.step_with_batch(batch, unet_number=1)
    assert np.isfinite(loss)
