"""Multi-device (8 virtual CPU devices) sharded-training tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_mesh_creation():
    from imagen_tpu.parallel.mesh import create_mesh
    n = len(jax.devices())
    assert n == 8, f'conftest should force 8 virtual devices, got {n}'
    mesh = create_mesh()
    assert mesh.shape['data'] == 8 and mesh.shape['model'] == 1
    mesh2 = create_mesh(data=4, model=2)
    assert mesh2.shape['data'] == 4 and mesh2.shape['model'] == 2


def test_dryrun_multichip():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_sharded_step_matches_single_device():
    """Same data + same rng on mesh vs single device gives the same loss."""
    from imagen_tpu.diffusion.imagen import Imagen
    from imagen_tpu.models.unet2d import Unet
    from imagen_tpu.parallel.mesh import create_mesh, shard_batch, replicate

    unet = Unet(dim=8, dim_mults=(1, 2), text_embed_dim=16, cond_dim=8,
                attn_dim_head=4, attn_heads=2, attn_pool_num_latents=2,
                max_text_len=8, layer_attns=False,
                layer_cross_attns=(False, True))
    imagen = Imagen(unets=(unet,), image_sizes=(16,), text_embed_dim=16,
                    timesteps=4, cond_drop_prob=0.)

    key = jax.random.PRNGKey(0)
    params = imagen.init_unet_params(1, key, text_len=6)
    images = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3))
    embeds = jax.random.normal(jax.random.PRNGKey(2), (8, 6, 16))
    masks = jnp.ones((8, 6), bool)

    def loss_fn(params, images, embeds, masks, key):
        return imagen.forward(params, images, key,
                              text_embeds=embeds, text_masks=masks)

    lkey = jax.random.PRNGKey(3)
    loss_single = jax.jit(loss_fn)(params, images, embeds, masks, lkey)

    mesh = create_mesh()
    params_r = replicate(mesh, params)
    batch = shard_batch(mesh, dict(images=images, embeds=embeds, masks=masks))
    loss_sharded = jax.jit(loss_fn)(
        params_r, batch['images'], batch['embeds'], batch['masks'], lkey)

    np.testing.assert_allclose(
        float(loss_single), float(loss_sharded), rtol=1e-4)
