"""CLI `config` command, default config validity, unet persist/hydrate roundtrip,
data pipeline pieces."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from click.testing import CliRunner

from imagen_tpu.cli import imagen as imagen_cli


def test_cli_config_command(tmp_path):
    runner = CliRunner()
    out_path = str(tmp_path / 'config.json')
    result = runner.invoke(imagen_cli, ['config', '--path', out_path])
    assert result.exit_code == 0, result.output
    with open(out_path) as f:
        data = json.load(f)
    assert data['type'] == 'original'
    assert len(data['imagen']['unets']) == 3


def test_default_config_builds_imagen():
    """The shipped 3-unet LAION recipe must build (structure only, no params)."""
    import pkgutil
    from imagen_tpu.configs import ImagenConfig
    data = json.loads(
        pkgutil.get_data('imagen_tpu', 'default_config.json').decode())
    imagen = ImagenConfig(**data['imagen']).create()
    assert imagen.num_unets == 3
    assert imagen.image_sizes == (64, 256, 1024)
    assert hasattr(imagen, '_config')


def test_unet_persist_hydrate_roundtrip(tmp_path):
    from imagen_tpu.models.unet2d import Unet
    from imagen_tpu.utils.persist import (
        hydrate_unet_from_file, persist_unet_to_file)

    unet = Unet(dim=8, dim_mults=(1, 2), text_embed_dim=16, cond_dim=8,
                attn_dim_head=4, attn_heads=2, attn_pool_num_latents=2,
                max_text_len=8, layer_attns=False,
                layer_cross_attns=(False, True))
    x = jnp.zeros((1, 8, 8, 3))
    t = jnp.zeros((1,))
    te = jnp.zeros((1, 4, 16))
    tm = jnp.ones((1, 4), bool)
    variables = unet.init({'params': jax.random.PRNGKey(0)}, x, t,
                          text_embeds=te, text_mask=tm)

    path = str(tmp_path / 'unet.ckpt')
    persist_unet_to_file(unet, variables, path)

    unet2, variables2 = hydrate_unet_from_file(path)
    assert unet2.dim == 8 and unet2.dim_mults == (1, 2)

    out1 = unet.apply(variables, x, t, text_embeds=te, text_mask=tm)
    out2 = unet2.apply(variables2, x, t, text_embeds=te, text_mask=tm)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_unet3d_persist_records_class(tmp_path):
    from imagen_tpu.models.unet3d import Unet3D
    from imagen_tpu.utils.persist import (
        hydrate_unet_from_file, persist_unet_to_file)

    unet = Unet3D(dim=8, dim_mults=(1, 2), text_embed_dim=16, cond_dim=8,
                  attn_dim_head=4, attn_heads=2, attn_pool_num_latents=2,
                  max_text_len=8, layer_attns=False,
                  layer_cross_attns=(False, True))
    x = jnp.zeros((1, 2, 8, 8, 3))
    t = jnp.zeros((1,))
    te = jnp.zeros((1, 4, 16))
    variables = unet.init({'params': jax.random.PRNGKey(0)}, x, t,
                          text_embeds=te, text_mask=jnp.ones((1, 4), bool))

    path = str(tmp_path / 'unet3d.ckpt')
    persist_unet_to_file(unet, variables, path)
    unet2, _ = hydrate_unet_from_file(path)
    # reference bug (imagen_video.py:1632) not replicated: class is preserved
    assert type(unet2).__name__ == 'Unet3D'


def test_dataset_and_dataloader(tmp_path):
    from PIL import Image
    from imagen_tpu.data import Dataset, DataLoader, get_images_dataloader

    for i in range(4):
        Image.fromarray(
            (np.random.rand(20, 24, 3) * 255).astype(np.uint8)
        ).save(tmp_path / f'img_{i}.png')

    ds = Dataset(str(tmp_path), image_size=16)
    assert len(ds) == 4
    img = ds[0]
    assert img.shape == (16, 16, 3)
    assert img.dtype == np.float32 and img.max() <= 1.0

    dl = DataLoader(ds, batch_size=2)
    batches = list(dl)
    assert len(batches) == 2 and batches[0].shape == (2, 16, 16, 3)

    dl = get_images_dataloader(str(tmp_path), batch_size=2, image_size=16)
    assert len(list(dl)) == 2


def test_ema_decay_schedule():
    from imagen_tpu.ema import EMAConfig, ema_decay, ema_update

    cfg = EMAConfig(beta=0.99, update_after_step=2, update_every=1,
                    inv_gamma=1., power=1.)
    assert float(ema_decay(cfg, jnp.asarray(0))) == 0.
    assert float(ema_decay(cfg, jnp.asarray(3))) == 0.
    d10 = float(ema_decay(cfg, jnp.asarray(10)))
    assert 0. < d10 <= 0.99

    ema = {'w': jnp.zeros(3)}
    new = {'w': jnp.ones(3)}
    # warm-start step: copies online params (decay 0)
    out = ema_update(cfg, ema, new, jnp.asarray(3))
    np.testing.assert_allclose(np.asarray(out['w']), 1.)


def test_cli_trainer_block_builds_parallel_trainer():
    """A config file's trainer.parallel block reaches the CLI-built trainer as
    a real mesh + FSDP layout, and one sharded step runs (the declarative face
    of parallel/mesh.py — configs.ParallelConfig)."""
    from imagen_tpu.cli import _build_trainer

    cfg = {
        'type': 'original',
        'checkpoint_path': '/nonexistent/never-loaded.msgpack',
        'imagen': {
            'unets': [{'dim': 8, 'dim_mults': [1, 2], 'text_embed_dim': 16,
                       'cond_dim': 8, 'attn_dim_head': 4, 'attn_heads': 2,
                       'attn_pool_num_latents': 2, 'max_text_len': 8,
                       'layer_attns': False,
                       'layer_cross_attns': [False, True]}],
            'image_sizes': [16], 'text_embed_dim': 16, 'timesteps': 4},
        'trainer': {'parallel': {'data': 8, 'fsdp': 64},
                    'use_ema': False, 'verbose': False},
    }
    model, trainer, ckpt = _build_trainer(cfg)
    assert dict(trainer.mesh.shape) == {'data': 8, 'model': 1}
    assert trainer._fsdp_enabled()

    batch = dict(images=np.zeros((8, 16, 16, 3), np.float32),
                 text_embeds=np.zeros((8, 8, 16), np.float32),
                 text_masks=np.ones((8, 8), bool))
    loss = trainer.step_with_batch(batch, unet_number=1)
    assert np.isfinite(float(loss))
