"""Click CLI: `imagen sample | config | train`.

Capability parity with the reference cli.py (/root/reference/imagen_pytorch/cli.py:1-195)
with its latent bugs fixed (SURVEY.md §7): the `channels == 'LA'` comparison no-op
(cli.py:126) and the `texts = [sample_texts]` list-nesting when sampling (cli.py:189).
"""
from __future__ import annotations

import json
import pkgutil
from pathlib import Path

import click

from imagen_tpu.version import __version__


def exists(val):
    return val is not None


def simple_slugify(text: str, max_length=255):
    return (text.replace('-', '_').replace(',', '').replace(' ', '_')
            .replace('|', '--').strip('-_./\\')[:max_length])


def main():
    pass


@click.group()
def imagen():
    pass


@imagen.command(help='Sample from an Imagen model checkpoint')
@click.option('--model', default='./imagen.ckpt', help='path to trained Imagen model')
@click.option('--cond_scale', default=5., help='classifier-free guidance scale')
@click.option('--load_ema', default=True, help='load EMA version of unets if available')
@click.argument('text')
def sample(model, cond_scale, load_ema, text):
    import jax
    from imagen_tpu.utils.load import load_imagen_from_checkpoint, safeget
    from imagen_tpu.utils.checkpoint_io import get_fs, load_obj

    model_path = Path(model)
    full_model_path = str(model_path.resolve())
    assert model_path.exists(), f'model not found at {full_model_path}'

    loaded = load_obj(get_fs(model), model)
    version = safeget(loaded, 'version')
    print(f'loading Imagen from {full_model_path}, saved at version {version} - '
          f'current package version is {__version__}')

    imagen_model, params = load_imagen_from_checkpoint(
        str(model_path), load_ema_if_available=load_ema)

    pil_images = imagen_model.sample(
        params, jax.random.PRNGKey(0), texts=[text], cond_scale=cond_scale,
        return_pil_images=True)

    image_path = f'./{simple_slugify(text)}.png'
    pil_images[0].save(image_path)

    print(f'image saved to {str(image_path)}')


@imagen.command(help='Generate a config for the Imagen model')
@click.option('--path', default='./imagen_config.json', help='config output path')
def config(path):
    data = pkgutil.get_data('imagen_tpu', 'default_config.json').decode('utf-8')
    with open(path, 'w') as f:
        f.write(data)


@imagen.command(help='Train the Imagen model')
@click.option('--config', 'config_file', default='./imagen_config.json',
              help='Path to the Imagen model config')
@click.option('--unet', default=1, help='Unet to train',
              type=click.IntRange(1, 3, False, True, True))
@click.option('--epoches', default=50, help='Amount of epoches to train for')
def train(config_file, unet, epoches):
    from tqdm import tqdm

    from imagen_tpu.configs import ElucidatedImagenConfig, ImagenConfig
    from imagen_tpu.data import Collator
    from imagen_tpu.trainer import ImagenTrainer

    config_path = Path(config_file)
    full_config_path = str(config_path.resolve())
    assert config_path.exists(), f'config not found at {full_config_path}'

    with open(config_path, 'r') as f:
        config_data = json.loads(f.read())

    assert 'checkpoint_path' in config_data, 'checkpoint path not found in config'
    model_path = Path(config_data['checkpoint_path'])

    imagen_config_klass = (
        ElucidatedImagenConfig if config_data['type'] == 'elucidated'
        else ImagenConfig)
    imagen_model = imagen_config_klass(**config_data['imagen']).create()

    trainer = ImagenTrainer(imagen=imagen_model, **config_data.get('trainer', {}))

    if model_path.exists():
        print(f'loading checkpoint from {model_path}')
        trainer.load(str(model_path))

    size = config_data['imagen']['image_sizes'][unet - 1]
    max_batch_size = config_data.get('max_batch_size', 1)

    n_channels = config_data['imagen'].get('channels', 3)
    assert 0 < n_channels < 5, \
        'Imagen only supports 1 to 4 channels (L, LA, RGB, RGBA)'
    channels = {1: 'L', 2: 'LA', 3: 'RGB', 4: 'RGBA'}[n_channels]

    assert 'batch_size' in config_data['dataset'], \
        'A batch_size is required in the config file'

    from datasets import concatenate_datasets, load_dataset
    ds = load_dataset(config_data['dataset_name'])

    if 'train' in ds and 'valid' in ds:
        train_ds = concatenate_datasets([ds['train'], ds['valid']])
    elif 'train' in ds:
        train_ds = ds['train']
    elif 'valid' in ds:
        train_ds = ds['valid']
    else:
        train_ds = ds
    assert train_ds is not None, 'no train dataset found'

    trainer.add_train_dataset(
        ds=train_ds,
        collate_fn=Collator(
            image_size=size,
            image_label=config_data['image_label'],
            text_label=config_data['text_label'],
            url_label=config_data['url_label'],
            name=imagen_model.text_encoder_name,
            channels=channels,
        ),
        **config_data['dataset'],
    )

    should_validate = (trainer.split_valid_from_train
                       and 'validate_at_every' in config_data)
    should_sample = ('sample_texts' in config_data
                     and 'sample_at_every' in config_data)
    should_save = 'save_at_every' in config_data

    valid_at_every = config_data.get('validate_at_every', 0)
    sample_at_every = config_data.get('sample_at_every', 0)
    save_at_every = config_data.get('save_at_every', 0)
    sample_texts = config_data.get('sample_texts', [])

    assert not should_sample or len(sample_texts) > 0, \
        'sample_texts must not be empty when sample_at_every is set'

    for i in range(epoches):
        for _ in tqdm(range(len(trainer.train_dl))):
            loss = trainer.train_step(unet_number=unet,
                                      max_batch_size=max_batch_size)
            print(f'loss: {loss}')

        if should_validate and valid_at_every and not (i % valid_at_every) and i > 0:
            valid_loss = trainer.valid_step(unet_number=unet,
                                            max_batch_size=max_batch_size)
            print(f'valid loss: {valid_loss}')

        if should_sample and sample_at_every and not (i % sample_at_every) and i > 0:
            images = trainer.sample(texts=sample_texts, batch_size=1,
                                    return_pil_images=True, stop_at_unet_number=unet)
            images[0].save(f'./sample-{i // 100}.png')

        if should_save and save_at_every and not (i % save_at_every) and i > 0:
            trainer.save(str(model_path))

    trainer.save(str(model_path))
