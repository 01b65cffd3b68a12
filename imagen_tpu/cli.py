"""Click CLI: `imagen sample | config | train`.

Command/option/config-key surface matches the reference cli.py
(/root/reference/imagen_pytorch/cli.py:1-195) so existing configs and invocations
carry over unchanged, with its latent bugs fixed (SURVEY.md §7): the
`channels == 'LA'` comparison no-op (cli.py:126) and the `texts = [sample_texts]`
list-nesting when sampling (cli.py:189).
"""
from __future__ import annotations

import json
import pkgutil
import re
from pathlib import Path

import click

from imagen_tpu.version import __version__

_CHANNEL_MODES = {1: 'L', 2: 'LA', 3: 'RGB', 4: 'RGBA'}


def exists(val):
    return val is not None


def simple_slugify(text: str, max_length=255):
    """Filesystem-safe name for a prompt string."""
    slug = re.sub(r'[,]+', '', text)
    slug = re.sub(r'\|', '--', slug)
    slug = re.sub(r'[-\s]+', '_', slug)
    return slug.strip('-_./\\')[:max_length]


def _require(path_str: str, kind: str) -> Path:
    p = Path(path_str)
    if not p.exists():
        raise click.ClickException(f'{kind} does not exist: {p.resolve()}')
    return p


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
    from imagen_tpu.utils.checkpoint_io import get_fs, load_obj
    from imagen_tpu.utils.load import load_imagen_from_checkpoint, safeget

    model_path = _require(model, 'checkpoint')

    ckpt_version = safeget(load_obj(get_fs(model), model), 'version')
    if ckpt_version != __version__:
        click.echo(f'note: checkpoint was written by imagen_tpu {ckpt_version}; '
                   f'this is {__version__}')
    click.echo(f'restoring cascade from {model_path.resolve()}')

    imagen_model, params = load_imagen_from_checkpoint(
        str(model_path), load_ema_if_available=load_ema)

    pil_images = imagen_model.sample(
        params, jax.random.PRNGKey(0), texts=[text], cond_scale=cond_scale,
        return_pil_images=True)

    out = Path(f'./{simple_slugify(text)}.png')
    pil_images[0].save(out)
    click.echo(f'wrote {out}')


@imagen.command(help='Generate a config for the Imagen model')
@click.option('--path', default='./imagen_config.json', help='config output path')
def config(path):
    data = pkgutil.get_data('imagen_tpu', 'default_config.json').decode('utf-8')
    Path(path).write_text(data)


# --- train ---------------------------------------------------------------------------------

def _load_train_config(config_file):
    cfg = json.loads(_require(config_file, 'config').read_text())
    if 'checkpoint_path' not in cfg:
        raise click.ClickException('config is missing "checkpoint_path"')
    if 'batch_size' not in cfg.get('dataset', {}):
        raise click.ClickException('config is missing dataset.batch_size')
    return cfg


def _build_trainer(cfg):
    from imagen_tpu.configs import ElucidatedImagenConfig, ImagenConfig
    from imagen_tpu.trainer import ImagenTrainer

    klass = ElucidatedImagenConfig if cfg['type'] == 'elucidated' else ImagenConfig
    model = klass(**cfg['imagen']).create()
    # declarative mesh/FSDP/ZeRO layout (configs.ParallelConfig)
    from imagen_tpu.configs import apply_parallel
    trainer_kwargs = apply_parallel(dict(cfg.get('trainer', {})))
    trainer = ImagenTrainer(imagen=model, **trainer_kwargs)

    ckpt = Path(cfg['checkpoint_path'])
    if ckpt.exists():
        click.echo(f'resuming from {ckpt}')
        trainer.load(str(ckpt))
    return model, trainer, ckpt


def _pick_split(ds):
    """Merge/choose HF dataset splits: train+valid if both exist, else whichever
    is present, else the raw dataset object."""
    from datasets import concatenate_datasets

    have = [name for name in ('train', 'valid') if name in ds]
    if len(have) == 2:
        return concatenate_datasets([ds['train'], ds['valid']])
    if have:
        return ds[have[0]]
    return ds


def _register_dataset(cfg, model, trainer, unet):
    from datasets import load_dataset

    from imagen_tpu.data import Collator

    n_channels = cfg['imagen'].get('channels', 3)
    if n_channels not in _CHANNEL_MODES:
        raise click.ClickException(
            f'channels must be 1..4 (L/LA/RGB/RGBA), got {n_channels}')

    train_ds = _pick_split(load_dataset(cfg['dataset_name']))
    trainer.add_train_dataset(
        ds=train_ds,
        collate_fn=Collator(
            image_size=cfg['imagen']['image_sizes'][unet - 1],
            image_label=cfg['image_label'],
            text_label=cfg['text_label'],
            url_label=cfg['url_label'],
            name=model.text_encoder_name,
            channels=_CHANNEL_MODES[n_channels],
        ),
        **cfg['dataset'],
    )


class _Cadence:
    """'do X every N epochs (skipping epoch 0)' helper for the config's
    *_at_every keys."""

    def __init__(self, every, enabled=True):
        self.every = every or 0
        self.enabled = enabled and self.every > 0

    def hits(self, epoch):
        return self.enabled and epoch > 0 and epoch % self.every == 0


@imagen.command(help='Train the Imagen model')
@click.option('--config', 'config_file', default='./imagen_config.json',
              help='Path to the Imagen model config')
@click.option('--unet', default=1, help='Unet to train',
              type=click.IntRange(1, 3, False, True, True))
@click.option('--epoches', default=50, help='Amount of epoches to train for')
def train(config_file, unet, epoches):
    from tqdm import tqdm

    cfg = _load_train_config(config_file)
    model, trainer, ckpt = _build_trainer(cfg)
    _register_dataset(cfg, model, trainer, unet)

    max_batch_size = cfg.get('max_batch_size', 1)
    sample_texts = cfg.get('sample_texts', [])

    validate = _Cadence(cfg.get('validate_at_every'),
                        enabled=trainer.split_valid_from_train)
    sample_every = _Cadence(cfg.get('sample_at_every'),
                            enabled=bool(sample_texts))
    save_every = _Cadence(cfg.get('save_at_every'))
    if 'sample_at_every' in cfg and not sample_texts:
        raise click.ClickException(
            'sample_at_every is set but sample_texts is empty')

    steps_per_epoch = len(trainer.train_dl)
    for epoch in range(epoches):
        bar = tqdm(range(steps_per_epoch), desc=f'epoch {epoch}')
        for _ in bar:
            loss = trainer.train_step(unet_number=unet,
                                      max_batch_size=max_batch_size)
            bar.set_postfix(loss=f'{loss:.4f}')

        if validate.hits(epoch):
            valid_loss = trainer.valid_step(unet_number=unet,
                                            max_batch_size=max_batch_size)
            click.echo(f'epoch {epoch}: valid loss {valid_loss:.4f}')

        if sample_every.hits(epoch):
            images = trainer.sample(texts=sample_texts, batch_size=1,
                                    return_pil_images=True,
                                    stop_at_unet_number=unet)
            images[0].save(f'./sample-{epoch // 100}.png')

        if save_every.hits(epoch):
            trainer.save(str(ckpt))

    trainer.save(str(ckpt))


if __name__ == '__main__':
    # `python -m imagen_tpu.cli ...` == the installed `imagen` console script
    imagen()
