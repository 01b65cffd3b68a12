"""Checkpoint rehydration: rebuild an Imagen/ElucidatedImagen (+ params) from a
self-describing checkpoint alone.

Capability parity with the reference utils.py:15-61 (`load_imagen_from_checkpoint`).
Returns (imagen, params) — params are the EMA weights when `use_ema=True` and EMA
state is present, mirroring the reference's EMA copy-in (utils.py:42-60).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from imagen_tpu.utils.checkpoint_io import get_fs, load_obj, restore_index_dicts
from imagen_tpu.utils.helpers import exists


def safeget(dictionary, keys, default=None):
    """Dotted-path dict get; reference utils.py:12."""
    from functools import reduce
    return reduce(
        lambda d, key: d.get(key, default) if isinstance(d, dict) else default,
        keys.split('.'), dictionary)


def load_imagen_from_checkpoint(
    checkpoint_path,
    load_weights=True,
    load_ema_if_available=False,
    fs=None,
):
    fs = get_fs(checkpoint_path, fs)
    loaded = load_obj(fs, checkpoint_path)

    imagen_params = restore_index_dicts(safeget(loaded, 'imagen_params'))
    imagen_type = safeget(loaded, 'imagen_type')

    if imagen_type == 'original':
        from imagen_tpu.configs import ImagenConfig
        imagen_klass = ImagenConfig
    elif imagen_type == 'elucidated':
        from imagen_tpu.configs import ElucidatedImagenConfig
        imagen_klass = ElucidatedImagenConfig
    else:
        raise ValueError(f'unknown imagen type {imagen_type} - '
                         f'checkpoint is not self-describing')

    assert exists(imagen_params) and exists(imagen_type), \
        'imagen type and configuration must be saved in the checkpoint'

    imagen = imagen_klass(**imagen_params).create()

    if not load_weights:
        return imagen

    def as_list(maybe_dict):
        if isinstance(maybe_dict, dict) and all(k.isdigit() for k in maybe_dict):
            return [maybe_dict[str(i)] for i in range(len(maybe_dict))]
        return list(maybe_dict)

    source = loaded['model']
    if load_ema_if_available and 'ema' in loaded:
        source = loaded['ema']

    params = [jax.tree_util.tree_map(jnp.asarray, p) for p in as_list(source)]
    return imagen, tuple(params)
