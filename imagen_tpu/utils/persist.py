"""Single-unet persistence: save/load one unet's full config + params to a file.

Capability parity with the reference's `persist_to_file` / `hydrate_from_file`
(/root/reference/imagen_pytorch/imagen_pytorch.py:1474-1506). Since flax modules ARE
their config (frozen dataclasses), `to_config_and_state_dict` is just field
extraction. The saved file records the unet class, fixing the reference bug where
`Unet3D.hydrate_from_file` rehydrates through `Unet` (imagen_video.py:1632 —
SURVEY.md §7 bug list).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp

from imagen_tpu.utils.checkpoint_io import (
    get_fs, load_obj, restore_index_dicts, save_obj)

_DTYPE_NAMES = {
    'float32': jnp.float32,
    'bfloat16': jnp.bfloat16,
    'float16': jnp.float16,
}


def unet_to_config(unet):
    """Extract the unet's constructor config as a JSON-able dict."""
    config = {}
    for f in dataclasses.fields(unet):
        if f.name in ('parent', 'name'):
            continue
        val = getattr(unet, f.name)
        if f.name == 'dtype':
            val = jnp.dtype(val).name
        config[f.name] = val
    return config


def unet_from_config(klass, config):
    config = dict(restore_index_dicts(config))
    if 'dtype' in config and isinstance(config['dtype'], str):
        config['dtype'] = _DTYPE_NAMES[config['dtype']]
    # JSON round-trips tuples as lists; flax attrs must be hashable
    config = {k: tuple(v) if isinstance(v, list) else v for k, v in config.items()}
    return klass(**config)


def persist_unet_to_file(unet, variables, path, fs=None):
    """Save one unet (config + params); reference imagen_pytorch.py:1487-1492."""
    fs = get_fs(path, fs)
    try:
        Path(str(path)).parent.mkdir(exist_ok=True, parents=True)
    except Exception:
        pass
    pkg = dict(
        unet_class=type(unet).__name__,
        config=unet_to_config(unet),
        state_dict=variables,
    )
    save_obj(fs, path, pkg)


def hydrate_unet_from_file(path, fs=None):
    """Rebuild (unet, variables) from a persisted file;
    reference imagen_pytorch.py:1496-1506."""
    fs = get_fs(path, fs)
    pkg = load_obj(fs, path)
    assert 'config' in pkg and 'state_dict' in pkg

    klass_name = pkg.get('unet_class', 'Unet')
    if klass_name == 'Unet3D':
        from imagen_tpu.models.unet3d import Unet3D
        klass = Unet3D
    elif klass_name == 'NullUnet':
        from imagen_tpu.models.unet2d import NullUnet
        klass = NullUnet
    else:
        from imagen_tpu.models.unet2d import Unet
        klass = Unet

    unet = unet_from_config(klass, pkg['config'])
    variables = jax.tree_util.tree_map(jnp.asarray, pkg['state_dict'])
    return unet, variables
