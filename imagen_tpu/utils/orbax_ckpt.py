"""Orbax checkpoint backend: sharded, async-capable saves for large-scale training.

The msgpack bundle (`utils/checkpoint_io.py`) mirrors the reference's single-file
torch.save schema and is the default. For production-scale params, this backend
writes the same logical bundle through orbax (per-array files, sharding-aware
restore, async save that overlaps the next train steps — the "async host
checkpointing" item of SURVEY.md §7 step 10).

Layout: `<dir>/arrays/` (orbax pytree) + `<dir>/meta.json` (version/config strings).
"""
from __future__ import annotations

import json
import os

from flax import serialization

from imagen_tpu.utils.checkpoint_io import to_host

_META_KEYS = ('version', 'imagen_type', 'imagen_params')


def _split(bundle):
    meta = {k: bundle[k] for k in _META_KEYS if k in bundle}
    arrays = {k: v for k, v in bundle.items() if k not in meta}
    # normalize tuples/namedtuples (optax states) into state-dicts for stable layout
    return serialization.to_state_dict(to_host(arrays)), meta


def save_bundle(path, bundle, *, async_save=False):
    """Save a trainer state bundle through orbax. Returns the checkpointer when
    `async_save` (call `.wait_until_finished()` before exiting)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(str(path))
    os.makedirs(path, exist_ok=True)
    arrays, meta = _split(bundle)

    with open(os.path.join(path, 'meta.json'), 'w') as f:
        json.dump(meta, f)

    if async_save:
        ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    else:
        ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, 'arrays'), arrays, force=True)
    return ckptr if async_save else None


def load_bundle(path):
    """Restore a bundle saved by `save_bundle` (arrays as nested dicts)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(str(path))
    ckptr = ocp.PyTreeCheckpointer()
    arrays = ckptr.restore(os.path.join(path, 'arrays'))

    meta_path = os.path.join(path, 'meta.json')
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return {**arrays, **meta}
