"""Orbax checkpoint backend: SHARDED, async-capable saves for FSDP/ZeRO-scale
training.

The msgpack bundle (`utils/checkpoint_io.py`) mirrors the reference's
single-file torch.save schema (reference trainer.py:695-742) and is the
default — but it gathers EVERY array to host (`to_host` -> process_allgather)
before writing, which materializes the FULL parameter + optimizer state on
every host. For the models FSDP exists for (weights that don't fit
replicated), that defeats the sharding. This backend writes the same logical
bundle through orbax/tensorstore with NO host gather: each process writes
only its addressable shards, and restore places each shard directly onto its
device according to the live trainer's placement specs.

Wired into the trainer as `ImagenTrainer(checkpoint_backend='orbax')`; the
same save/load/folder-rotation API applies, but a checkpoint is a DIRECTORY:
`<dir>/arrays/` (orbax pytree, per-shard files) + `<dir>/meta.json`
(version / self-describing config strings).
"""
from __future__ import annotations

import json
import os

import jax
from flax import serialization

_META_KEYS = ('version', 'imagen_type', 'imagen_params')


def _split(bundle):
    meta = {k: bundle[k] for k in _META_KEYS if k in bundle}
    arrays = {k: v for k, v in bundle.items() if k not in meta}
    # normalize tuples/namedtuples (optax states) into state-dicts for a
    # stable on-disk layout; leaves stay jax.Arrays (possibly sharded) —
    # orbax writes each process's shards without gathering
    return serialization.to_state_dict(arrays), meta


def save_bundle(path, bundle, *, async_save=False):
    """Save a trainer state bundle through orbax. Sharded jax.Array leaves are
    written shard-by-shard (no host gather). Collective: every process must
    call this. Returns the checkpointer when `async_save` (call
    `.wait_until_finished()` before exiting)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(str(path))
    arrays, meta = _split(bundle)

    if jax.process_index() == 0:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, 'meta.json'), 'w') as f:
            json.dump(meta, f)

    if async_save:
        ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        ckptr.save(os.path.join(path, 'arrays'),
                   args=ocp.args.StandardSave(arrays), force=True)
        return ckptr
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, 'arrays'), arrays, force=True)
    return None


def load_bundle(path, *, abstract=None):
    """Restore a bundle saved by `save_bundle`.

    `abstract`: optional state-dict-shaped pytree of jax.ShapeDtypeStruct
    (carrying NamedShardings) matching the saved arrays — restore then places
    each shard directly per the shardings, no full-array host materialization.
    Without it, arrays come back as host numpy (small/debug use)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(str(path))
    with ocp.StandardCheckpointer() as ckptr:
        if abstract is not None:
            # the on-disk layout is the state-dict form (save's _split);
            # normalize the caller's containers the same way
            abstract = serialization.to_state_dict(abstract)
            arrays = ckptr.restore(os.path.join(path, 'arrays'), abstract)
        else:
            arrays = ckptr.restore(os.path.join(path, 'arrays'))

    meta_path = os.path.join(path, 'meta.json')
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return {**arrays, **meta}


def saved_keys(path):
    """Top-level bundle keys present in a saved checkpoint (via orbax
    metadata — no array data is read)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(str(path))
    with ocp.StandardCheckpointer() as ckptr:
        meta = ckptr.metadata(os.path.join(path, 'arrays'))
    tree = getattr(meta, 'item_metadata', meta)
    if hasattr(tree, 'tree'):
        tree = tree.tree
    return set(tree.keys())


def is_orbax_checkpoint(path):
    p = os.path.abspath(str(path))
    return os.path.isdir(p) and os.path.exists(os.path.join(p, 'arrays'))
