"""Checkpoint byte-IO over fsspec (local / gs / s3), msgpack-serialized pytrees.

Mirrors the reference's fsspec checkpoint plumbing (trainer.py:30,259-265,388) without
its `url_to_bucket` NameError bug on `://` URLs (trainer.py:88-97 — SURVEY.md §7
"bugs we will NOT replicate").
"""
from __future__ import annotations

import numpy as np
import jax
from flax import serialization

from imagen_tpu.utils.helpers import default


def get_fs(path_or_url, fs=None, fs_kwargs=None):
    if fs is not None:
        return fs
    from fsspec.core import url_to_fs
    fs, _ = url_to_fs(str(path_or_url), **default(fs_kwargs, {}))
    return fs


def to_host(tree):
    """Device arrays -> numpy (gathered if sharded); python scalars/strings pass.

    Multi-process: arrays sharded across processes are not fully addressable
    locally, so np.asarray would fail — gather them first (process_allgather is a
    no-op layout-wise for replicated arrays). Single-process (incl. the usual
    replicated-DP case) stays a plain copy."""
    multiprocess = jax.process_count() > 1

    def conv(x):
        if isinstance(x, (str, bytes, bool, int, float)) or x is None:
            return x
        if multiprocess and isinstance(x, jax.Array) and not x.is_fully_addressable:
            if x.is_fully_replicated:
                # every process already holds the full value (params / opt
                # state replicated over a multi-host mesh) — a plain copy;
                # process_allgather would tile duplicate rows here
                return np.asarray(x)
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return np.asarray(x)
    return jax.tree_util.tree_map(conv, tree)


def save_obj(fs, path, obj):
    # to_state_dict converts tuples/namedtuples (optax states) into msgpack-able dicts
    data = serialization.msgpack_serialize(
        serialization.to_state_dict(to_host(obj)))
    with fs.open(str(path), 'wb') as f:
        f.write(data)


def load_obj(fs, path, target=None):
    """Load a bundle. Pass `target` to restore original container types
    (tuples/namedtuples) via from_state_dict; otherwise returns nested dicts."""
    with fs.open(str(path), 'rb') as f:
        data = f.read()
    restored = serialization.msgpack_restore(data)
    if target is not None:
        restored = serialization.from_state_dict(target, restored)
    return restored


def restore_index_dicts(obj):
    """Invert to_state_dict's list->{'0': ...} conversion, recursively (for plain
    JSON-ish config payloads riding in the checkpoint bundle)."""
    if isinstance(obj, dict):
        if obj and all(isinstance(k, str) and k.isdigit() for k in obj):
            return [restore_index_dicts(obj[str(i)]) for i in range(len(obj))]
        return {k: restore_index_dicts(v) for k, v in obj.items()}
    return obj


def restore_parts(target_tree, loaded_tree):
    """Partial restore: keep loaded leaves whose path+shape match the target.

    Functional analog of the reference's `restore_parts` (trainer.py:209-220), used
    for resuming after a config change.
    """
    flat_target, treedef = jax.tree_util.tree_flatten_with_path(target_tree)
    flat_loaded = dict(jax.tree_util.tree_flatten_with_path(loaded_tree)[0])

    out = []
    for path, leaf in flat_target:
        cand = flat_loaded.get(path)
        if cand is not None and getattr(cand, 'shape', None) == getattr(leaf, 'shape', None):
            out.append(cand)
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
