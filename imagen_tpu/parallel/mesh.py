"""Device mesh + sharding helpers (the DP/TP substrate).

Replaces the reference's Accelerate/DDP layer (SURVEY.md §2.3): instead of
process-per-GPU NCCL allreduce (reference trainer.py:281-285,987), we lay out a
`jax.sharding.Mesh` with ('data', 'model') axes and let GSPMD insert ICI collectives.

- DP parity: batch sharded on 'data', params replicated -> XLA compiles the gradient
  psum onto the ICI ring.
- 'model' axis is the hook for tensor sharding of conv channels / attention heads
  (beyond-parity; rules live in `param_sharding_rules`).
- Multi-host: call `jax.distributed.initialize()` before `create_mesh()`; the mesh then
  spans hosts and XLA routes DCN/ICI automatically.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imagen_tpu.utils.helpers import default


def initialize_distributed(**kwargs):
    """Multi-host bring-up: call once per process before `create_mesh()` so the mesh
    spans all hosts (XLA then routes gradient collectives over ICI within a pod and
    DCN across pods). Thin passthrough to `jax.distributed.initialize`."""
    jax.distributed.initialize(**kwargs)


def create_mesh(devices: Optional[Sequence] = None, data: Optional[int] = None,
                model: int = 1) -> Mesh:
    """Create a ('data', 'model') mesh over the given (default: all) devices."""
    devices = default(devices, jax.devices())
    n = len(devices)
    data = default(data, n // model)
    assert data * model == n, f'{n} devices cannot form a {data}x{model} mesh'
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ('data', 'model'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for batch pytrees."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, batch_axis: int = 0):
    """Place a batch pytree with `batch_axis` sharded over 'data'.

    `batch_axis=1` is the gradient-accumulation layout: arrays are
    (n_chunks, microbatch, ...) and the MICROBATCH axis must shard — sharding
    axis 0 would split the sequential scan axis across devices.

    Single-process: plain `device_put` onto the sharding. Multi-process (each
    host loads its own slice of the global batch): assemble the global array
    from process-local data with `jax.make_array_from_process_local_data` —
    `device_put` of a host-local array onto a global mesh would be wrong there
    (every host would claim its local rows are the whole batch). The reference
    delegates this split to Accelerate (trainer.py:467-477).
    """
    multiprocess = jax.process_count() > 1

    def place(x):
        if not (hasattr(x, 'shape') and x.ndim > batch_axis):
            return x
        spec = P(*([None] * batch_axis), 'data')
        sharding = NamedSharding(mesh, spec)
        if multiprocess:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, batch)


def _place_one(x, sharding):
    """device_put onto a sharding; multi-process meshes include non-addressable
    devices, where the array must be assembled from the locally-addressable
    shards instead (every process holds the full host value — valid for
    replicated or host-identical data)."""
    if jax.process_count() > 1:
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])
    return jax.device_put(x, sharding)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: _place_one(x, sharding), tree)


def param_sharding_rules(mesh: Mesh, params, min_weight_size: int = 2 ** 16):
    """Sharding specs for params.

    With model=1 (DP parity with the reference, which only has DDP — SURVEY.md
    §2.3) everything is replicated. With model>1, large kernels shard their
    output-feature (last) axis over 'model' — Megatron-style column parallelism:
    each device holds a slice of every big Dense/Conv kernel and computes its slice
    of the output features; GSPMD inserts the all-gather where the full activation
    is consumed. Small params (norm gains, biases, embeddings under
    `min_weight_size`) stay replicated.
    """
    model_size = mesh.shape['model']
    repl = replicated(mesh)
    if model_size == 1:
        return jax.tree_util.tree_map(lambda _: repl, params)

    def spec_for(leaf):
        shape = getattr(leaf, 'shape', ())
        size = getattr(leaf, 'size', 0)
        if (len(shape) >= 2 and size >= min_weight_size
                and shape[-1] % model_size == 0):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1)), 'model'))
        return repl

    return jax.tree_util.tree_map(spec_for, params)


def shard_params(mesh: Mesh, params, min_weight_size: int = 2 ** 16):
    """Place params according to `param_sharding_rules`."""
    specs = param_sharding_rules(mesh, params, min_weight_size)
    return jax.tree_util.tree_map(
        lambda x, s: _place_one(x, s), params, specs)


def zero_sharding_rules(mesh: Mesh, tree, min_size: int = 2 ** 15):
    """ZeRO-1 layout for optimizer state (beyond parity — the reference keeps
    full per-rank Adam state, trainer.py:335).

    Each large leaf shards its biggest 'data'-divisible axis over the data
    axis, so every device holds 1/data of the optimizer moments instead of a
    full replica. Composes with tensor parallelism: the spec starts from
    `param_sharding_rules` (model-axis columns) and adds 'data' on a FREE axis.
    GSPMD then compiles the classic ZeRO-1 dance — each device updates only
    its moment shard and the updated param shards are all-gathered back to the
    replicated layout the forward expects. Scalars / small leaves (step counts,
    norm gains) stay replicated.
    """
    data = mesh.shape['data']
    base = param_sharding_rules(mesh, tree)
    if data == 1:
        return base

    def extend(leaf, shard):
        shape = getattr(leaf, 'shape', ())
        size = getattr(leaf, 'size', 0)
        if size < min_size or not shape:
            return shard
        spec = list(shard.spec) + [None] * (len(shape) - len(shard.spec))
        cands = [(d, ax) for ax, d in enumerate(shape)
                 if spec[ax] is None and d % data == 0]
        if not cands:
            return shard
        _, ax = max(cands)
        spec[ax] = 'data'
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(extend, tree, base)


def shard_opt_state(mesh: Mesh, tree, min_size: int = 2 ** 15):
    """Place an optimizer-state pytree in the ZeRO-1 layout."""
    specs = zero_sharding_rules(mesh, tree, min_size)
    return jax.tree_util.tree_map(
        lambda x, s: _place_one(x, s), tree, specs)


def fsdp_sharding_rules(mesh: Mesh, params, min_size: int = 2 ** 15):
    """FSDP / ZeRO-3 layout for PARAMS (beyond parity — the reference's only
    multi-device strategy is DDP with fully-replicated params, SURVEY.md §2.3).

    The layout is the same shape-driven rule as `zero_sharding_rules`: each
    large leaf shards its biggest 'data'-divisible free axis over 'data', so
    every device holds 1/data of the model weights. Applied to params (and the
    matching optimizer moments + EMA, which share shapes) this is ZeRO-3 by
    construction under GSPMD: the jitted step consumes sharded weights, XLA
    inserts the per-layer all-gather right before each weight's use site and a
    reduce-scatter for its gradient, and the optimizer updates only the local
    shard. No hand-written collectives — the mesh annotation IS the FSDP
    implementation on TPU (scaling-book recipe). Composes with the 'model'
    axis (TP columns) exactly like ZeRO-1 does.
    """
    return zero_sharding_rules(mesh, params, min_size)


def shard_params_fsdp(mesh: Mesh, params, min_size: int = 2 ** 15):
    """Place a param pytree in the FSDP (ZeRO-3) layout."""
    specs = fsdp_sharding_rules(mesh, params, min_size)
    return jax.tree_util.tree_map(
        lambda x, s: _place_one(x, s), params, specs)


def host_offload(tree):
    """Move a pytree to host memory.

    The TPU analog of the reference's cascade-stage GPU/CPU unet juggling
    (`one_unet_in_gpu`, imagen_pytorch.py:2011-2028): park non-active cascade
    stages' params on host; `device_restore` brings them back for their stage.
    """
    cpu = jax.devices('cpu')[0]
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, cpu), tree)


def device_restore(tree, device=None):
    """Bring a host-parked pytree back onto an accelerator device."""
    device = default(device, jax.devices()[0])
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, device), tree)
