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


def shard_batch(mesh: Mesh, batch):
    """Place a batch pytree with its leading axis sharded over 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, 'shape') and x.ndim > 0
        else x, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def param_sharding_rules(mesh: Mesh, params):
    """Sharding specs for params.

    Current policy: fully replicated (DP parity with the reference, which only has
    DDP — SURVEY.md §2.3). The 'model' axis is reserved: a future TP policy shards
    Dense kernels' output features and attention heads over it.
    """
    return jax.tree_util.tree_map(lambda _: replicated(mesh), params)
