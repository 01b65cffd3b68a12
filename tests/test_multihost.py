"""Multi-host correctness smoke test: 2 spawned processes form one jax.distributed
cluster (CPU, 2 virtual devices each), shard a global batch from process-local
rows, run a global-SPMD computation, and gather sharded arrays for checkpointing.

Covers the multi-process paths in parallel/mesh.py (shard_batch via
jax.make_array_from_process_local_data) and utils/checkpoint_io.py (to_host via
process_allgather). Reference capability analog: Accelerate prepare
(trainer.py:456-477).
"""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = '''
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(coordinator_address='localhost:{port}',
                           num_processes=2, process_id={pid})
import numpy as np
import jax.numpy as jnp
from imagen_tpu.parallel.mesh import create_mesh, shard_batch
from imagen_tpu.utils.checkpoint_io import to_host

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

mesh = create_mesh(data=4)

full = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
local = full[{pid} * 4:({pid} + 1) * 4]        # this host's slice of the batch
batch = shard_batch(mesh, dict(x=local))
assert batch['x'].shape == (8, 3), batch['x'].shape          # GLOBAL shape

mean = jax.jit(jnp.mean)(batch['x'])
assert abs(float(mean) - full.mean()) < 1e-6, float(mean)

host = to_host(dict(x=batch['x']))             # gather across processes
np.testing.assert_allclose(host['x'], full)

print('MULTIHOST_OK', flush=True)
'''


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def test_two_process_distributed_smoke():
    port = _free_port()
    env = dict(os.environ)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('JAX_COMPILATION_CACHE_DIR', None)

    procs = [
        subprocess.Popen(
            [sys.executable, '-c', WORKER.format(repo=REPO, port=port, pid=pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=300) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and 'MULTIHOST_OK' in out, (
            f'process {pid} failed (rc={p.returncode})\n'
            f'--- stdout ---\n{out}\n--- stderr ---\n{err}')
