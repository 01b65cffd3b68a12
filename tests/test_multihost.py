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


TRAINER_WORKER = '''
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(coordinator_address='localhost:{port}',
                           num_processes=2, process_id={pid})
import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from imagen_tpu.diffusion.imagen import Imagen
from imagen_tpu.models.unet2d import Unet
from imagen_tpu.trainer import ImagenTrainer
from imagen_tpu.parallel.mesh import create_mesh

PID = {pid}
mesh = create_mesh(data=4)
unet = Unet(dim=8, dim_mults=(1, 2), text_embed_dim=16, cond_dim=8,
            attn_dim_head=4, attn_heads=2, attn_pool_num_latents=2,
            max_text_len=8, layer_attns=False, layer_cross_attns=(False, True))
imagen = Imagen(unets=(unet,), image_sizes=(16,), text_embed_dim=16,
                timesteps=4, cond_drop_prob=0.1)
trainer = ImagenTrainer(imagen=imagen, mesh=mesh, use_ema=True,
                        ema_update_after_step=0, ema_update_every=1,
                        sync_loss=False, verbose=False, seed=3)

def local_batch(seed):
    rng = np.random.RandomState(seed)        # same global batch on both procs
    imgs = rng.rand(8, 16, 16, 3).astype(np.float32)
    emb = rng.randn(8, 6, 16).astype(np.float32)
    lo = PID * 4                             # this proc holds ITS 4 global rows
    return dict(images=imgs[lo:lo + 4], text_embeds=emb[lo:lo + 4],
                text_masks=np.ones((4, 6), bool))

trainer.step_with_batch(local_batch(0), unet_number=1)
assert trainer.num_steps_taken(1) == 1

# collective-safe save: EVERY process enters the state gather, process 0 writes
ckpt = os.path.join({tmp!r}, 'trainer.ckpt')
trainer.save(ckpt)
multihost_utils.sync_global_devices('imagen_tpu_saved')
assert os.path.exists(ckpt), 'process 0 should have written the checkpoint'

trainer.load(ckpt)
assert trainer.num_steps_taken(1) == 1

trainer.step_with_batch(local_batch(1), unet_number=1)
assert trainer.num_steps_taken(1) == 2

print('TRAINER_MULTIHOST_OK', flush=True)
'''


def test_two_process_trainer_e2e(tmp_path):
    """2-process ImagenTrainer: sharded train step, collective-safe save()
    (regression: save() must not early-return on non-zero processes BEFORE the
    state gather — that deadlocked process 0 at the collective), symmetric
    load(), and a post-restore step."""
    port = _free_port()
    env = dict(os.environ)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('JAX_COMPILATION_CACHE_DIR', None)

    procs = [
        subprocess.Popen(
            [sys.executable, '-c', TRAINER_WORKER.format(
                repo=REPO, port=port, pid=pid, tmp=str(tmp_path))],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and 'TRAINER_MULTIHOST_OK' in out, (
            f'process {pid} failed (rc={p.returncode})\n'
            f'--- stdout ---\n{out}\n--- stderr ---\n{err}')
