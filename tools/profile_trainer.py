"""Capture a jax.profiler trace of the fused TRAIN step on the real TPU and
print the top self-time ops (same xprof framework_op_stats parser as
profile_sampler).

Usage: [BENCH_MODE=train|train_paper|train_sr256] python tools/profile_trainer.py [trace_dir]

The receipt generator behind BENCH.md's training "where the time goes" table
(round-2 verdict: the sampler had a per-op profile, the training step — the
reference's actual hot path, trainer.py:964-989 — had only one number).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.profile_sampler import top_ops


def capture(trace_dir):
    import numpy as np

    import bench
    from imagen_tpu.trainer import ImagenTrainer

    paper = bench.MODE == 'train_paper'
    sr = bench.MODE == 'train_sr256'
    unet_number = 2 if sr else 1
    image_size = 256 if sr else 64
    trainer_kwargs = dict(lr=1e-4, sync_loss=False)
    if paper:
        trainer_kwargs.update(optimizer='adafactor', beta1=None, use_ema=False)
    elif sr:
        trainer_kwargs.update(use_ema=False,
                              only_train_unet_number=unet_number)
    else:
        trainer_kwargs.update(use_ema=True, ema_update_after_step=0,
                              ema_update_every=1)
    trainer = ImagenTrainer(imagen=bench.build_imagen(), **trainer_kwargs)

    rng = np.random.RandomState(0)
    batch = {
        'images': jnp.asarray(
            rng.rand(bench.BATCH, image_size, image_size, 3), jnp.float32),
        'text_embeds': jnp.asarray(
            rng.randn(bench.BATCH, 256, 768), jnp.float32),
        'text_masks': jnp.ones((bench.BATCH, 256), bool),
    }

    def run_n(n):
        loss = None
        for _ in range(n):
            loss = trainer.step_with_batch(dict(batch),
                                           unet_number=unet_number)
        return float(loss)

    run_n(2)   # compile + warm
    with jax.profiler.trace(trace_dir):
        run_n(3)


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/imagen_train_trace'
    if not os.environ.get('PROFILE_PARSE_ONLY'):
        capture(trace_dir)
    import json
    _, ops = top_ops(trace_dir, n=25)
    for o in ops:
        print(json.dumps(o))


if __name__ == '__main__':
    main()
