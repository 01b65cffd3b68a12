"""Benchmark: sampler / trainer throughput on the flagship configs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

BENCH_MODE selects the config (BASELINE.md):
  base64 (default) — DDPM sampler steps/sec, base Unet dim=128 @64x64, batch 8,
                     CFG 3 (one doubled-batch forward), 64-step compiled scan;
                     also prints MFU from XLA cost-analysis FLOPs
  cascade          — 64->256 two-stage images/sec/chip
  sr1024           — 256->1024 SR tail (NullUnet stage skipped)
  edm              — ElucidatedImagen (churn + Heun) 64->256
  video            — Unet3D 16-frame 64px clips/sec
  train            — fused ImagenTrainer step samples/sec (+ training MFU)

The reference publishes no numbers (BASELINE.md: "published: {}"), so
vs_baseline is the ratio against OUR round-1 recorded numbers (BENCH_r01.json)
— >1.0 means faster than round 1. Modes first measured in round 2 report 1.0.
"""
import json
import os
import time

import jax
import jax.numpy as jnp

TIMESTEPS = int(os.environ.get('BENCH_TIMESTEPS', 64))
COND_SCALE = float(os.environ.get('BENCH_COND_SCALE', 3.0))
# 'base64' | 'cascade' | 'sr1024' | 'edm' | 'video' | 'train'
MODE = os.environ.get('BENCH_MODE', 'base64')
_DEFAULT_BATCH = {'base64': 8, 'cascade': 4, 'edm': 4, 'sr1024': 1, 'video': 1,
                  'train': 32}
BATCH = int(os.environ.get('BENCH_BATCH', 0)) or _DEFAULT_BATCH.get(MODE, 8)
VIDEO_FRAMES = int(os.environ.get('BENCH_VIDEO_FRAMES', 16))

# round-1 measured values on this hardware (BENCH_r01.json / BENCH.md) — the
# regression gate for vs_baseline; keyed by mode, all higher-is-better
ROUND1 = {
    'base64': 91.2625,     # ddpm_sampler_steps_per_sec @ batch 8, 64 steps, CFG 3
    'cascade': 3.21,       # 64->256 images/sec/chip @ batch 4, 64+32 steps, CFG 3
    'sr1024': 1 / 7.21,    # 256->1024 SR tail images/sec @ batch 1, 32 steps, CFG 3
    'edm': 1.50,           # EDM 64->256 images/sec/chip @ batch 4, 64+32 steps, CFG 3
    'video': 1 / 1.38,     # 16-frame 64px clips/sec @ batch 1, 32 steps, CFG 3
    'train': None,         # first measured in round 2 (train_steps_per_sec)
}


def build_imagen():
    from imagen_tpu.diffusion.imagen import Imagen
    from imagen_tpu.models.unet2d import Unet

    base = Unet(
        dim=128,
        dim_mults=(1, 2, 3, 4),
        num_resnet_blocks=2,
        layer_attns=(False, True, True, True),
        layer_cross_attns=(False, True, True, True),
        attn_heads=8,
        attn_dim_head=64,
        text_embed_dim=768,
        max_text_len=256,
        dtype=jnp.bfloat16,
    )
    if MODE in ('base64', 'train'):
        return Imagen(
            unets=(base,), image_sizes=(64,), text_embed_dim=768,
            timesteps=TIMESTEPS, cond_drop_prob=0.1)

    if MODE == 'video':
        from imagen_tpu.models.unet3d import Unet3D
        unet3d = Unet3D(
            dim=64,
            dim_mults=(1, 2, 4),
            num_resnet_blocks=2,
            # round-1 recorded config: causal temporal attention + pseudo-3D
            # convs only (no flattened spatial self-attention)
            layer_attns=False,
            layer_cross_attns=(False, True, True),
            text_embed_dim=768,
            max_text_len=256,
            dtype=jnp.bfloat16,
        )
        return Imagen(
            unets=(unet3d,), image_sizes=(64,),
            text_embed_dim=768, timesteps=TIMESTEPS // 2, cond_drop_prob=0.1)

    # memory-efficient SR unet (BASELINE configs 2-4 upper stages, scaled dims)
    sr = Unet(
        dim=64,
        dim_mults=(1, 2, 4, 8),
        num_resnet_blocks=(2, 4, 4, 4),
        layer_attns=(False, False, False, True),
        layer_cross_attns=(False, False, False, True),
        attn_heads=8,
        attn_dim_head=64,
        text_embed_dim=768,
        max_text_len=256,
        memory_efficient=True,
        dtype=jnp.bfloat16,
    )
    if MODE == 'cascade':
        return Imagen(
            unets=(base, sr), image_sizes=(64, 256), text_embed_dim=768,
            timesteps=(TIMESTEPS, TIMESTEPS // 2), cond_drop_prob=0.1)

    if MODE == 'sr1024':
        # BASELINE config 4: 256->1024 tail alone, stage 1 skipped (NullUnet)
        from imagen_tpu.models.unet2d import NullUnet
        return Imagen(
            unets=(NullUnet(), sr), image_sizes=(256, 1024),
            text_embed_dim=768, timesteps=(TIMESTEPS, TIMESTEPS // 2),
            cond_drop_prob=0.1)

    if MODE == 'edm':
        from imagen_tpu.diffusion.elucidated import ElucidatedImagen
        return ElucidatedImagen(
            unets=(base, sr), image_sizes=(64, 256), text_embed_dim=768,
            num_sample_steps=(TIMESTEPS, TIMESTEPS // 2), cond_drop_prob=0.1)

    raise ValueError(f'unknown BENCH_MODE {MODE!r}')


V5E_BF16_PEAK = 197e12  # TPU v5e (lite) bf16 peak FLOP/s


def _flops_per_step(imagen, params):
    """XLA cost-analysis FLOPs of one sampler step (one CFG-doubled base-unet
    forward), lowered on the XLA-only path — cost analysis cannot see inside
    pallas calls, and the Pallas kernels compute the same math."""
    os.environ['IMAGEN_TPU_DISABLE_PALLAS'] = '1'
    try:
        unet = imagen.unets[0]
        b2 = 2 * BATCH  # CFG doubling
        size = imagen.image_sizes[0]
        x = jnp.zeros((b2, size, size, imagen.channels), jnp.bfloat16)
        t = jnp.zeros((b2,), jnp.float32)
        te = jnp.zeros((b2, 256, 768), jnp.bfloat16)
        tm = jnp.ones((b2, 256), bool)
        fwd = lambda p, x, t, te, tm: unet.apply(
            p, x, t, text_embeds=te, text_mask=tm)
        compiled = jax.jit(fwd).lower(params[0], x, t, te, tm).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca['flops'])
    except Exception:
        return None
    finally:
        os.environ.pop('IMAGEN_TPU_DISABLE_PALLAS', None)


_METRIC = {
    'base64': ('ddpm_sampler_steps_per_sec', 'steps/sec'),
    'cascade': ('cascade_64_256_images_per_sec_per_chip', 'images/sec/chip'),
    'sr1024': ('sr_256_1024_images_per_sec_per_chip', 'images/sec/chip'),
    'edm': ('edm_cascade_64_256_images_per_sec_per_chip', 'images/sec/chip'),
    'video': ('video_16f_64px_clips_per_sec_per_chip', 'clips/sec/chip'),
}

_TOTAL_STEPS = {
    'base64': lambda: TIMESTEPS,
    'cascade': lambda: TIMESTEPS + TIMESTEPS // 2,
    'edm': lambda: TIMESTEPS + TIMESTEPS // 2,
    'sr1024': lambda: TIMESTEPS // 2,   # NullUnet stage is skipped
    'video': lambda: TIMESTEPS // 2,
}


def main_train():
    """Training throughput: fused ImagenTrainer step (fwd+bwd+clip+adam+EMA,
    donated buffers) on the flagship base-64 unet with mock batches."""
    import numpy as np
    from imagen_tpu.trainer import ImagenTrainer

    imagen = build_imagen()
    # sync_loss=False: the device loss comes back as an async array so steps
    # pipeline — blocking on float(loss) every step left the chip 57% idle
    # over the tunnel transport (profiled)
    trainer = ImagenTrainer(imagen=imagen, lr=1e-4, use_ema=True,
                            ema_update_after_step=0, ema_update_every=1,
                            sync_loss=False)
    rng = np.random.RandomState(0)
    batch = {
        'images': jnp.asarray(rng.rand(BATCH, 64, 64, 3), jnp.float32),
        'text_embeds': jnp.asarray(rng.randn(BATCH, 256, 768), jnp.float32),
        'text_masks': jnp.ones((BATCH, 256), bool),
    }

    def run_n(n):
        loss = None
        for _ in range(n):
            loss = trainer.step_with_batch(dict(batch), unet_number=1)
        return float(loss)  # one sync at the end of the window

    run_n(2)  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_n(10)
        times.append((time.perf_counter() - t0) / 10)
    elapsed = min(times)
    steps_per_sec = 1.0 / elapsed

    # training FLOPs from XLA cost analysis of the fused step (XLA-only path)
    mfu = None
    os.environ['IMAGEN_TPU_DISABLE_PALLAS'] = '1'
    try:
        tr2 = ImagenTrainer(imagen=build_imagen(), lr=1e-4, use_ema=True,
                            ema_update_after_step=0, ema_update_every=1)
        tr2._ensure_state(0)
        b2, n_chunks = tr2._prep_batch(dict(batch), None)
        step_fn = tr2._get_step_fn('train', 0, n_chunks)
        lowered = step_fn.lower(
            tr2.params[0], tr2.opt_states[0], tr2.ema_params[0],
            jnp.asarray(tr2.steps[0]), b2, jax.random.PRNGKey(0))
        ca = lowered.compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        mfu = round(float(ca['flops']) * steps_per_sec / V5E_BF16_PEAK, 4)
    except Exception:
        pass
    finally:
        os.environ.pop('IMAGEN_TPU_DISABLE_PALLAS', None)

    print(json.dumps({
        'metric': 'train_steps_per_sec',
        'value': round(steps_per_sec, 4),
        'unit': 'steps/sec',
        'vs_baseline': 1.0,  # first measured in round 2
        'samples_per_sec_per_chip': round(BATCH * steps_per_sec, 3),
        'batch': BATCH,
        'mode': MODE,
        'device': str(jax.devices()[0]),
        **({'mfu': mfu} if mfu is not None else {}),
    }))


def main():
    imagen = build_imagen()

    key = jax.random.PRNGKey(0)
    init_kwargs = dict(batch_size=1, text_len=256)
    if MODE == 'video':
        init_kwargs['video_frames'] = VIDEO_FRAMES
    params = imagen.init_params(key, **init_kwargs)
    text_embeds = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 256, 768))
    text_masks = jnp.ones((BATCH, 256), bool)

    sample_kwargs = dict(text_embeds=text_embeds, text_masks=text_masks,
                         cond_scale=COND_SCALE)
    if MODE == 'video':
        sample_kwargs['video_frames'] = VIDEO_FRAMES
    if MODE == 'sr1024':
        sample_kwargs['start_at_unet_number'] = 2
        sample_kwargs['start_image_or_video'] = jnp.clip(
            jax.random.uniform(jax.random.PRNGKey(4), (BATCH, 256, 256, 3)),
            0., 1.)

    import numpy as np

    def run(k):
        out = imagen.sample(params, k, **sample_kwargs)
        # NB: block_until_ready does not reliably block on the axon tunnel
        # platform; a device->host copy of the result cannot be faked.
        np.asarray(out[0, 0, 0])
        return out

    # warmup / compile
    run(jax.random.PRNGKey(2))

    # timed runs
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(3 + i))
        times.append(time.perf_counter() - t0)

    elapsed = min(times)
    total_steps = _TOTAL_STEPS[MODE]()
    steps_per_sec = total_steps / elapsed
    images_per_sec = BATCH / elapsed
    sec_per_image = elapsed / BATCH

    value = steps_per_sec if MODE == 'base64' else images_per_sec

    mfu = None
    if MODE == 'base64':
        fps = _flops_per_step(imagen, params)
        if fps is not None:
            mfu = round(fps * steps_per_sec / V5E_BF16_PEAK, 4)

    metric, unit = _METRIC[MODE]
    print(json.dumps({
        'metric': metric,
        'value': round(value, 4),
        'unit': unit,
        'vs_baseline': round(value / ROUND1[MODE], 4),
        'images_per_sec_per_chip': round(images_per_sec, 4),
        'sampler_steps_per_sec': round(steps_per_sec, 3),
        'p50_sec_per_image': round(sec_per_image, 4),
        'batch': BATCH,
        'timesteps': TIMESTEPS,
        'cond_scale': COND_SCALE,
        'mode': MODE,
        'device': str(jax.devices()[0]),
        **({'mfu': mfu} if mfu is not None else {}),
    }))


if __name__ == '__main__':
    main_train() if MODE == 'train' else main()
