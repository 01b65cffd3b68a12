"""Benchmark: sampler / trainer throughput on the flagship configs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

BENCH_MODE selects the config (BASELINE.md):
  base64_paper (default) — the TRUE paper-preset BaseUnet64 (dim 512, reference
                     imagen_pytorch.py:1743-1755) @64x64: DDPM sampler
                     steps/sec, batch 8, CFG 3 (one doubled-batch forward),
                     64-step compiled scan, MFU from XLA cost-analysis FLOPs
  base64           — the round-1/2 scaled flagship (dim 128) for continuity
  cascade_paper    — BaseUnet64 + SRUnet256 64->256 at true preset dims
  cascade          — scaled 64->256 two-stage images/sec/chip
  sr1024_paper     — SRUnet1024 256->1024 tail at true preset dims
  sr1024           — scaled 256->1024 SR tail (NullUnet stage skipped)
  edm_paper        — ElucidatedImagen 64->256 at true preset dims
  edm              — ElucidatedImagen (churn + Heun) 64->256
  video            — Unet3D 16-frame 64px clips/sec
  train_paper      — fused trainer step on BaseUnet64 (+ training MFU)
  train            — fused ImagenTrainer step samples/sec (+ training MFU)
  train_sr256      — fused trainer step on the paper-preset SRUnet256 (unet 2
                     of BASELINE config 2: memory_efficient topology, lowres
                     conditioning path, reference imagen_pytorch.py:1757-1769);
                     BENCH_CROP=<px> additionally exercises the paired
                     random-crop p_losses path (reference :2532-2546)

The reference publishes no numbers (BASELINE.md: "published: {}"), so
vs_baseline is the ratio against OUR prior-round recorded numbers — >1.0 means
faster than before. For the *_paper modes (first measured in round 3) the raw
throughput is not comparable to the scaled models, so vs_baseline is the
FLOPs-normalized ratio: measured MFU / the same path's round-2 MFU (sampler
0.5433, train 0.387) — >1.0 means the paper-scale model extracts MORE of the
chip than round 2's scaled model did. Modes with no prior MFU report 1.0.
"""
import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: the paper-preset programs take minutes to
# compile over the tunnel device; reruns should pay zero
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

TIMESTEPS = int(os.environ.get('BENCH_TIMESTEPS', 64))
COND_SCALE = float(os.environ.get('BENCH_COND_SCALE', 3.0))
MODE = os.environ.get('BENCH_MODE', 'base64_paper')
_DEFAULT_BATCH = {'base64': 8, 'base64_paper': 8, 'cascade': 4,
                  'cascade_paper': 4, 'edm': 4, 'edm_paper': 4,
                  'sr1024': 1, 'sr1024_paper': 1,
                  'video': 1, 'train': 32, 'train_paper': 16,
                  'train_sr256': 4}
BENCH_CROP = int(os.environ.get('BENCH_CROP', 0))
BATCH = int(os.environ.get('BENCH_BATCH', 0)) or _DEFAULT_BATCH.get(MODE, 8)
VIDEO_FRAMES = int(os.environ.get('BENCH_VIDEO_FRAMES', 16))

# prior-round measured values on this hardware (BENCH.md) — the regression gate
# for vs_baseline; keyed by mode, all higher-is-better. None = first
# measurement (vs_baseline 1.0, or MFU-normalized for *_paper; see docstring).
ROUND_BASE = {
    'base64': 122.1967,    # r02 ddpm_sampler_steps_per_sec @ batch 8, 64 steps
    'cascade': 4.38,       # r02 64->256 images/sec/chip @ batch 4, 64+32 steps
    'sr1024': 1 / 6.30,    # r02 256->1024 SR tail images/sec @ batch 1, 32 steps
    'edm': 2.13,           # r02 EDM 64->256 images/sec/chip @ batch 4
    'video': 1 / 1.075,    # r02 16-frame 64px clips/sec @ batch 1, 32 steps
    'train': 14.5,         # r02 train_steps_per_sec @ batch 32 (464 samples/s)
    # paper-preset modes, first measured in round 3 (BENCH.md); base64_paper /
    # train_paper keep the MFU-normalized definition below for cross-round
    # comparability of the driver's headline metric
    'base64_paper': None,
    'cascade_paper': 0.874,   # r03 images/sec/chip @ batch 4
    'sr1024_paper': 0.0872,   # r04 END images/sec/chip @ batch 1 (Pallas conv wired)
    'edm_paper': 0.437,       # r03 images/sec/chip @ batch 4
    'train_paper': None,
    'train_sr256': None,      # first measured in round 5
}
# round-2 MFU of the matching scaled path: the FLOPs-normalized baseline for
# the *_paper modes (see docstring)
R02_MFU = {'base64_paper': 0.5433, 'train_paper': 0.387}


def build_imagen(remat=None):
    """`remat=None` uses the mode default; `remat=False` forces it off (the MFU
    FLOPs lowering must never count recompute as useful work)."""
    from imagen_tpu.diffusion.imagen import Imagen
    from imagen_tpu.models.unet2d import (
        BaseUnet64, SRUnet256, SRUnet1024, Unet)

    common = dict(text_embed_dim=768, max_text_len=256, dtype=jnp.bfloat16)

    if MODE.endswith('_paper') or MODE == 'train_sr256':
        # TRUE paper presets (reference imagen_pytorch.py:1743-1783)
        # selective remat: keep conv/attn/FF outputs, recompute only the cheap
        # elementwise (full remat re-ran the whole forward: ~20% of the step)
        if remat is None:
            remat = 'save_convs' if MODE in ('train_paper', 'train_sr256') \
                else False
        if MODE == 'train_sr256':
            # BASELINE config 2's TRAINING half, unet 2: paper-preset SRUnet256
            # (memory_efficient, reference imagen_pytorch.py:1757-1769) with
            # the lowres-conditioning loss path; NullUnet placeholder stage 1.
            # BENCH_CROP=<px> turns on the paired random crop (p_losses
            # reference :2532-2546 — used by SR-unet training on crops).
            from imagen_tpu.models.unet2d import NullUnet
            crops = (None, BENCH_CROP) if BENCH_CROP else None
            return Imagen(
                unets=(NullUnet(), SRUnet256(**common, remat=remat)),
                image_sizes=(64, 256), text_embed_dim=768,
                timesteps=(TIMESTEPS, TIMESTEPS // 2),
                random_crop_sizes=crops, cond_drop_prob=0.1)
        base = BaseUnet64(**common, remat=remat)
        if MODE in ('base64_paper', 'train_paper'):
            return Imagen(
                unets=(base,), image_sizes=(64,), text_embed_dim=768,
                timesteps=TIMESTEPS, cond_drop_prob=0.1)
        if MODE == 'cascade_paper':
            return Imagen(
                unets=(base, SRUnet256(**common)), image_sizes=(64, 256),
                text_embed_dim=768, timesteps=(TIMESTEPS, TIMESTEPS // 2),
                cond_drop_prob=0.1)
        if MODE == 'sr1024_paper':
            from imagen_tpu.models.unet2d import NullUnet
            return Imagen(
                unets=(NullUnet(), SRUnet1024(**common)),
                image_sizes=(256, 1024), text_embed_dim=768,
                timesteps=(TIMESTEPS, TIMESTEPS // 2), cond_drop_prob=0.1)
        if MODE == 'edm_paper':
            # BASELINE config 3 at true preset dims (reference
            # elucidated_imagen.py defaults + imagen_pytorch.py:1743-1769)
            from imagen_tpu.diffusion.elucidated import ElucidatedImagen
            return ElucidatedImagen(
                unets=(base, SRUnet256(**common)), image_sizes=(64, 256),
                text_embed_dim=768,
                num_sample_steps=(TIMESTEPS, TIMESTEPS // 2),
                cond_drop_prob=0.1)
        raise ValueError(f'unknown BENCH_MODE {MODE!r}')

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


def _stage_forward_flops(imagen, params, index):
    """XLA cost-analysis FLOPs of ONE CFG-doubled unet forward for cascade
    stage `index`, lowered abstractly on the XLA-only path — cost analysis
    cannot see inside pallas calls, and the Pallas kernels compute the same
    math. Returns None for Null/unliftable stages."""
    from imagen_tpu.models.unet2d import NullUnet
    unet = imagen.unets[index]
    if isinstance(unet, NullUnet):
        return 0.0
    b2 = 2 * BATCH  # CFG doubling
    size = imagen.image_sizes[index]
    is_video = getattr(imagen, 'is_video', False)
    if is_video:
        x = jnp.zeros((b2, VIDEO_FRAMES, size, size, imagen.channels),
                      jnp.bfloat16)
    else:
        x = jnp.zeros((b2, size, size, imagen.channels), jnp.bfloat16)
    t = jnp.zeros((b2,), jnp.float32)
    kwargs = dict(text_embeds=jnp.zeros((b2, 256, 768), jnp.bfloat16),
                  text_mask=jnp.ones((b2, 256), bool))
    if getattr(unet, 'lowres_cond', False):
        kwargs['lowres_cond_img'] = jnp.zeros_like(x)
        kwargs['lowres_noise_times'] = t
    fwd = lambda p, x, t: unet.apply(p, x, t, **kwargs)
    compiled = jax.jit(fwd).lower(params[index], x, t).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca['flops'])


def _sample_flops(imagen, params):
    """Total unet-forward FLOPs of one full sample() batch: per-stage forward
    cost x per-stage eval count. DDPM stages run `steps` evals; EDM churn+Heun
    runs 2*steps-1 (second-order correction on every step but the last)."""
    os.environ['IMAGEN_TPU_DISABLE_PALLAS'] = '1'
    try:
        is_edm = hasattr(imagen, 'hparams')
        total = 0.0
        for i in range(imagen.num_unets):
            if MODE in ('sr1024', 'sr1024_paper') and i == 0:
                continue  # NullUnet stage is skipped entirely
            steps = TIMESTEPS if i == 0 else TIMESTEPS // 2
            evals = 2 * steps - 1 if is_edm else steps
            f = _stage_forward_flops(imagen, params, i)
            total += f * evals
        return total or None
    except Exception:
        return None
    finally:
        os.environ.pop('IMAGEN_TPU_DISABLE_PALLAS', None)


_METRIC = {
    'base64': ('ddpm_sampler_steps_per_sec', 'steps/sec'),
    'base64_paper': ('ddpm_base64_paper_sampler_steps_per_sec', 'steps/sec'),
    'cascade': ('cascade_64_256_images_per_sec_per_chip', 'images/sec/chip'),
    'cascade_paper': ('cascade_paper_64_256_images_per_sec_per_chip',
                      'images/sec/chip'),
    'sr1024': ('sr_256_1024_images_per_sec_per_chip', 'images/sec/chip'),
    'sr1024_paper': ('sr1024_paper_256_1024_images_per_sec_per_chip',
                     'images/sec/chip'),
    'edm': ('edm_cascade_64_256_images_per_sec_per_chip', 'images/sec/chip'),
    'edm_paper': ('edm_paper_cascade_64_256_images_per_sec_per_chip',
                  'images/sec/chip'),
    'video': ('video_16f_64px_clips_per_sec_per_chip', 'clips/sec/chip'),
}

_TOTAL_STEPS = {
    'base64': lambda: TIMESTEPS,
    'base64_paper': lambda: TIMESTEPS,
    'cascade': lambda: TIMESTEPS + TIMESTEPS // 2,
    'cascade_paper': lambda: TIMESTEPS + TIMESTEPS // 2,
    'edm': lambda: TIMESTEPS + TIMESTEPS // 2,
    'edm_paper': lambda: TIMESTEPS + TIMESTEPS // 2,
    'sr1024': lambda: TIMESTEPS // 2,   # NullUnet stage is skipped
    'sr1024_paper': lambda: TIMESTEPS // 2,
    'video': lambda: TIMESTEPS // 2,
}

_MODEL_DESC = {
    'base64_paper': 'BaseUnet64 (dim 512, paper preset)',
    'cascade_paper': 'BaseUnet64 + SRUnet256 (paper presets)',
    'sr1024_paper': 'SRUnet1024 (paper preset)',
    'edm_paper': 'EDM BaseUnet64 + SRUnet256 (paper presets)',
    'train_paper': 'BaseUnet64 (dim 512, paper preset)',
    'train_sr256': 'SRUnet256 (paper preset, memory_efficient, lowres cond)',
}


def _train_step_flops(trainer_kwargs, batch, unet_number=1):
    """XLA cost-analysis FLOPs of one fused train step, from an ABSTRACT
    lowering (ShapeDtypeStruct args — nothing is allocated on device, so this
    is safe to run before/alongside the real paper-scale state). Built WITHOUT
    remat so recompute FLOPs never inflate the MFU numerator."""
    from imagen_tpu.trainer import ImagenTrainer

    os.environ['IMAGEN_TPU_DISABLE_PALLAS'] = '1'
    try:
        tr = ImagenTrainer(imagen=build_imagen(remat=False), verbose=False,
                           **trainer_kwargs)
        index = unet_number - 1
        variables = jax.eval_shape(
            lambda: tr.imagen.init_unet_params(unet_number,
                                               jax.random.PRNGKey(0)))
        opt_state = jax.eval_shape(tr._optimizers[index].init, variables)
        ema = variables if tr.use_ema else None
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            (variables, opt_state, ema,
             jnp.asarray(0), batch, jax.random.PRNGKey(0)))
        step_fn = tr._get_step_fn('train', index, 1)
        ca = step_fn.lower(*abstract).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca['flops'])
    except Exception:
        return None
    finally:
        os.environ.pop('IMAGEN_TPU_DISABLE_PALLAS', None)


def main_train():
    """Training throughput: fused ImagenTrainer step (fwd+bwd+clip+update[+EMA],
    donated buffers) on the flagship base-64 unet with mock batches.

    train_paper fits the TRUE 1.6B-param BaseUnet64 on one 16 GB chip the way
    the Imagen paper itself did: zero-momentum Adafactor (factored second
    moment — Adam's full fp32 m+v would need 13 GB alone), remat'd blocks, no
    single-chip EMA copy (EMA at this scale rides the sharded multi-chip
    path). MFU is computed against non-remat model FLOPs, so the remat
    recompute is honestly counted as overhead, not useful work."""
    import numpy as np
    from imagen_tpu.trainer import ImagenTrainer

    paper = MODE == 'train_paper'
    sr = MODE == 'train_sr256'
    unet_number = 2 if sr else 1
    image_size = 256 if sr else 64
    # sync_loss=False: the device loss comes back as an async array so steps
    # pipeline — blocking on float(loss) every step left the chip 57% idle
    # over the tunnel transport (profiled)
    trainer_kwargs = dict(lr=1e-4, sync_loss=False)
    if paper:
        trainer_kwargs.update(optimizer='adafactor', beta1=None, use_ema=False)
    elif sr:
        # Adam fits: SRUnet256 is ~690M params, not the 1.57B base unet
        trainer_kwargs.update(use_ema=False,
                              only_train_unet_number=unet_number)
    else:
        trainer_kwargs.update(use_ema=True, ema_update_after_step=0,
                              ema_update_every=1)

    rng = np.random.RandomState(0)
    batch = {
        'images': jnp.asarray(rng.rand(BATCH, image_size, image_size, 3),
                              jnp.float32),
        'text_embeds': jnp.asarray(rng.randn(BATCH, 256, 768), jnp.float32),
        'text_masks': jnp.ones((BATCH, 256), bool),
    }

    # abstract FLOPs lowering first — allocates nothing
    flops = _train_step_flops(dict(trainer_kwargs, sync_loss=True), batch,
                              unet_number=unet_number)

    trainer = ImagenTrainer(imagen=build_imagen(), **trainer_kwargs)

    def run_n(n):
        loss = None
        for _ in range(n):
            loss = trainer.step_with_batch(dict(batch),
                                           unet_number=unet_number)
        return float(loss)  # one sync at the end of the window

    run_n(2)  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_n(10)
        times.append((time.perf_counter() - t0) / 10)
    elapsed = min(times)
    steps_per_sec = 1.0 / elapsed

    mfu = (round(flops * steps_per_sec / V5E_BF16_PEAK, 4)
           if flops is not None else None)

    baseline = ROUND_BASE[MODE]
    if baseline is not None:
        vs_baseline = steps_per_sec / baseline
        baseline_note = 'vs prior recorded throughput, same config (ROUND_BASE)'
    elif mfu is not None and MODE in R02_MFU:
        vs_baseline = mfu / R02_MFU[MODE]
        baseline_note = ('FLOPs-normalized: measured MFU / round-2 scaled-model '
                         f'MFU ({R02_MFU[MODE]})')
    else:
        vs_baseline = 1.0
        baseline_note = 'first measurement of this mode'

    print(json.dumps({
        'metric': (f'{MODE}_steps_per_sec' if MODE != 'train'
                   else 'train_steps_per_sec'),
        'value': round(steps_per_sec, 4),
        'unit': 'steps/sec',
        'vs_baseline': round(vs_baseline, 4),
        'baseline_note': baseline_note,
        'samples_per_sec_per_chip': round(BATCH * steps_per_sec, 3),
        'batch': BATCH,
        'mode': MODE,
        **({'model': _MODEL_DESC[MODE]} if MODE in _MODEL_DESC else {}),
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
    if MODE in ('sr1024', 'sr1024_paper'):
        sample_kwargs['start_at_unet_number'] = 2
        sample_kwargs['start_image_or_video'] = jnp.clip(
            jax.random.uniform(jax.random.PRNGKey(4), (BATCH, 256, 256, 3)),
            0., 1.)
    if os.environ.get('BENCH_OFFLOAD'):
        # cascade host-offload: park all stages on host, juggle the active one
        # on-device just-in-time (reference one_unet_in_gpu analog)
        from imagen_tpu.parallel.mesh import host_offload
        params = tuple(host_offload(p) for p in params)
        sample_kwargs['offload_inactive_unets'] = True

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

    value = steps_per_sec if MODE.startswith('base64') else images_per_sec

    mfu = None
    sample_flops = _sample_flops(imagen, params)
    if sample_flops is not None:
        mfu = round(sample_flops / elapsed / V5E_BF16_PEAK, 4)

    baseline = ROUND_BASE[MODE]
    if baseline is not None:
        vs_baseline = value / baseline
        baseline_note = 'vs prior recorded throughput, same config (ROUND_BASE)'
    elif mfu is not None and MODE in R02_MFU:
        vs_baseline = mfu / R02_MFU[MODE]
        baseline_note = ('FLOPs-normalized: measured MFU / round-2 scaled-model '
                         f'MFU ({R02_MFU[MODE]})')
    else:
        vs_baseline = 1.0
        baseline_note = 'first measurement of this mode'

    metric, unit = _METRIC[MODE]
    print(json.dumps({
        'metric': metric,
        'value': round(value, 4),
        'unit': unit,
        'vs_baseline': round(vs_baseline, 4),
        'baseline_note': baseline_note,
        'images_per_sec_per_chip': round(images_per_sec, 4),
        'sampler_steps_per_sec': round(steps_per_sec, 3),
        'p50_sec_per_image': round(sec_per_image, 4),
        'batch': BATCH,
        'timesteps': TIMESTEPS,
        'cond_scale': COND_SCALE,
        'mode': MODE,
        **({'model': _MODEL_DESC[MODE]} if MODE in _MODEL_DESC else {}),
        'device': str(jax.devices()[0]),
        **({'mfu': mfu} if mfu is not None else {}),
    }))


if __name__ == '__main__':
    main_train() if MODE in ('train', 'train_paper', 'train_sr256') else main()
