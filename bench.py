"""Benchmark: DDPM sampler denoising-step throughput on the flagship base unet.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

North-star metrics (BASELINE.md): DDPM sampler steps/sec, images/sec/chip,
p50 sec/image. The reference publishes no numbers (BASELINE.md: "published: {}"),
so vs_baseline is the regression/improvement ratio against OUR round-1 recorded
numbers (BENCH_r01.json / BENCH.md) — >1.0 means faster than round 1.

Config: base Unet (dim=128, mults 1-2-3-4, attn at 3 lower resolutions) at 64x64,
batch 8, bf16 activations, mock T5 embeds (b, 256, 768), CFG cond_scale=3 (2 unet
forwards per step) — the hot loop of BASELINE config 2's base stage.
"""
import json
import os
import time

import jax
import jax.numpy as jnp

TIMESTEPS = int(os.environ.get('BENCH_TIMESTEPS', 64))
BATCH = int(os.environ.get('BENCH_BATCH', 8))
COND_SCALE = float(os.environ.get('BENCH_COND_SCALE', 3.0))
MODE = os.environ.get('BENCH_MODE', 'base64')  # 'base64' | 'cascade'

# round-1 measured values on this hardware (BENCH_r01.json / BENCH.md) — the
# regression gate for vs_baseline; keyed by (mode, default-config metric)
ROUND1 = {
    'base64': 91.2625,   # ddpm_sampler_steps_per_sec @ batch 8, 64 steps, CFG 3
    'cascade': 3.21,     # 64->256 images/sec/chip @ batch 4, 64+32 steps, CFG 3
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
    if MODE == 'base64':
        return Imagen(
            unets=(base,), image_sizes=(64,), text_embed_dim=768,
            timesteps=TIMESTEPS, cond_drop_prob=0.1)

    # BASELINE config 2 shape: base 64 + memory-efficient SR 256 (scaled dims)
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
    return Imagen(
        unets=(base, sr), image_sizes=(64, 256), text_embed_dim=768,
        timesteps=(TIMESTEPS, TIMESTEPS // 2), cond_drop_prob=0.1)


def main():
    imagen = build_imagen()

    key = jax.random.PRNGKey(0)
    params = imagen.init_params(key, batch_size=1, text_len=256)
    text_embeds = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 256, 768))
    text_masks = jnp.ones((BATCH, 256), bool)

    import numpy as np

    def run(k):
        out = imagen.sample(params, k, text_embeds=text_embeds,
                            text_masks=text_masks, cond_scale=COND_SCALE)
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
    total_steps = TIMESTEPS if MODE == 'base64' else TIMESTEPS + TIMESTEPS // 2
    steps_per_sec = total_steps / elapsed
    images_per_sec = BATCH / elapsed
    sec_per_image = elapsed / BATCH

    value = steps_per_sec if MODE == 'base64' else images_per_sec
    print(json.dumps({
        'metric': ('ddpm_sampler_steps_per_sec' if MODE == 'base64'
                   else 'cascade_64_256_images_per_sec_per_chip'),
        'value': round(value, 4),
        'unit': 'steps/sec' if MODE == 'base64' else 'images/sec/chip',
        'vs_baseline': round(value / ROUND1[MODE], 4),
        'images_per_sec_per_chip': round(images_per_sec, 4),
        'sampler_steps_per_sec': round(steps_per_sec, 3),
        'p50_sec_per_image': round(sec_per_image, 4),
        'batch': BATCH,
        'timesteps': TIMESTEPS,
        'cond_scale': COND_SCALE,
        'mode': MODE,
        'device': str(jax.devices()[0]),
    }))


if __name__ == '__main__':
    main()
