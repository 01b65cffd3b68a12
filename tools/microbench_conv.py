"""Microbench: XLA vs Pallas halo-DMA conv (ops/conv2d.py) per conv class.

Round-5 target (VERDICT #1): the SR-1024 shapes the round-4 gate left
unmeasured — above all the FULL-RES 1024^2 @ 128ch resnet convs (the
final_res_block / init-resnet class, 17.5% of the in-situ sample), which the
gate excludes via `H*W <= 512^2` even though the kernel tiles there (hb=4).
Also re-confirms the cf (channel-first tiny-Cout) variant and the round-4
win rows so run-to-run drift is visible.

Run on the real TPU:  python tools/microbench_conv.py
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imagen_tpu.ops import conv2d as c2d

SHAPES = [
    # (b, H, W, cin, cout)            class
    (2, 1024, 1024, 128, 128),   # full-res resnet conv  (UNMEASURED in r4)
    (2, 1024, 1024, 256, 128),   # full-res skip-concat conv (up path)
    (2, 512, 512, 128, 128),     # r4 win row (1.38x) — drift check
    (2, 256, 256, 512, 512),     # r4 win row (1.17x)
]
CF_SHAPES = [
    (2, 1024, 1024, 128, 3),     # final conv (cf variant, r4: 7.7 -> 6.6 ms)
]


def _time(fn, *args, iters=50):
    """Chain dependent evaluations inside one jit so tunnel dispatch noise
    cannot pollute ms-scale kernels (same harness as microbench_temporal)."""
    @jax.jit
    def run(x, *rest):
        def body(cur, _):
            out = fn(cur, *rest)
            # re-inject a dependency; out may be channel-first -> reduce
            return cur + 1e-6 * out.mean().astype(cur.dtype), None
        cur, _ = jax.lax.scan(body, x, None, length=iters)
        return cur.mean()            # scalar out: device_get is the sync

    jax.device_get(run(*args))       # warmup/compile (tunnel-safe sync)
    t0 = time.perf_counter()
    jax.device_get(run(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print(f'backend: {jax.default_backend()}')
    key = jax.random.PRNGKey(0)

    for b, H, W, cin, cout in SHAPES:
        x = jax.random.normal(key, (b, H, W, cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.02
        bias = jnp.zeros((cout,), jnp.bfloat16)
        t_x = _time(c2d._xla_reference, x, w, bias)
        tiles = c2d._pick_blocks(H, W, cin, cout, 3, 2)
        if tiles is None and not c2d._tiles_with_split(H, W, cin, cout, 3, 2):
            print(f'({b},{H},{W},{cin})->{cout}: XLA {t_x:.2f} ms | '
                  f'kernel DOES NOT TILE')
            continue
        # conv2d_same routes untileable-at-full-cin shapes via the cin split
        t_p = _time(c2d.conv2d_same, x, w, bias)
        blk = f'hb={tiles[0]},cb={tiles[1]}' if tiles else 'cin-split'
        print(f'({b},{H},{W},{cin})->{cout}: XLA {t_x:.2f} ms | '
              f'pallas {t_p:.2f} ms ({t_x / t_p:.2f}x) [{blk}]')

    for b, H, W, cin, cout in CF_SHAPES:
        x = jax.random.normal(key, (b, H, W, cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.02
        bias = jnp.zeros((cout,), jnp.bfloat16)
        t_x = _time(c2d._xla_reference, x, w, bias)
        t_p = _time(c2d._conv2d_same_cf_cv, x, w, bias)
        print(f'({b},{H},{W},{cin})->{cout} [cf]: XLA(nhwc) {t_x:.2f} ms | '
              f'pallas-cf {t_p:.2f} ms ({t_x / t_p:.2f}x)')

    # --- SR-1024 final conv as-wired: cin = 128 (unet dim) + 3 (lowres
    # concat, reference imagen_pytorch.py:1436-1441) = 131, which breaks the
    # cf gate's cin%128. Candidate: split the kernel at apply time (conv is
    # linear in a cin-concat) — cf Pallas on the 128 half + XLA on the 3-ch
    # half, summed. Baseline: one XLA conv on the premade 131-ch buffer.
    b, H, W = 2, 1024, 1024
    x131 = jax.random.normal(key, (b, H, W, 131), jnp.bfloat16)
    w131 = jax.random.normal(key, (3, 3, 131, 3), jnp.bfloat16) * 0.02
    bias3 = jnp.zeros((3,), jnp.bfloat16)

    def fused(x_all, w_all, bias):
        return c2d._xla_reference(x_all, w_all, bias)

    def split(x_all, w_all, bias):
        main = c2d._conv2d_same_cf_cv(x_all[..., :128], w_all[:, :, :128], bias)
        low = c2d._xla_reference(x_all[..., 128:], w_all[:, :, 128:], None)
        return jnp.moveaxis(main, 1, -1) + low

    t_f = _time(fused, x131, w131, bias3)
    t_s = _time(split, x131, w131, bias3)
    print(f'final conv (2,1024,1024,131)->3: fused XLA {t_f:.2f} ms | '
          f'cf-split {t_s:.2f} ms ({t_f / t_s:.2f}x)')


if __name__ == '__main__':
    main()
