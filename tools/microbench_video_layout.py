"""Microbench: time-centric relayouts around TemporalAttention (round-4
verdict Weak #2 item 'layout reshapes around the frame-fold, 11.3%').

The wired path transposes (b f h w c) -> (b·h·w, f, c) before the per-pixel
temporal attention and back after — two full HBM relayout passes per
temporal-attention block, at every level, every step. Candidate fix measured
here: make the q/k/v PROJECTIONS do the transpose (einsum 'bfhwc,ce->bhwfe'
— the matmul epilogue writes the permuted layout directly) and the out
projection write back native ('bhwfe,ec->bfhwc'), so no standalone transpose
pass ever touches HBM.

Variants per shape (video bench levels: dim 64 @ 64², 128 @ 32², 256 @ 16²):
  transpose_only — the bare relayout round-trip (what we hope to delete)
  current        — transpose -> 3 dense projections -> out dense -> transpose
  einsum         — transposing projections, zero standalone relayouts
Run on the real TPU: python tools/microbench_video_layout.py
"""
import functools
import time

import jax
import jax.numpy as jnp

SHAPES = [      # (b, f, h, w, c) at the three video-bench levels (CFG-doubled)
    (2, 16, 64, 64, 64),
    (2, 16, 32, 32, 128),
    (2, 16, 16, 16, 256),
]
HEADS, DIM_HEAD = 8, 64


def _time(fn, x, *ws, iters=100):
    """Chain `iters` dependent evaluations inside ONE jit (scan) so host
    dispatch noise over the axon tunnel cannot pollute sub-ms kernels."""
    @jax.jit
    def run(x, *ws):
        def body(cur, _):
            out = fn(cur, *ws)
            # re-inject a cheap dependency so iterations serialize
            return cur + 1e-6 * out.astype(cur.dtype), None
        cur, _ = jax.lax.scan(body, x, None, length=iters)
        return cur.mean()            # scalar out: device_get is the sync

    jax.device_get(run(x, *ws))      # warmup/compile (tunnel-safe sync)
    t0 = time.perf_counter()
    jax.device_get(run(x, *ws))
    return (time.perf_counter() - t0) / iters * 1e3


def transpose_only(x):
    xt = jnp.transpose(x, (0, 2, 3, 4, 1))          # b h w c f (forces copy)
    return jnp.transpose(xt, (0, 4, 1, 2, 3)) * 1.  # back, *1 so not DCE'd


def current(x, wq, wkv, wo):
    b, f, h, w, c = x.shape
    e = wq.shape[1]
    xt = jnp.reshape(jnp.transpose(x, (0, 2, 3, 1, 4)), (b * h * w, f, c))
    q = xt @ wq
    kv = xt @ wkv
    k, v = jnp.split(kv, 2, axis=-1)
    o = q * 0.1 + k * 0.2 + v * 0.3                 # attn-core stand-in
    o = o @ wo
    return jnp.transpose(jnp.reshape(o, (b, h, w, f, c)), (0, 3, 1, 2, 4))


def einsum_proj(x, wq, wkv, wo):
    q = jnp.einsum('bfhwc,ce->bhwfe', x, wq)
    kv = jnp.einsum('bfhwc,ce->bhwfe', x, wkv)
    k, v = jnp.split(kv, 2, axis=-1)
    o = q * 0.1 + k * 0.2 + v * 0.3
    return jnp.einsum('bhwfe,ec->bfhwc', o, wo)


def main():
    print(f'backend: {jax.default_backend()}')
    for shape in SHAPES:
        b, f, h, w, c = shape
        e = HEADS * DIM_HEAD
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, shape, jnp.bfloat16)
        wq = jax.random.normal(key, (c, e), jnp.bfloat16) * 0.05
        wkv = jax.random.normal(key, (c, 2 * e), jnp.bfloat16) * 0.05
        wo = jax.random.normal(key, (e, c), jnp.bfloat16) * 0.05

        t_t = _time(transpose_only, x)
        t_c = _time(current, x, wq, wkv, wo)
        t_e = _time(einsum_proj, x, wq, wkv, wo)
        mb = x.size * 2 / 2 ** 20
        print(f'{shape} ({mb:.0f} MB): transpose_only {t_t:.3f} ms | '
              f'current {t_c:.3f} ms | einsum {t_e:.3f} ms | '
              f'delta {t_c - t_e:+.3f} ms ({t_c / t_e:.2f}x)')


if __name__ == '__main__':
    main()
