"""Isolated A/B of the fused LN+relayout kernels (ops/temporal_layout.py)
vs the XLA chain they replace, at the video hot shapes.

The end-to-end video A/B measured the fused path NEGATIVE (1.073 -> 1.130
s/clip, round 5). This microbench separates "the kernel is slower than
XLA's transpose+norm" from "the custom-call boundary breaks surrounding
fusions" — the same diagnostic split that decided the conv wiring (BENCH.md).

Timing follows the repo microbench rule (tools/microbench_temporal.py):
jitted fori_loop chain, scalar-only device->host sync, never sub-50ms
single shots over the tunnel. Each iteration runs the CLOSED pair
fold(LN+transpose) -> unfold(out-norm+untranspose+residual) so the chain
carries a constant shape — the pair is exactly how the model brackets
TemporalAttention (models/video_blocks.py).

Run on TPU: python tools/microbench_temporal_layout.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imagen_tpu.ops import temporal_layout as tl

N_ITERS = 50
EPS = 1e-5


def make_pair(fold, unfold, g):
    def pair(x):
        t = fold(x, g, EPS)
        return unfold(t, x, g, EPS)
    return pair


def timed(pair, x, iters=N_ITERS):
    def chain(i, carry):
        out = pair(carry)
        return carry + (1e-30 * out.astype(jnp.float32)).astype(carry.dtype)

    @jax.jit
    def run(x0):
        return jnp.sum(jax.lax.fori_loop(0, iters, chain, x0)
                       .astype(jnp.float32))

    jax.device_get(run(x))
    t0 = time.perf_counter()
    jax.device_get(run(x))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    shapes = [
        (1, 16, 64, 64, 64),     # video bench full-res level
        (2, 16, 64, 64, 64),
        (1, 16, 32, 32, 128),
        (1, 16, 16, 16, 256),
    ]
    for shp in shapes:
        b, f, h, w, c = shp
        x = jax.random.normal(jax.random.PRNGKey(0), shp, jnp.bfloat16)
        g = jnp.ones((c,), jnp.float32)

        fused = make_pair(tl.fused_ln_transpose, tl.fused_norm_untranspose, g)
        xla = make_pair(tl._ln_t_xla, tl._norm_ut_xla, g)

        # sanity: identical math
        err = jnp.max(jnp.abs(fused(x).astype(jnp.float32)
                              - xla(x).astype(jnp.float32)))
        a = timed(fused, x)
        bms = timed(xla, x)
        print(f'{shp}: pair fused {a:.3f} ms  xla {bms:.3f} ms '
              f'({bms/a:.2f}x)  max_err {float(err):.2e}')


if __name__ == '__main__':
    main()
