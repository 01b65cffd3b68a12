"""Isolated A/B of temporal-attention formulations at the video hot shape.

The grouped packed kernel (ops/flash_attention.py) carries ~30% of the video
step; BENCH.md's headroom list flagged its quadratic masked-sim waste (G
pixels' keys concatenate). Measured candidates (memory rule: never trust
profiler attribution or sub-50ms single shots — time a jitted lax.fori_loop
chain, and sync on a SCALAR, never a big array, over the tunnel):

  grouped    — the wired Pallas path (flash_grouped_cosine at G from the gate)
  rowspacked — 2nd-gen Pallas kernel: heads folded into the matmul M dim via
               the free (rows, h*d) -> (rows*h, d) reshape; G*nk keys in one
               lane tile (IMAGEN_TPU_TEMPORAL_G / _NG sweep the config)
  naive      — XLA einsum batched-matmul formulation (the pre-round-2 path)
  elemwise   — VPU formulation: broadcast-mul + reduce over d (no sim matmul)

Hot shape (three full-res layers of the video bench): b*h*w=4096 pixels,
f=16 frames, heads=8, d=64, nk_local=17 (null + 16 frames), causal,
DynamicPositionBias-style additive bias.

VERDICT (v5e, 2026-08-19): grouped 1.94-2.02 ms; rowspacked 2.10-2.36 ms
across (G, ng) in {4,8}x{1,2,4,8} — halving the padded sim/softmax area and
eliminating the unrolled head loop did NOT help, so the grouped kernel's
~2 ms is not area-bound (it's the tiny-KV MQA pattern's floor: VPU softmax +
d=64 half-lane tiles + per-program latency). naive 4.12 ms, elemwise 2.84 ms.
The rows-packed path stays OPT-IN (IMAGEN_TPU_TEMPORAL_ROWS=1).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('IMAGEN_TPU_TEMPORAL_ROWS', '1')   # measure the opt-in arm

import jax
import jax.numpy as jnp

import imagen_tpu.ops.flash_attention as fa

B, F, H, D, NKL = 4096, 16, 8, 64, 17
SCALE = 8.0
N_ITERS = 50


def inputs(key):
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, F, H * D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, NKL, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, NKL, D), jnp.bfloat16)
    q_scale = jnp.abs(jax.random.normal(ks[3], (D,), jnp.float32)) + 0.5
    k_scale = jnp.abs(jax.random.normal(ks[4], (D,), jnp.float32)) + 0.5
    bias = jax.random.normal(ks[5], (H, F, NKL), jnp.float32)
    return q, k, v, q_scale, k_scale, bias


def causal_bias(bias):
    cm = jnp.triu(jnp.ones((F, NKL), bool), NKL - F + 1)
    return jnp.where(cm[None], -1e30, bias)


def grouped(q, k, v, q_scale, k_scale, bias):
    G = fa.grouped_temporal_available(B, F, H, NKL)
    assert G, 'grouped path unavailable at the hot shape'
    cm = jnp.triu(jnp.ones((F, NKL), bool), NKL - F + 1)
    tile = fa.build_grouped_bias(bias, cm, G)
    q_g = q.reshape(B // G, G * F, H * D)
    k_g = k.reshape(B // G, G * NKL, D)
    v_g = v.reshape(B // G, G * NKL, D)
    out = fa.flash_grouped_cosine(q_g, k_g, v_g, q_scale, k_scale, tile,
                                  SCALE, H)
    return out.reshape(B, F, H * D)


def rowspacked(q, k, v, q_scale, k_scale, bias):
    G = fa.temporal_rows_available(B, F, H, NKL)
    assert G, 'rows-packed path unavailable at the hot shape'
    cm = jnp.triu(jnp.ones((F, NKL), bool), NKL - F + 1)
    tile = fa.build_rows_bias(bias, cm, G)
    q_g = q.reshape(B // G, G * F, H * D)
    k_g = k.reshape(B // G, G * NKL, D)
    v_g = v.reshape(B // G, G * NKL, D)
    out = fa.flash_temporal_rows(q_g, k_g, v_g, q_scale, k_scale, tile,
                                 SCALE, H)
    return out.reshape(B, F, H * D)


def _l2n(x, gain):
    n = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(n + 1e-12) * gain)


def naive(q, k, v, q_scale, k_scale, bias):
    q4 = q.reshape(B, F, H, D)
    qn = _l2n(q4, q_scale).astype(q.dtype)
    kn = _l2n(k, k_scale).astype(k.dtype)
    sim = jnp.einsum('bfhd,bjd->bhfj', qn, kn).astype(jnp.float32) * SCALE
    sim = sim + causal_bias(bias)[None]
    attn = jax.nn.softmax(sim, axis=-1).astype(q.dtype)
    out = jnp.einsum('bhfj,bjd->bfhd', attn, v)
    return out.reshape(B, F, H * D)


def elemwise(q, k, v, q_scale, k_scale, bias):
    # (B, F, H, 1, D) * (B, 1, 1, NKL, D) -> reduce D on the VPU, no matmul
    q4 = q.reshape(B, F, H, D)
    qn = _l2n(q4, q_scale).astype(jnp.float32)
    kn = _l2n(k, k_scale).astype(jnp.float32)
    sim = jnp.sum(qn[:, :, :, None, :] * kn[:, None, None, :, :], axis=-1)
    sim = sim * SCALE + causal_bias(bias).transpose(1, 0, 2)[None]
    attn = jax.nn.softmax(sim, axis=-1)                     # (B,F,H,NKL)
    out = jnp.sum(attn[..., None] * v[:, None, None, :, :], axis=3)
    return out.reshape(B, F, H * D).astype(q.dtype)


def timed(fn, args, iters=N_ITERS):
    def chain(i, carry):
        out = fn(*((carry,) + args[1:]))
        # feed the (negligibly scaled) output back so iterations serialize
        # without letting XLA fold the dependency away (0.0*x is fold-bait)
        return carry + (1e-30 * out.astype(jnp.float32)).astype(carry.dtype)

    @jax.jit
    def run(q0):
        # reduce to a SCALAR inside the program: the device->host sync copy
        # must not ship the 67 MB carry over the tunnel (that alone costs
        # tens of ms and buries the kernel time)
        return jnp.sum(jax.lax.fori_loop(0, iters, chain, q0)
                       .astype(jnp.float32))

    q0 = args[0]
    jax.device_get(run(q0))  # warmup/compile
    t0 = time.perf_counter()
    jax.device_get(run(q0))  # scalar copy as the tunnel-safe sync
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    args = inputs(jax.random.PRNGKey(0))

    ref = naive(*args)
    g = grouped(*args)
    e = elemwise(*args)
    r = rowspacked(*args)
    err_g = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - g.astype(jnp.float32))))
    err_e = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - e.astype(jnp.float32))))
    err_r = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - r.astype(jnp.float32))))
    print(f'correctness vs naive: grouped {err_g:.2e}  elemwise {err_e:.2e}  '
          f'rowspacked {err_r:.2e}')

    for name, fn in (('grouped', grouped), ('rowspacked', rowspacked),
                     ('naive', naive), ('elemwise', elemwise)):
        dt = timed(fn, args)
        print(f'{name:10s} {dt * 1e3:8.3f} ms/call')


if __name__ == '__main__':
    main()
