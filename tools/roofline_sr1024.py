"""Byte-level roofline for the sr1024_paper sampler (VERDICT r4 #1d).

For an HBM-bound stage, MFU is the wrong denominator. This tool computes the
MINIMAL per-step HBM traffic of the SRUnet1024 CFG-doubled forward — the
floor a perfect schedule could reach — and states the sample-time floor as

    t_floor = 32 steps * max(bytes_min / BW_HBM, flops / MXU_peak)

Minimal-traffic model (the "perfectly fused" program):
  - every conv / matmul materializes its output in HBM once (write) and each
    consumer reads it once — counted as producer-out + consumer-in bytes;
  - elementwise / norm / FiLM / concat / residual chains between those
    anchors add ZERO extra traffic (fused into a producer epilogue or a
    consumer prologue; stats computed on the one resident pass);
  - weights stream once per step.
This undercounts what ANY real compiler achieves (XLA's measured elementwise
fusions run ~1.5x minimal), so the floor is honest — nothing below it is
reachable on this chip.

Run anywhere (pure tracing, no device math): python tools/roofline_sr1024.py
"""
import os
import sys

# FORCE cpu: on the TPU backend the Pallas conv/attention gates open and
# those ops bypass the jax.lax interposers below — undercounting the roofline.
# On cpu every op routes through conv_general_dilated / dot_general.
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['IMAGEN_TPU_PALLAS_CONV'] = '0'

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_BW = 819e9        # v5e HBM bytes/s
MXU_PEAK = 197e12     # v5e bf16 FLOP/s (same constant as bench.py)
STEPS = 32
BATCH = 2             # batch 1, CFG-doubled inside the unet


def main():
    from imagen_tpu.models.unet2d import SRUnet1024

    records = []
    orig_conv = jax.lax.conv_general_dilated
    orig_dot = jax.lax.dot_general

    def counting_conv(lhs, rhs, window_strides, padding, *a, **k):
        out = orig_conv(lhs, rhs, window_strides, padding, *a, **k)
        records.append(('conv', lhs, rhs, out))
        return out

    def counting_dot(lhs, rhs, dimension_numbers, *a, **k):
        out = orig_dot(lhs, rhs, dimension_numbers, *a, **k)
        records.append(('dot', lhs, rhs, out, dimension_numbers))
        return out

    unet = SRUnet1024(text_embed_dim=768, max_text_len=256,
                      dtype=jnp.bfloat16)

    def fwd(img, lowres, t, te, tm):
        return unet.init_with_output(
            jax.random.PRNGKey(0), img, t, text_embeds=te, text_mask=tm,
            lowres_cond_img=lowres,
            lowres_noise_times=jnp.zeros((BATCH,), jnp.float32))[0]

    args = (jnp.zeros((BATCH, 1024, 1024, 3), jnp.bfloat16),
            jnp.zeros((BATCH, 1024, 1024, 3), jnp.bfloat16),
            jnp.zeros((BATCH,), jnp.float32),
            jnp.zeros((BATCH, 256, 768), jnp.bfloat16),
            jnp.ones((BATCH, 256), bool))

    jax.lax.conv_general_dilated = counting_conv
    jax.lax.dot_general = counting_dot
    try:
        jax.eval_shape(fwd, *args)
    finally:
        jax.lax.conv_general_dilated = orig_conv
        jax.lax.dot_general = orig_dot

    def nbytes(x):
        return int(np.prod(x.shape)) * x.dtype.itemsize

    total_bytes = 0
    total_flops = 0
    by_class = {}
    for rec in records:
        kind = rec[0]
        lhs, rhs, out = rec[1], rec[2], rec[3]
        b = nbytes(lhs) + nbytes(rhs) + nbytes(out)
        if kind == 'conv':
            # out elems * 2 * taps * cin   (NHWC/HWIO as used everywhere here)
            kh, kw, cin = rhs.shape[0], rhs.shape[1], rhs.shape[2]
            f = 2 * int(np.prod(out.shape)) * kh * kw * cin
            key = f'conv {lhs.shape[1]}x{lhs.shape[2]} {cin}->{rhs.shape[3]}'
        else:
            (lc, rc), _ = rec[4]
            k_elems = int(np.prod([lhs.shape[i] for i in lc]))
            f = 2 * int(np.prod(out.shape)) * k_elems
            key = 'dot'
        total_bytes += b
        total_flops += f
        cls = by_class.setdefault(key, [0, 0, 0])
        cls[0] += 1
        cls[1] += b
        cls[2] += f

    # per-step sampler math outside the unet: x_t, eps, posterior mean/var,
    # thresholded x0 — ~6 full-image fp32 tensors read+written per step
    sampler_bytes = 6 * 2 * (1 * 1024 * 1024 * 3 * 4)
    total_bytes += sampler_bytes

    t_hbm = total_bytes / HBM_BW
    t_mxu = total_flops / MXU_PEAK
    floor = STEPS * max(t_hbm, t_mxu)

    print(f'records: {len(records)} conv/dot sites (one CFG-doubled forward)')
    print(f'minimal HBM traffic / step : {total_bytes / 1e9:.2f} GB '
          f'(incl. {sampler_bytes / 1e9:.3f} GB sampler math)')
    print(f'flops / step               : {total_flops / 1e12:.2f} TF')
    print(f't_HBM = {t_hbm * 1e3:.1f} ms   t_MXU = {t_mxu * 1e3:.1f} ms '
          f'   bound: {"HBM" if t_hbm > t_mxu else "MXU"}')
    print(f'sample floor ({STEPS} steps) : {floor:.2f} s/img')
    print()
    print('top classes by minimal bytes:')
    for key, (n, b, f) in sorted(by_class.items(), key=lambda kv: -kv[1][1])[:12]:
        print(f'  {key:42s} x{n:3d}  {b / 1e9:6.2f} GB  {f / 1e12:6.2f} TF')


if __name__ == '__main__':
    main()
