"""Pallas fused CrossEmbed stem: all scale convs + concat + depth-to-space
in ONE pass over the image.

The multi-kernel-size stem (reference imagen_pytorch.py:1051-1076) is the
SR samplers' worst-emitted conv class: cin is tiny (RGB + lowres concat =
6), so XLA's conv emitter runs at ~6 TF/s raw and ~42 TF/s with the 2x2
phase tiling blocks.CrossEmbedLayer applies — and the phase-tiled form then
pays THREE full-size HBM layout passes (per-scale phase concat at 127 GB/s,
channel gather, depth-to-space) that together cost ~2.5x the conv itself
(r5 profile: stem = 8.8% of the SR-1024 sample, 24 ms/step, of which 17 ms
is layout). The s2d factor is also pinned by in-situ measurement: s=4
(K=96-per-tap) beats s=2 isolated (20.5 vs 23.4 ms) but LOSES end-to-end
(8.88 -> 9.10 s/img) because the finer phase interleave degrades the XLA
concat further.

This kernel takes the 4x4 space-to-depth input (built in XLA — the INPUT is
~13 MB, negligible; the 537 MB OUTPUT-side layout work is what dies) and,
per (batch, row-band) grid step:

  - DMAs the band + halo rows into VMEM once,
  - contracts every scale's phase-tiled taps on the MXU (K = s^2*c = 96,
    75% lane utilization vs 19% at s=2) with per-scale (Kt, base) windows
    so small kernels don't pay the max-K tap count,
  - un-tiles the phase outputs in-register (the depth-to-space transpose),
  - and writes the final (b, H, W, sum d) NHWC tensor directly.

Zero standalone HBM layout passes; the output is written exactly once.

Backward recomputes through the XLA reference chain (the per-scale SAME
convs + concat), so grads follow the module math exactly — same pattern as
ops/conv2d.py.

Wiring: blocks.CrossEmbedLayer dispatches here on the measured win surface;
`IMAGEN_TPU_PALLAS_STEM=0` disables (A/B knob). Receipts in BENCH.md.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # tests flip via monkeypatch to run on CPU

S = 4  # space-to-depth factor (s=4 -> K=96 contractions at c=6)


def _scale_geometry(k, pmax, s=S):
    """(Kt, base): tap-window block count and start offset for kernel size k
    under shared input padding pmax. base is in s2d blocks relative to the
    output block index."""
    p = k // 2
    lo = (pmax - p) // s
    hi = (s - 1 + p + pmax) // s
    return hi - lo + 1, lo


def _phase_weights(w, pmax, s=S):
    """(k, k, c, d) -> (Kt, Kt, s*s*c, s*s*d) phase-tiled weights for the
    kernel's tap windows; output channel order (p1 p2 o)."""
    k = w.shape[0]
    p = k // 2
    Kt, base = _scale_geometry(k, pmax, s)
    phases = []
    for p1 in range(s):
        for p2 in range(s):
            Lr = p1 - p + pmax - s * base
            Lc = p2 - p + pmax - s * base
            assert Lr >= 0 and s * Kt - k - Lr >= 0, (k, pmax, s, p1)
            assert Lc >= 0 and s * Kt - k - Lc >= 0, (k, pmax, s, p2)
            wp = jnp.pad(w, ((Lr, s * Kt - k - Lr), (Lc, s * Kt - k - Lc),
                             (0, 0), (0, 0)))
            wp = wp.reshape(Kt, s, Kt, s, *w.shape[2:])
            wp = wp.transpose(0, 2, 1, 3, 4, 5)        # (Kt, Kt, sr, sc, c, o)
            wp = wp.reshape(Kt, Kt, s * s * w.shape[2], w.shape[3])
            phases.append(wp)
    return jnp.concatenate(phases, axis=-1)


def _kernel(xs_ref, *refs, geoms, dims, hb, NW, s, c):
    """One (batch, row-band) program. refs = (w_0..w_{n-1}, o_ref, scratch,
    sem). Scales are computed sequentially so only one fp32 accumulator
    lives at a time."""
    n = len(dims)
    w_refs = refs[:n]
    o_ref = refs[n]
    xs_s = refs[n + 1]
    sem = refs[n + 2]
    bi = pl.program_id(0)
    hi = pl.program_id(1)

    halo = max(base + Kt for Kt, base in geoms) - 1
    rows = hb + halo
    cp = pltpu.make_async_copy(
        xs_ref.at[bi, pl.ds(hi * hb, rows), :, :],
        xs_s.at[pl.ds(0, rows), :, :],
        sem)
    cp.start()
    cp.wait()

    c0 = 0
    for si in range(n):
        Kt, base = geoms[si]
        d = dims[si]
        acc = jnp.zeros((hb * NW, s * s * d), jnp.float32)
        for dy in range(Kt):
            for dx in range(Kt):
                win = xs_s[base + dy:base + dy + hb,
                           base + dx:base + dx + NW, :]
                acc = acc + jax.lax.dot_general(
                    win.reshape(hb * NW, s * s * c), w_refs[si][dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        # depth-to-space WITHOUT any in-register transpose (Mosaic rejects
        # general 5D transposes): the output array is declared
        # (b, H/s, s, W, C) — p1 is a static middle-dim index — and the
        # column (NW, p2) interleave is already reshape-order in the
        # (p1 p2 o) channel layout. Lane slices at c0 are 128-multiples for
        # the standard (64, 32, 32) dims.
        acc4 = acc.reshape(hb, NW, s * s * d).astype(o_ref.dtype)
        for p1 in range(s):
            y_p1 = acc4[:, :, p1 * s * d:(p1 + 1) * s * d]   # (hb, NW, s*d)
            o_ref[0, :, p1, :, c0:c0 + d] = y_p1.reshape(hb, NW * s, d)
        c0 += d


def _pick_hb(NH, NW, c, dims, dtype_bytes, s=S):
    budget = 11 * 1024 * 1024
    dmax = max(dims)
    for hb in (8, 4, 2, 1):
        if NH % hb:
            continue
        out = 2 * hb * s * NW * s * sum(dims) * dtype_bytes   # double-buffered
        acc = 2 * hb * NW * s * s * dmax * 4                  # fp32 + d2s temp
        scratch = (hb + 8) * (NW + 8) * s * s * c * dtype_bytes
        if out + acc + scratch <= budget:
            return hb
    return None


def _xla_reference(x, ws, bias):
    """The untiled CrossEmbed math: per-scale stride-1 SAME convs, concat."""
    fmaps = []
    for w in ws:
        k = w.shape[0]
        pad = (k - 1) // 2
        fmaps.append(jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')))
    y = jnp.concatenate(fmaps, axis=-1)
    return y + bias.astype(y.dtype)


def stem_available(x_shape, kernel_sizes, interpret=False):
    """Gate: NHWC, c*s^2 <= 128 lanes, H/W divisible by s, odd kernels, and
    a valid row-band tiling. Win surface set by e2e measurement (BENCH.md)."""
    if os.environ.get('IMAGEN_TPU_DISABLE_PALLAS'):
        return False
    if os.environ.get('IMAGEN_TPU_PALLAS_STEM', '1') == '0':
        return False
    if not (interpret or _INTERPRET) and jax.default_backend() != 'tpu':
        return False
    if len(x_shape) != 4:
        return False
    b, H, W, c = x_shape
    if c * S * S > 128 or H % S or W % S:
        return False
    if any(k % 2 == 0 for k in kernel_sizes):
        return False
    return True


def _forward(x, ws, bias, interpret=False):
    b, H, W, c = x.shape
    s = S
    pmax = max(w.shape[0] for w in ws) // 2
    dims = tuple(w.shape[3] for w in ws)
    geoms = tuple(_scale_geometry(w.shape[0], pmax, s) for w in ws)
    NH, NW = H // s, W // s

    hb = _pick_hb(NH, NW, c, dims, x.dtype.itemsize, s)
    if hb is None or not (interpret or _INTERPRET
                          or jax.default_backend() == 'tpu'):
        return _xla_reference(x, ws, bias)

    ext = (-(H + 2 * pmax)) % s
    xp = jnp.pad(x, ((0, 0), (pmax, pmax + ext), (pmax, pmax + ext), (0, 0)))
    xs = xp.reshape(b, NH + (2 * pmax + ext) // s, s,
                    NW + (2 * pmax + ext) // s, s, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, NH + (2 * pmax + ext) // s, NW + (2 * pmax + ext) // s, s * s * c)

    wts = [_phase_weights(w.astype(x.dtype), pmax, s) for w in ws]
    halo = max(base + Kt for Kt, base in geoms) - 1
    NWB = xs.shape[2]
    interp = interpret or _INTERPRET

    y = pl.pallas_call(
        functools.partial(_kernel, geoms=geoms, dims=dims, hb=hb, NW=NW,
                          s=s, c=c),
        out_shape=jax.ShapeDtypeStruct((b, NH, s, W, sum(dims)), x.dtype),
        grid=(b, NH // hb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY if interp else pltpu.ANY)]
        + [pl.BlockSpec(wt.shape, lambda bb, hh: (0,) * 4) for wt in wts],
        out_specs=pl.BlockSpec((1, hb, s, W, sum(dims)),
                               lambda bb, hh: (bb, hh, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hb + halo, NWB, s * s * c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interp,
        compiler_params=None if interp else pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
    )(xs, *wts)
    # (b, H/s, s, W, C) -> (b, H, W, C) is a free metadata reshape; the bias
    # add rides the consumer's producer fusion (XLA), not an extra pass
    y = y.reshape(b, H, W, sum(dims))
    return y + bias.astype(y.dtype)


@jax.custom_vjp
def _stem_cv(x, ws, bias):
    return _forward(x, ws, bias)


def _fwd(x, ws, bias):
    return _stem_cv(x, ws, bias), (x, ws, bias)


def _bwd(residuals, g):
    x, ws, bias = residuals
    _, vjp = jax.vjp(_xla_reference, x, ws, bias)
    return vjp(g)


_stem_cv.defvjp(_fwd, _bwd)


def cross_embed_stem(x, ws, bias):
    """Fused multi-scale stem conv. x (b,H,W,c); ws list of (k,k,c,d_i)
    sorted like blocks.CrossEmbedLayer's scales; bias (sum d_i,). Call only
    when `stem_available(x.shape, [w.shape[0] for w in ws])` is True."""
    return _stem_cv(x, tuple(ws), bias)
