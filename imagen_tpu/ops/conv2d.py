"""Pallas stride-1 SAME 3x3 convolution (NHWC): WIRED on its measured win
surface (big-channel SR shapes), off elsewhere.

Built for the conv classes that looked pathological in the SR-1024 in-situ
profile (BENCH.md): the pre-downsampled big-channel blocks
(512^2@128 / 128^2@512 / 64^2@1024) and the unets' `final_conv`
(128 -> 3 at 1024^2).

MEASURED (v5e bf16, isolated chained loops; round 4):

    shape                      XLA      this kernel
    (2,1024,1024,128)->3       7.7 ms   8.8 ms (cf variant below: 6.6 ms)
    (2,512,512,128)->128       3.66     2.66   (1.38x)
    (2,256,256,512)->512       6.24     5.34   (1.17x)
    (2,128,128,512)->512       1.89     1.80   (1.05x)
    (2,64,64,1024)->1024       2.14     2.00   (1.07x)
    (16,64,64,512)->512        3.08     3.27   (0.94x)

Round-5 additions: (a) the previously unmeasured FULL-RES 1024^2 classes
also win — (2,1024,1024,128)->128: 9.18 vs 8.33 ms (1.10x), (2,1024,1024,
256)->128: 17.31 vs 14.26 ms (1.21x) (tools/microbench_conv.py) — so the
gate extends to 1024^2 spatial; same-day end-to-end A/B 11.485 ->
**10.203 s/img (1.126x)**. (b) the DEEP 64^2 big-cin classes (SRUnet1024's
mid level: 31x 1024->1024 + 9x 2048->1024 convs/step) ran IN-SITU at 51
TF/s vs 94 isolated — XLA fuses their 1024-ch norm/SiLU producers into the
conv loops; the kernel wins 1.07x isolated at 1024-cin and **1.54x** at
2048-cin via two half-cin calls summed (`_tiles_with_split`; exact — conv
is linear in cin). Same-day A/B: 10.203 -> **8.883 s/img (1.149x, MFU
42.1 -> 48.4)**; `IMAGEN_TPU_PALLAS_CONV_DEEP=0` is the off arm.

Verdict (round 4, revised round 5): WIRED via `blocks.SameConv3x3` on
exactly the winning shapes (>=128 cin AND cout, 128^2-1024^2 spatial, plus
64^2 with cin>=1024; gate in conv2d_same_available;
`IMAGEN_TPU_PALLAS_CONV=0` disables). Round-4
end-to-end A/B on the full sr1024_paper sampler:
**13.90 -> 11.47 s/img (1.213x, MFU 30.9 -> 37.5)** —
the in-situ win beats the isolated 1.05-1.38x because the opaque
custom-call boundary stops XLA from fusing 537 MB elementwise producers
into its conv loops (they compile into their own dense ~600 GB/s fusions
instead). Base-64 / small shapes stay on XLA, where the kernel measures
0.87-0.94x. The per-tap cost that caps this kernel is the (hb*W, Cin)
window materialization per (dy,dx) slice. The tiny-Cout full-res case —
NHWC output lane-padded Cout -> 128 in HBM — improves only 7.7 -> 6.6 ms
(`conv2d_same_cf`, ~0.5% of the SR sample; see blocks.py for wiring
status): the conv is input-read-dominated and the MXU cannot be fed from 9
shifted windows without paying the copies.

Kernel design (kept as the reference halo-DMA pattern): grid
(batch, H/hb[, Cout/cb]); weights VMEM-resident; the input row band
[hi*hb - p, hi*hb + hb + p) is DMA'd from HBM (`pl.ANY` un-blocked ref) into
a zero-initialized scratch with an 8-column sublane-aligned pad, so SAME
boundary handling is a memset, not host padding; each (dy, dx) tap is a
static slice contracted on the MXU with fp32 accumulation; bias folds into
the accumulator init. Backward = jax.vjp of the XLA reference.

Reference semantics: nn.Conv(features, (3, 3), padding='SAME')
(torch Conv2d(pad=1) in the reference, imagen_pytorch.py:689-691,1434-1443).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # tests flip this to run on CPU

# conservative VMEM budget (bytes) for choosing block sizes; the scoped-vmem
# limit is ~16 MB and pipelined in/out blocks are double-buffered
_VMEM_BUDGET = 10 * 1024 * 1024


def _kernel(x_ref, w_ref, b_ref, o_ref, xs_ref, sem, *, k, hb, W, cin,
            num_h):
    """One (batch, h-block, cout-block) program."""
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    p = k // 2
    cb = w_ref.shape[3]

    # zero scratch: gives the SAME-padding zeros at image borders and the
    # W-edge pad columns in one VPU memset (VMEM-resident, ~free vs the DMA)
    xs_ref[...] = jnp.zeros_like(xs_ref)

    # the W axis is sublane-tiled (8): the DMA destination offset must be a
    # multiple of 8, so the scratch carries an 8-column left pad regardless
    # of p and the tap windows below shift by (8 - p)
    def dma(row0, nrows, dst0):
        cp = pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(row0, nrows), :, :],
            xs_ref.at[pl.ds(dst0, nrows), pl.ds(8, W), :],
            sem)
        cp.start()
        cp.wait()

    H = num_h * hb
    if num_h == 1:
        dma(0, H, p)
    else:
        # three statically-sized cases (DMA extents must be static)
        @pl.when(hi == 0)
        def _():
            dma(0, hb + p, p)

        @pl.when(hi == num_h - 1)
        def _():
            dma(H - (hb + p), hb + p, 0)

        @pl.when(jnp.logical_and(hi > 0, hi < num_h - 1))
        def _():
            dma(hi * hb - p, hb + 2 * p, 0)

    acc = jnp.broadcast_to(
        b_ref[0].astype(jnp.float32), (hb * W, cb))
    for dy in range(k):
        for dx in range(k):
            c0 = 8 - p + dx
            xwin = xs_ref[dy:dy + hb, c0:c0 + W, :]
            acc = acc + jax.lax.dot_general(
                xwin.reshape(hb * W, cin), w_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(hb, W, cb).astype(o_ref.dtype)


def _pick_blocks(H, W, cin, cout, k, dtype_bytes):
    """(hb, cb) fitting the VMEM budget, or None if no valid tiling exists."""
    p = k // 2
    cb_cands = [c for c in (512, 256, 128, cout) if c <= cout and cout % c == 0]
    hb_cands = [h for h in (64, 32, 16, 8, 4, 2, 1) if h <= H and H % h == 0]
    for cb in sorted(set(cb_cands), reverse=True):
        for hb in hb_cands:
            scratch = (hb + 2 * p) * (W + 16) * cin * dtype_bytes
            w_blk = 2 * k * k * cin * cb * dtype_bytes          # double-buffered
            acc = hb * W * max(cb, 128) * 4                     # fp32, lane pad
            out = 2 * hb * W * max(cb, 128) * dtype_bytes
            if scratch + w_blk + acc + out <= _VMEM_BUDGET and hb * W >= 512:
                return hb, cb
    return None


def _tiles_with_split(H, W, cin, cout, k, itemsize):
    """True if the kernel tiles at cin, or at some halving of cin >= 512
    (conv2d_same then runs the halves as separate kernel calls and sums —
    exact: a stride-1 conv is linear in cin)."""
    while True:
        if _pick_blocks(H, W, cin, cout, k, itemsize) is not None:
            return True
        if cin % 2 or cin < 1024:
            return False
        cin //= 2


def conv2d_same_available(x_shape, w_shape, dtype):
    """Shape/backend gate for the models' 3x3-conv dispatch (blocks.SameConv3x3).

    Returns True only where the kernel both tiles AND measured >= 1.0x vs XLA
    (the header table): the pre-downsampled SR-level shapes, 128^2..512^2
    spatial with >= 128 channels in AND out. Tiny-Cout shapes measured SLOWER
    here (use `conv2d_same_cf` for those); the batch-16 base-64 class also
    lost. `IMAGEN_TPU_PALLAS_CONV=0` force-disables (A/B switch).
    """
    if os.environ.get('IMAGEN_TPU_DISABLE_PALLAS'):
        return False
    if os.environ.get('IMAGEN_TPU_PALLAS_CONV', '1') == '0':
        return False
    if not _INTERPRET and jax.default_backend() != 'tpu':
        return False
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    b, H, W, cin = x_shape
    kh, kw, wcin, cout = w_shape
    if kh != kw or kh % 2 == 0 or wcin != cin:
        return False
    if cin % 128 != 0 or W % 64 != 0 or H % 8 != 0:
        return False
    if not _tiles_with_split(H, W, cin, cout, kh, dtype_itemsize(dtype)):
        return False
    # measured win surface (v5e): mid-res big-channel (r4 header table) PLUS
    # the full-res 1024^2 classes (r5 tools/microbench_conv.py — 128->128
    # 1.10x, 256->128 1.21x; the r4 gate stopped at 512^2 unmeasured) PLUS
    # the deep 64^2 big-cin classes (r5: 1024->1024 isolated 1.09x while the
    # IN-SITU XLA conv runs at 51 TF/s vs 94 isolated — producer fusions
    # poison XLA's deep-conv loops exactly as they did the full-res class;
    # 2048-cin runs as two cin-split kernel calls). The small-cin 64^2
    # base-64 classes stay excluded (measured 0.87-0.94x in r4).
    # IMAGEN_TPU_PALLAS_CONV_MAXHW=512 reproduces the r4 gate (A/B knob);
    # IMAGEN_TPU_PALLAS_CONV_DEEP=0 disables the 64^2 big-cin extension.
    max_hw = int(os.environ.get('IMAGEN_TPU_PALLAS_CONV_MAXHW', '1024'))
    if 128 * 128 <= H * W <= max_hw * max_hw and cout >= 128:
        return True
    return (os.environ.get('IMAGEN_TPU_PALLAS_CONV_DEEP', '1') == '1'
            and H * W == 64 * 64 and cin >= 1024 and cout >= 128)


def _forward(x, w, b, interpret=False):
    bsz, H, W, cin = x.shape
    k, _, _, cout = w.shape
    p = k // 2
    hb, cb = _pick_blocks(H, W, cin, cout, k, x.dtype.itemsize)
    num_h = H // hb
    grid = (bsz, num_h, cout // cb)

    w = w.astype(x.dtype)
    b = (b if b is not None else jnp.zeros((cout,), x.dtype)).astype(x.dtype)
    b = b.reshape(1, cout)

    return pl.pallas_call(
        functools.partial(_kernel, k=k, hb=hb, W=W, cin=cin, num_h=num_h),
        out_shape=jax.ShapeDtypeStruct((bsz, H, W, cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if not interpret else pl.ANY),
            pl.BlockSpec((k, k, cin, cb), lambda bb, hh, cc: (0, 0, 0, cc)),
            pl.BlockSpec((1, cb), lambda bb, hh, cc: (0, cc)),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, W, cb), lambda bb, hh, cc: (bb, hh, 0, cc)),
        scratch_shapes=[
            pltpu.VMEM((hb + 2 * p, W + 16, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary', 'arbitrary')),
    )(x, w, b)


def _xla_reference(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


@jax.custom_vjp
def _conv2d_same_cv(x, w, b):
    return _forward(x, w, b, interpret=_INTERPRET)


def _fwd(x, w, b):
    return _conv2d_same_cv(x, w, b), (x, w, b)


def _bwd(residuals, g):
    # linear-transpose of the two bilinear factors: XLA lowers these straight
    # to transposed-conv forms with NO forward recompute (a jax.vjp of the
    # reference would re-run the forward into a dead value instead)
    x, w, b = residuals
    conv = lambda x_, w_: _xla_reference(x_, w_, None)
    dx, = jax.linear_transpose(lambda x_: conv(x_, w), x)(g)
    dw, = jax.linear_transpose(lambda w_: conv(x, w_), w)(g)
    db = None if b is None else g.sum(axis=(0, 1, 2)).astype(b.dtype)
    return dx, dw, db


_conv2d_same_cv.defvjp(_fwd, _bwd)


def conv2d_same(x, w, b):
    """Stride-1 SAME NHWC conv, Pallas forward / XLA backward.

    x (b,H,W,Cin); w (k,k,Cin,Cout) odd k; b (Cout,) or None. Call only when
    `conv2d_same_available(x.shape, w.shape, x.dtype)` is True. Under an
    active kernel mesh (parallel.kernel_sharding) the call shard_maps over
    the image-batch axis so GSPMD never replicates the activations around the
    opaque kernel; weight/bias cotangents are psum'd across the axis.

    cin too big for one VMEM tiling (the SRUnet1024 2048-cin skip-concat
    convs) splits into two half-cin kernel calls summed — exact, since a
    stride-1 conv is linear in cin; the extra output round trip is ~0.1 ms
    at the 64^2 shapes this serves."""
    from imagen_tpu.parallel.kernel_sharding import shard_over_batch
    _, H, W, cin = x.shape
    k, _, _, cout = w.shape
    if _pick_blocks(H, W, cin, cout, k, x.dtype.itemsize) is None:
        assert cin % 2 == 0, (x.shape, w.shape)
        h = cin // 2
        y = conv2d_same(x[..., :h], w[:, :, :h, :], b)
        return y + conv2d_same(x[..., h:], w[:, :, h:, :], None)
    if b is None:
        return shard_over_batch(lambda x, w: _conv2d_same_cv(x, w, None),
                                (x, w), (True, False))
    return shard_over_batch(_conv2d_same_cv, (x, w, b), (True, False, False))


# --- channel-first-output variant for tiny Cout (the unets' final conv) ---------------
#
# A bf16[b,H,W,3] HBM buffer is lane-padded 3 -> 128 (T(8,128) tiling): writing
# the final conv's output costs 43x its logical bytes, and XLA's conv emitter
# for tiny Cout is additionally ~6x off the input-read roofline (measured
# 7.7 ms at (2,1024,1024,128)->3 where the 537 MB input streams in 0.7 ms; even
# a 1x1 Dense to 3 channels takes 3.6 ms). This variant accumulates TRANSPOSED
# — acc[(cout, rows)] = sum_taps W[tap]^T @ x_win — so the output is emitted
# (b, Cout, H, W): W rides the lanes (dense, no pad) and Cout pads only
# 3 -> 8 sublanes. The caller moveaxis(1, -1)'s the result; the sampler math
# consumes it in XLA-chosen dense layouts either way.

def _kernel_cf(x_ref, w_ref, b_ref, o_ref, xs_ref, sem, *, k, hb, W, cin,
               num_h):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    p = k // 2
    cout = w_ref.shape[3]

    xs_ref[...] = jnp.zeros_like(xs_ref)

    def dma(row0, nrows, dst0):
        cp = pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(row0, nrows), :, :],
            xs_ref.at[pl.ds(dst0, nrows), pl.ds(8, W), :],
            sem)
        cp.start()
        cp.wait()

    H = num_h * hb
    if num_h == 1:
        dma(0, H, p)
    else:
        @pl.when(hi == 0)
        def _():
            dma(0, hb + p, p)

        @pl.when(hi == num_h - 1)
        def _():
            dma(H - (hb + p), hb + p, 0)

        @pl.when(jnp.logical_and(hi > 0, hi < num_h - 1))
        def _():
            dma(hi * hb - p, hb + 2 * p, 0)

    acc = jnp.broadcast_to(
        b_ref[:, :1].astype(jnp.float32), (cout, hb * W))
    for dy in range(k):
        for dx in range(k):
            c0 = 8 - p + dx
            xwin = xs_ref[dy:dy + hb, c0:c0 + W, :]
            # (cin, cout)^T contraction against (rows, cin) -> (cout, rows)
            acc = acc + jax.lax.dot_general(
                w_ref[dy, dx], xwin.reshape(hb * W, cin),
                (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(cout, hb, W).astype(o_ref.dtype)


def conv2d_same_cf_available(x_shape, w_shape, dtype):
    """Gate for the channel-first-output variant: tiny-Cout convs at large
    spatial (the final conv / non-padded stem class)."""
    if os.environ.get('IMAGEN_TPU_DISABLE_PALLAS'):
        return False
    if not _INTERPRET and jax.default_backend() != 'tpu':
        return False
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    b, H, W, cin = x_shape
    kh, kw, wcin, cout = w_shape
    if kh != kw or kh % 2 == 0 or wcin != cin:
        return False
    if cin % 128 != 0 or W % 128 != 0 or H % 8 != 0:
        return False
    if cout > 8 or H * W < 256 * 256:
        return False
    return _pick_blocks_cf(H, W, cin, cout, kh, dtype_itemsize(dtype)) is not None


def dtype_itemsize(dtype):
    return jnp.dtype(dtype).itemsize


def _pick_blocks_cf(H, W, cin, cout, k, dtype_bytes):
    p = k // 2
    for hb in (32, 16, 8, 4, 2, 1):
        if hb > H or H % hb:
            continue
        scratch = (hb + 2 * p) * (W + 16) * cin * dtype_bytes
        # each tap's loaded+reshaped (hb*W, cin) window materializes in VMEM
        xwin_tmp = 2 * hb * W * cin * dtype_bytes
        acc = max(cout, 8) * hb * W * 4
        out = 2 * max(cout, 8) * hb * W * dtype_bytes
        w_all = 2 * k * k * cin * max(cout, 128) * dtype_bytes
        if (scratch + xwin_tmp + acc + out + w_all <= _VMEM_BUDGET
                and hb * W >= 512):
            return hb
    return None


def _forward_cf(x, w, b, interpret=False):
    bsz, H, W, cin = x.shape
    k, _, _, cout = w.shape
    p = k // 2
    hb = _pick_blocks_cf(H, W, cin, cout, k, x.dtype.itemsize)
    num_h = H // hb

    w = w.astype(x.dtype)
    b = (b if b is not None else jnp.zeros((cout,), x.dtype)).astype(x.dtype)
    b = jnp.broadcast_to(b.reshape(cout, 1), (cout, 8))  # 2D, sublane-tiled

    return pl.pallas_call(
        functools.partial(_kernel_cf, k=k, hb=hb, W=W, cin=cin, num_h=num_h),
        out_shape=jax.ShapeDtypeStruct((bsz, cout, H, W), x.dtype),
        grid=(bsz, num_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, k, cin, cout), lambda bb, hh: (0, 0, 0, 0)),
            pl.BlockSpec((cout, 8), lambda bb, hh: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, cout, hb, W), lambda bb, hh: (bb, 0, hh, 0)),
        scratch_shapes=[
            pltpu.VMEM((hb + 2 * p, W + 16, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
    )(x, w, b)


def _xla_reference_cf(x, w, b):
    return jnp.moveaxis(_xla_reference(x, w, b), -1, 1)


@jax.custom_vjp
def _conv2d_same_cf_cv(x, w, b):
    return _forward_cf(x, w, b, interpret=_INTERPRET)


def _fwd_cf(x, w, b):
    return _conv2d_same_cf_cv(x, w, b), (x, w, b)


def _bwd_cf(residuals, g):
    x, w, b = residuals
    _, vjp = jax.vjp(_xla_reference_cf, x, w, b)
    return vjp(g)


_conv2d_same_cf_cv.defvjp(_fwd_cf, _bwd_cf)


def conv2d_same_cf(x, w, b):
    """Stride-1 SAME conv, NHWC input -> CHANNEL-FIRST (b, Cout, H, W) output.

    For tiny Cout at large spatial, where the NHWC output would be lane-padded
    Cout -> 128 in HBM. Call only when `conv2d_same_cf_available` is True.
    shard_map'd over the image-batch axis under an active kernel mesh (see
    conv2d_same)."""
    from imagen_tpu.parallel.kernel_sharding import shard_over_batch
    if b is None:
        return shard_over_batch(lambda x, w: _conv2d_same_cf_cv(x, w, None),
                                (x, w), (True, False))
    return shard_over_batch(_conv2d_same_cf_cv, (x, w, b),
                            (True, False, False))
