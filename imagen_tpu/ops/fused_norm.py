"""Pallas fused ChanRMSNorm + FiLM + SiLU (the ResnetBlock inner-loop prologue).

The reference's Block runs norm -> (scale+1)*x + shift -> SiLU -> 3x3 conv
(imagen_pytorch.py:683-691); SURVEY.md §7 names this chain as a kernel-layer fusion
target. One Pallas pass computes

    y = silu( l2norm_c(x) * sqrt(C) * gamma * (scale + 1) + shift )

per pixel row, so the normalized intermediate never hits HBM. Backward recomputes
through the XLA reference implementation.

MEASURED (v5e, b16 x 64x64x128 bf16): XLA 0.91ms vs this kernel 1.36ms — XLA's own
fusion already wins on this elementwise+reduce chain, so the model blocks keep the
XLA path and this kernel stays as a reference implementation (SURVEY.md §7 listed it
as a candidate fusion; the measurement says don't).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, gamma_ref, scale_ref, shift_ref, o_ref, *, dim):
    x = x_ref[0].astype(jnp.float32)                    # (rows, C)
    gamma = gamma_ref[0].astype(jnp.float32)            # (1, C) -> broadcast
    scale = scale_ref[0, 0].astype(jnp.float32)
    shift = shift_ref[0, 0].astype(jnp.float32)

    inv = jax.lax.rsqrt(jnp.maximum(
        jnp.sum(x * x, axis=-1, keepdims=True), 1e-24))
    normed = x * inv * (dim ** 0.5) * gamma
    filmed = normed * (scale + 1.0) + shift
    o_ref[0] = (filmed * jax.nn.sigmoid(filmed)).astype(o_ref.dtype)


def _xla_reference(x, gamma, scale, shift):
    """Same math via XLA (used for backward + fallback)."""
    xf = x.astype(jnp.float32)
    dim = x.shape[-1]
    inv = jax.lax.rsqrt(jnp.maximum(
        jnp.sum(xf * xf, axis=-1, keepdims=True), 1e-24))
    normed = xf * inv * (dim ** 0.5) * gamma.astype(jnp.float32)
    filmed = normed * (scale.astype(jnp.float32) + 1.0) + shift.astype(jnp.float32)
    return (filmed * jax.nn.sigmoid(filmed)).astype(x.dtype)


def _forward(x, gamma, scale, shift, block_rows=256, interpret=False):
    """x: (b, h, w, C); gamma: (C,); scale/shift: (b, C)."""
    b, h, w, c = x.shape
    rows = h * w
    x_r = x.reshape(b, rows, c)

    block_rows = min(block_rows, rows)
    if (rows % block_rows != 0
            or (not interpret and jax.default_backend() != 'tpu')):
        return _xla_reference(
            x, gamma, scale[:, None, None, :], shift[:, None, None, :])

    grid = (b, rows // block_rows)
    out = pl.pallas_call(
        functools.partial(_kernel, dim=c),
        out_shape=jax.ShapeDtypeStruct((b, rows, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_rows, c), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, c), lambda bb, i: (0, 0)),
            pl.BlockSpec((1, 1, c), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda bb, i: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_rows, c), lambda bb, i: (bb, i, 0)),
        interpret=interpret,
    )(x_r, gamma.reshape(1, c), scale.reshape(b, 1, c), shift.reshape(b, 1, c))
    return out.reshape(b, h, w, c)


@jax.custom_vjp
def fused_film_norm(x, gamma, scale, shift):
    """Fused ChanRMSNorm+FiLM+SiLU. x (b,h,w,C), gamma (C,), scale/shift (b,C)."""
    return _forward(x, gamma, scale, shift)


def _fwd(x, gamma, scale, shift):
    return _forward(x, gamma, scale, shift), (x, gamma, scale, shift)


def _bwd(residuals, g):
    x, gamma, scale, shift = residuals
    _, vjp = jax.vjp(
        lambda x_, g_, s_, sh_: _xla_reference(
            x_, g_, s_[:, None, None, :], sh_[:, None, None, :]),
        x, gamma, scale, shift)
    return vjp(g)


fused_film_norm.defvjp(_fwd, _bwd)


# --- fused LayerNorm ------------------------------------------------------------------
#
# One Pallas pass: read each row tile once, fp32 stats in VMEM, write normalized.
#
# MEASURED (v5e, flagship base-64 unet): the kernel itself is fast (~4.7 us per
# call vs XLA's ~273 GB/s convert+reduce passes), but wiring it into the
# LayerNorm module was NET NEUTRAL end-to-end — the pallas_call boundary breaks
# XLA's fusion of the norm into neighboring ops and adds layout copies
# (step time 9.34 ms unchanged, 'copy' category 0.27 -> 0.61 ms). Like
# fused_film_norm above, it stays here as a measured reference; the wired win
# is `fused_feedforward` below, which swallows the norms into the matmul chain
# so no norm<->matmul boundary exists at all.

def _ln_kernel(x_ref, g_ref, o_ref, *, stable, eps):
    x = x_ref[...].astype(jnp.float32)                  # (rows, C)
    if stable:
        x = x / jnp.max(x, axis=-1, keepdims=True)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    o_ref[...] = (y * g_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _ln_xla(x, g, stable, eps):
    """Reference-semantics LayerNorm via XLA (backward + fallback);
    mirrors models.blocks.LayerNorm exactly."""
    dtype = x.dtype
    if stable:
        x = x / jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
    var = jnp.var(x, axis=-1, keepdims=True)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps).astype(dtype) * g.astype(dtype)


def _pick_rows_block(rows, c):
    # fp32 row tile + output under a conservative VMEM share
    budget = 4 * 1024 * 1024
    for br in (1024, 512, 256, 128, 64, 32, 16, 8):
        if rows % br == 0 and br * c * 4 <= budget:
            return br
    return None


def _ln_forward(x, g, stable, eps, interpret=False):
    c = x.shape[-1]
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    block_rows = _pick_rows_block(rows, c)
    if (block_rows is None or c % 128 != 0
            or (not interpret and jax.default_backend() != 'tpu')):
        return _ln_xla(x, g, stable, eps)
    x_r = x.reshape(rows, c)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, stable=stable, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        interpret=interpret,
    )(x_r, g.reshape(1, c))
    return out.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_layernorm(x, g, stable, eps):
    """Bias-free LayerNorm (optional amax stabilization), fused single HBM pass."""
    return _ln_forward(x, g, stable, eps)


def _ln_fwd(x, g, stable, eps):
    return _ln_forward(x, g, stable, eps), (x, g)


def _ln_bwd(stable, eps, residuals, ct):
    x, g = residuals
    _, vjp = jax.vjp(lambda x_, g_: _ln_xla(x_, g_, stable, eps), x, g)
    return vjp(ct)


fused_layernorm.defvjp(_ln_fwd, _ln_bwd)


# --- fused FeedForward ----------------------------------------------------------------
#
# The transformer FeedForward (reference imagen_pytorch.py:972-980) is
# LayerNorm -> Dense -> GELU -> LayerNorm -> Dense. XLA runs it as ~5 separate
# HBM passes over the (rows, dim)/(rows, hidden) activations (both LayerNorms'
# cross-lane stat reductions measured at ~273 GB/s on v5e). Both weight matrices
# fit VMEM at unet transformer widths, so one Pallas program per row-block runs
# the whole chain out of VMEM: x is read exactly once and the output written
# exactly once. Backward recomputes through the XLA reference chain (the fused
# forward stores no intermediates — flash-attention-style rematerialization).

def _ln_f32(x, g, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * g


def _erf_f32(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7 — below bf16 ulp);
    Mosaic has no erf/erfc lowering."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1. / (1. + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1. - poly * jnp.exp(-a * a))


def _ff_kernel(x_ref, g0_ref, w0_ref, g1_ref, w1_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)                       # (bm, K)
    h = _ln_f32(x, g0_ref[...].astype(jnp.float32), eps)
    h = jax.lax.dot_general(
        h.astype(w0_ref.dtype), w0_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # round to the activation dtype between ops, matching the module chain;
    # exact-gelu via the polynomial erf (no Mosaic erf lowering)
    h = h.astype(o_ref.dtype).astype(jnp.float32)
    h = 0.5 * h * (1. + _erf_f32(h * (2. ** -0.5)))
    h = _ln_f32(h.astype(o_ref.dtype).astype(jnp.float32),
                g1_ref[...].astype(jnp.float32), eps)
    o_ref[...] = jax.lax.dot_general(
        h.astype(w1_ref.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _ff_xla(x, g0, w0, g1, w1, eps):
    """Module-equivalent chain (backward + fallback); mirrors
    models.blocks.FeedForward with stable=False LayerNorms."""
    def ln(t, g):
        var = jnp.var(t, axis=-1, keepdims=True)
        mean = jnp.mean(t, axis=-1, keepdims=True)
        return (t - mean) * jax.lax.rsqrt(var + eps).astype(t.dtype) * g.astype(t.dtype)

    h = ln(x, g0)
    h = (h @ w0.astype(h.dtype)).astype(x.dtype)
    h = jax.nn.gelu(h, approximate=False)
    h = ln(h, g1)
    return (h @ w1.astype(h.dtype)).astype(x.dtype)


_FF_WEIGHT_BUDGET = 4 * 1024 * 1024


def _ff_rows_block(rows, k, hid):
    budget = 6 * 1024 * 1024   # fp32 row tile + hidden tile
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if rows % bm == 0 and bm * (k + hid) * 4 <= budget:
            return bm
    return None


def fused_feedforward_available(rows, k, hid, dtype):
    import os
    if os.environ.get('IMAGEN_TPU_DISABLE_PALLAS'):
        return False  # see flash_attention.flash_attention_available
    itemsize = jnp.dtype(dtype).itemsize
    return (jax.default_backend() == 'tpu'
            and k % 128 == 0 and hid % 128 == 0
            and 2 * k * hid * itemsize <= _FF_WEIGHT_BUDGET
            and _ff_rows_block(rows, k, hid) is not None)


def _ff_forward(x, g0, w0, g1, w1, eps, interpret=False):
    shape = x.shape
    k, hid = w0.shape
    rows = 1
    for s in shape[:-1]:
        rows *= s
    bm = _ff_rows_block(rows, k, hid)
    if bm is None or (not interpret and jax.default_backend() != 'tpu'):
        return _ff_xla(x, g0, w0, g1, w1, eps)
    x_r = x.reshape(rows, k)
    w0c = w0.astype(x.dtype)
    w1c = w1.astype(x.dtype)
    out = pl.pallas_call(
        functools.partial(_ff_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rows, k), x.dtype),
        grid=(rows // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((k, hid), lambda i: (0, 0)),
            pl.BlockSpec((1, hid), lambda i: (0, 0)),
            pl.BlockSpec((hid, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, k), lambda i: (i, 0)),
        interpret=interpret,
    )(x_r, g0.reshape(1, k), w0c, g1.reshape(1, hid), w1c)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_feedforward_cv(x, g0, w0, g1, w1, eps):
    return _ff_forward(x, g0, w0, g1, w1, eps)


def _ff_fwd(x, g0, w0, g1, w1, eps):
    return _ff_forward(x, g0, w0, g1, w1, eps), (x, g0, w0, g1, w1)


def _ff_bwd(eps, residuals, ct):
    x, g0, w0, g1, w1 = residuals
    _, vjp = jax.vjp(
        lambda *a: _ff_xla(*a, eps), x, g0, w0, g1, w1)
    return vjp(ct)


_fused_feedforward_cv.defvjp(_ff_fwd, _ff_bwd)


def fused_feedforward(x, g0, w0, g1, w1, eps):
    """LayerNorm -> Dense -> GELU -> LayerNorm -> Dense in one VMEM-resident
    pass. Under an active kernel mesh (parallel.kernel_sharding) the call
    shard_maps over x's leading (batch) axis — weights replicated, weight
    cotangents psum'd across the axis by shard_map's transpose rule."""
    from imagen_tpu.parallel.kernel_sharding import shard_over_batch
    return shard_over_batch(
        lambda x, g0, w0, g1, w1: _fused_feedforward_cv(x, g0, w0, g1, w1, eps),
        (x, g0, w0, g1, w1), (True, False, False, False, False))


# --- fused LayerNorm->matmul and matmul->LayerNorm --------------------------------------
#
# NEGATIVE RESULT — kept as a documented reference, NOT wired into the model
# (like fused_film_norm above). Fusing the attention pre-norm into the q/kv
# projection and the out-projection into the out-norm measured ~5% SLOWER
# end-to-end on the v5e base-64 sampler (115.5 -> 121.5 steps/s when unwired,
# round 2): XLA's own norm+matmul fusion emits better code at these shapes,
# and the kernel's per-block fp32 LN recompute wastes VPU time. The transformer
# FeedForward fusion (fused_feedforward above) by contrast measured +2.5
# steps/s and stays wired. Same availability rules and XLA-recompute backward
# as fused_feedforward.

def _lnmm_kernel(x_ref, g_ref, w_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    h = _ln_f32(x, g_ref[...].astype(jnp.float32), eps)
    o_ref[...] = jax.lax.dot_general(
        h.astype(w_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _mmln_kernel(x_ref, w_ref, g_ref, o_ref, *, eps):
    h = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = h.astype(o_ref.dtype).astype(jnp.float32)  # round as the module chain does
    o_ref[...] = _ln_f32(h, g_ref[...].astype(jnp.float32), eps).astype(o_ref.dtype)


def _lnmm_xla(x, g, w, eps):
    var = jnp.var(x, axis=-1, keepdims=True)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + eps).astype(x.dtype) * g.astype(x.dtype)
    return (h @ w.astype(h.dtype)).astype(x.dtype)


def _mmln_xla(x, w, g, eps):
    h = (x @ w.astype(x.dtype)).astype(x.dtype)
    var = jnp.var(h, axis=-1, keepdims=True)
    mean = jnp.mean(h, axis=-1, keepdims=True)
    return (h - mean) * jax.lax.rsqrt(var + eps).astype(h.dtype) * g.astype(h.dtype)


def fused_lnmm_available(rows, k, n, dtype):
    import os
    if os.environ.get('IMAGEN_TPU_DISABLE_PALLAS'):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    return (jax.default_backend() == 'tpu'
            and k % 128 == 0 and n % 128 == 0
            and k * n * itemsize <= _FF_WEIGHT_BUDGET
            and _ff_rows_block(rows, k, n) is not None)


def _pallas_rowblock_call(kern, args, specs, rows, bm, n, dtype, interpret):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, n), dtype),
        grid=(rows // bm,),
        in_specs=specs,
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        interpret=interpret,
    )(*args)


def _lnmm_forward(x, g, w, eps, interpret=False):
    shape = x.shape
    k, n = w.shape
    rows = 1
    for s in shape[:-1]:
        rows *= s
    bm = _ff_rows_block(rows, k, n)
    if bm is None or (not interpret and jax.default_backend() != 'tpu'):
        return _lnmm_xla(x, g, w, eps)
    out = _pallas_rowblock_call(
        functools.partial(_lnmm_kernel, eps=eps),
        [x.reshape(rows, k), g.reshape(1, k), w.astype(x.dtype)],
        [pl.BlockSpec((bm, k), lambda i: (i, 0)),
         pl.BlockSpec((1, k), lambda i: (0, 0)),
         pl.BlockSpec((k, n), lambda i: (0, 0))],
        rows, bm, n, x.dtype, interpret)
    return out.reshape(*shape[:-1], n)


def _mmln_forward(x, w, g, eps, interpret=False):
    shape = x.shape
    k, n = w.shape
    rows = 1
    for s in shape[:-1]:
        rows *= s
    bm = _ff_rows_block(rows, k, n)
    if bm is None or (not interpret and jax.default_backend() != 'tpu'):
        return _mmln_xla(x, w, g, eps)
    out = _pallas_rowblock_call(
        functools.partial(_mmln_kernel, eps=eps),
        [x.reshape(rows, k), w.astype(x.dtype), g.reshape(1, n)],
        [pl.BlockSpec((bm, k), lambda i: (i, 0)),
         pl.BlockSpec((k, n), lambda i: (0, 0)),
         pl.BlockSpec((1, n), lambda i: (0, 0))],
        rows, bm, n, x.dtype, interpret)
    return out.reshape(*shape[:-1], n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_ln_matmul(x, g, w, eps):
    """LayerNorm (bias-free, stable=False) -> matmul, one VMEM-resident pass."""
    return _lnmm_forward(x, g, w, eps)


def _lnmm_fwd(x, g, w, eps):
    return _lnmm_forward(x, g, w, eps), (x, g, w)


def _lnmm_bwd(eps, residuals, ct):
    x, g, w = residuals
    _, vjp = jax.vjp(lambda *a: _lnmm_xla(*a, eps), x, g, w)
    return vjp(ct)


fused_ln_matmul.defvjp(_lnmm_fwd, _lnmm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_matmul_ln(x, w, g, eps):
    """matmul -> LayerNorm (bias-free, stable=False), one VMEM-resident pass."""
    return _mmln_forward(x, w, g, eps)


def _mmln_fwd(x, w, g, eps):
    return _mmln_forward(x, w, g, eps), (x, w, g)


def _mmln_bwd(eps, residuals, ct):
    x, w, g = residuals
    _, vjp = jax.vjp(lambda *a: _mmln_xla(*a, eps), x, w, g)
    return vjp(ct)


fused_matmul_ln.defvjp(_mmln_fwd, _mmln_bwd)
