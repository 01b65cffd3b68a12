"""Pallas fused LayerNorm + time-centric relayout for the video temporal path.

The wired `TemporalAttention` path (models/video_blocks.py) brackets the
per-pixel frame attention with two standalone HBM relayouts —
(b f h w c) -> ((b h w) f c) and back — and runs its c=64 LayerNorm stats at
~92 GB/s (half-empty 128-lane registers; BENCH.md video profile: relayouts
11.3% + norm stats 8.4% of the clip). The round-5 einsum-projection attempt
refuted moving the relayout into the PROJECTION matmuls (the permuted
epilogue slows the 8x-larger inner-dim writes; receipts in
tools/microbench_video_layout.py). These kernels attack the same two items
the opposite way — fuse the norm INTO the relayout pass, one HBM round trip
where the wired path pays two, with the fp32 stats computed on the
VMEM-resident tile:

  fused_ln_transpose(x, g, eps):  (b, f, h, w, c) -> ((b h w), f, c)
      LayerNorm over c (models/blocks.LayerNorm semantics, stable=False)
      fused with the fold-to-time-centric transpose.
  fused_norm_untranspose(out, res, g, eps): ((b h w), f, c) [+ res] ->
      (b, f, h, w, c) — the VideoAttention zero-init out-norm
      (imagen_video.py:496-497 semantics) fused with the unfold transpose
      and the temporal-residual add.

Backward recomputes through the XLA reference chain (same pattern as
ops/fused_norm.py) so grads follow the module math exactly.

Wiring: opt-in via IMAGEN_TPU_TEMPORAL_FUSED_LN=1 (models/video_blocks.py),
DEFAULT OFF by measurement (round 5, v5e): isolated chained-pair timing wins
at c>=128 (1.30x/1.06x) but the c=64 full-res class loses 0.85x at the
CFG-doubled b=2 the sampler runs, and with the c>=128 gate the end-to-end
video clip is a wash (+-0.3% over two A/B pairs) — receipts in
tools/microbench_temporal_layout.py and BENCH.md's video section.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INTERPRET = False  # tests flip via monkeypatch to run on CPU


# --- forward kernels --------------------------------------------------------------------

def _ln_t_kernel(x_ref, g_ref, o_ref, *, eps):
    x = x_ref[0].astype(jnp.float32)                    # (f, hwb, c)
    g = g_ref[0].astype(jnp.float32)                    # (1, c)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * g
    o_ref[0] = jnp.swapaxes(y, 0, 1).astype(o_ref.dtype)   # (hwb, f, c)


def _norm_ut_kernel(o_in_ref, res_ref, g_ref, y_ref, *, eps, add_res):
    o = o_in_ref[0].astype(jnp.float32)                 # (hwb, f, c)
    g = g_ref[0].astype(jnp.float32)                    # (1, c)
    mean = jnp.mean(o, axis=-1, keepdims=True)
    oc = o - mean
    var = jnp.mean(oc * oc, axis=-1, keepdims=True)
    y = oc * jax.lax.rsqrt(var + eps) * g
    y = jnp.swapaxes(y, 0, 1)                           # (f, hwb, c)
    if add_res:
        y = y + res_ref[0].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)


# --- XLA references (backward + fallback) ------------------------------------------------

def _ln_like(x, g, eps):
    """models/blocks.LayerNorm (stable=False) / VideoAttention out-norm math."""
    dtype = x.dtype
    var = jnp.var(x, axis=-1, keepdims=True)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps).astype(dtype) * g.astype(dtype)


def _ln_t_xla(x, g, eps):
    b, f, h, w, c = x.shape
    xt = jnp.reshape(jnp.transpose(x, (0, 2, 3, 1, 4)), (b * h * w, f, c))
    return _ln_like(xt, g, eps)


def _norm_ut_xla(out, res, g, eps):
    b, f, h, w, c = res.shape
    y = _ln_like(out, g, eps)
    y = jnp.transpose(jnp.reshape(y, (b, h, w, f, c)), (0, 3, 1, 2, 4))
    return y + res


# --- tiling -----------------------------------------------------------------------------

def _pick_hw_block(hw, f, c):
    # fp32 working tile (in + out) under a conservative VMEM share; the
    # kernel holds ~4 fp32 copies of the tile on the Mosaic stack (cast,
    # centered, normed, swapped) so the effective multiplier is ~2x this
    # in+out estimate — 4 MB here measured safe, 8 MB OOMs scoped vmem at
    # (hw=1024, c=128)
    budget = 4 * 1024 * 1024
    for blk in (512, 256, 128, 64, 32, 16, 8):
        if hw % blk == 0 and 2 * blk * f * max(c, 128) * 4 <= budget:
            return blk
    return None


def available(x_shape, interpret=False):
    """Gate: 5D NFHWC with a valid tiling on the TPU backend, c >= 128.

    c=64 (half-empty 128-lane registers) measured BOTH ways at the video
    hot shapes (tools/microbench_temporal_layout.py, v5e): fused pair wins
    1.27x at b=1 but LOSES 0.85x at the CFG-doubled b=2 the sampler
    actually runs — while c=128/256 win at both batch sizes (1.30x/1.06x).
    Gate to the shape class that wins unconditionally.
    """
    if len(x_shape) != 5:
        return False
    if not (interpret or _INTERPRET) and jax.default_backend() != 'tpu':
        return False
    b, f, h, w, c = x_shape
    if c < 128 and not (interpret or _INTERPRET):
        return False
    return _pick_hw_block(h * w, f, c) is not None


# --- public ops -------------------------------------------------------------------------

def _ln_t_forward(x, g, eps, interpret=False):
    b, f, h, w, c = x.shape
    hw = h * w
    blk = _pick_hw_block(hw, f, c)
    if blk is None or not (interpret or _INTERPRET
                           or jax.default_backend() == 'tpu'):
        return _ln_t_xla(x, g, eps)
    x_r = x.reshape(b, f, hw, c)
    out = pl.pallas_call(
        functools.partial(_ln_t_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, hw, f, c), x.dtype),
        grid=(b, hw // blk),
        in_specs=[
            pl.BlockSpec((1, f, blk, c), lambda bb, i: (bb, 0, i, 0)),
            pl.BlockSpec((1, c), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk, f, c), lambda bb, i: (bb, i, 0, 0)),
        interpret=interpret or _INTERPRET,
    )(x_r, g.reshape(1, c))
    return out.reshape(b * hw, f, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_ln_transpose(x, g, eps):
    """LayerNorm over c fused with (b f h w c) -> ((b h w) f c).

    `eps` must be a Python float (static): the kernel bakes it in as a
    compile-time constant — a traced eps would be captured by the Pallas
    closure and rejected at lowering.
    """
    return _ln_t_forward(x, g, eps)


def _ln_t_fwd(x, g, eps):
    return _ln_t_forward(x, g, eps), (x, g)


def _ln_t_bwd(eps, residuals, ct):
    x, g = residuals
    _, vjp = jax.vjp(lambda x_, g_: _ln_t_xla(x_, g_, eps), x, g)
    dx, dg = vjp(ct)
    return dx, dg


fused_ln_transpose.defvjp(_ln_t_fwd, _ln_t_bwd)


def _norm_ut_forward(out, res, g, eps, interpret=False):
    b, f, h, w, c = res.shape
    hw = h * w
    blk = _pick_hw_block(hw, f, c)
    if blk is None or not (interpret or _INTERPRET
                           or jax.default_backend() == 'tpu'):
        return _norm_ut_xla(out, res, g, eps)
    out_r = out.reshape(b, hw, f, c)
    res_r = res.reshape(b, f, hw, c)
    y = pl.pallas_call(
        functools.partial(_norm_ut_kernel, eps=eps, add_res=True),
        out_shape=jax.ShapeDtypeStruct((b, f, hw, c), res.dtype),
        grid=(b, hw // blk),
        in_specs=[
            pl.BlockSpec((1, blk, f, c), lambda bb, i: (bb, i, 0, 0)),
            pl.BlockSpec((1, f, blk, c), lambda bb, i: (bb, 0, i, 0)),
            pl.BlockSpec((1, c), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, f, blk, c), lambda bb, i: (bb, 0, i, 0)),
        interpret=interpret or _INTERPRET,
    )(out_r, res_r, g.reshape(1, c))
    return y.reshape(b, f, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_norm_untranspose(out, res, g, eps):
    """Out-norm fused with ((b h w) f c) -> (b f h w c) + residual add.

    `eps` must be a Python float (static) — see fused_ln_transpose.
    """
    return _norm_ut_forward(out, res, g, eps)


def _norm_ut_fwd(out, res, g, eps):
    return _norm_ut_forward(out, res, g, eps), (out, res, g)


def _norm_ut_bwd(eps, residuals, ct):
    out, res, g = residuals
    _, vjp = jax.vjp(
        lambda o_, r_, g_: _norm_ut_xla(o_, r_, g_, eps), out, res, g)
    do, dr, dg = vjp(ct)
    return do, dr, dg


fused_norm_untranspose.defvjp(_norm_ut_fwd, _norm_ut_bwd)
