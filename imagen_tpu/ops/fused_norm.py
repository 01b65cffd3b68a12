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
