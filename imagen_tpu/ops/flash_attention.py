"""Pallas TPU flash attention for the unet's multi-query attention.

The reference materializes the full (b, h, i, j) similarity matrix
(imagen_pytorch.py:565,583) — at SR-stage resolutions the flattened-pixel sequence is
64^2..256^2 tokens, so that matrix dominates HBM traffic. This kernel computes the
same cosine-sim multi-query attention with online (streaming) softmax over key
blocks: the (bi, bj) similarity tile lives only in VMEM, accumulators are fp32.

Layout (multi-query, reference imagen_pytorch.py:522):
    q: (b, h, n, d)   — queries per head
    k: (b, nk, d)     — single shared KV head
    v: (b, nk, d)
q/k are already l2-normalized + learned-scaled by the caller (the cosine-sim quirk
stays outside the kernel; it is elementwise and XLA fuses it into the producers).

Backward: custom VJP recomputes the naive attention under jax.vjp — grads are exact;
training memory matches the reference (flash backward kernel is future work). The
forward (sampling hot loop, where all the benchmark time goes) never materializes sims.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Minimum query length for the flash path to pay off (below this the sim matrix is
# tiny and XLA's fused path is faster to compile and run).
FLASH_MIN_SEQ = 1024

_NEG_INF = -1e30


def _flash_mqa_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, nk, block_k):
    """One (batch*head, i-block) program: stream key blocks with online softmax.

    Matmuls keep their input dtype (bf16 runs the MXU at full rate) and accumulate
    fp32 via preferred_element_type; softmax statistics stay fp32.
    """
    q = q_ref[0]                                      # (bi, d), input dtype
    bi = q.shape[0]
    d = q.shape[1]
    nk_pad = k_ref.shape[1]
    num_kb = nk_pad // block_k

    has_padding = nk != nk_pad

    def process(jb, carry, masked):
        acc, m, l = carry
        kblk = k_ref[0, pl.ds(jb * block_k, block_k), :]
        vblk = v_ref[0, pl.ds(jb * block_k, block_k), :]

        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (bi, bj) fp32

        if masked:  # only the final block can contain padding (keys >= nk)
            col = jb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bi, block_k), 1)
            s = jnp.where(col < nk, s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bi, d), jnp.float32)
    m0 = jnp.full((bi, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bi, 1), jnp.float32)
    carry = jax.lax.fori_loop(
        0, num_kb - 1, lambda jb, c: process(jb, c, masked=False),
        (acc0, m0, l0))
    acc, m, l = process(num_kb - 1, carry, masked=has_padding)

    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _flash_mqa_forward(q, k, v, scale, block_q=256, block_k=512, interpret=False):
    b, h, n, d = q.shape
    nk = k.shape[1]

    block_q = min(block_q, n)
    block_k = min(block_k, _round_up(nk, 128))
    assert n % block_q == 0, f'query length {n} must divide block_q {block_q}'

    nk_pad = _round_up(nk, block_k)
    if nk_pad != nk:
        pad = ((0, 0), (0, nk_pad - nk), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    q_r = q.reshape(b * h, n, d)
    grid = (b * h, n // block_q)

    out = pl.pallas_call(
        functools.partial(_flash_mqa_kernel, scale=scale, nk=nk, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, nk_pad, d), lambda bh, i, _h=h: (bh // _h, 0, 0)),
            pl.BlockSpec((1, nk_pad, d), lambda bh, i, _h=h: (bh // _h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
        interpret=interpret,
    )(q_r, k, v)

    return out.reshape(b, h, n, d)


def _naive_mqa(q, k, v, scale):
    """Reference-semantics attention (fp32 softmax) used for the backward pass."""
    sim = jnp.einsum('bhid,bjd->bhij', q, k) * scale
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(sim.dtype)
    return jnp.einsum('bhij,bjd->bhid', attn, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_multiquery_attention(q, k, v, scale):
    """Flash multi-query attention: q (b,h,n,d), k/v (b,nk,d)."""
    return _flash_mqa_forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _flash_mqa_forward(q, k, v, scale), (q, k, v)


def _bwd(scale, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _naive_mqa(q_, k_, v_, scale), q, k, v)
    return vjp(g)


flash_multiquery_attention.defvjp(_fwd, _bwd)


def flash_attention_available(q_len, dim_head, has_mask, has_bias):
    """Heuristic gate for routing through the flash kernel."""
    if has_mask or has_bias:
        return False
    if q_len < FLASH_MIN_SEQ:
        return False
    if dim_head > 128:
        return False
    return jax.default_backend() == 'tpu'
