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

# Minimum query length for the flash path to pay off (below this the sim matrix is
# tiny and XLA's fused path is faster to compile and run).
FLASH_MIN_SEQ = 1024

_NEG_INF = -1e30


def _l2norm_scale(x, gain, eps=1e-12):
    """Row l2-normalize (+ learned per-dim gain) in fp32 — the cosine-sim attention
    prologue (reference imagen_pytorch.py:566-570) fused into the kernel so the
    normalized q/k never round-trip HBM."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.maximum(jnp.sum(xf * xf, axis=-1, keepdims=True), eps))
    out = xf * inv
    if gain is not None:
        out = out * gain
    return out.astype(x.dtype)


def _flash_mqa_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, nk, block_k,
                      fuse_l2norm, q_scale_ref=None, k_scale_ref=None):
    """One (batch*head, i-block) program: stream key blocks with online softmax.

    Matmuls keep their input dtype (bf16 runs the MXU at full rate) and accumulate
    fp32 via preferred_element_type; softmax statistics stay fp32.
    """
    q = q_ref[0]                                      # (bi, d), input dtype
    if fuse_l2norm:
        q = _l2norm_scale(q, q_scale_ref[0].astype(jnp.float32))
    bi = q.shape[0]
    d = q.shape[1]
    nk_pad = k_ref.shape[1]
    num_kb = nk_pad // block_k

    has_padding = nk != nk_pad

    def process(jb, carry, masked):
        acc, m, l = carry
        kblk = k_ref[0, pl.ds(jb * block_k, block_k), :]
        if fuse_l2norm:
            kblk = _l2norm_scale(kblk, k_scale_ref[0].astype(jnp.float32))
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


def _flash_mqa_forward(q, k, v, scale, block_q=256, block_k=512, interpret=False,
                       q_scale=None, k_scale=None):
    """q_scale/k_scale given => fuse the cosine-sim l2norm+gain into the kernel."""
    b, h, n, d = q.shape
    nk = k.shape[1]
    fuse = q_scale is not None

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

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
        pl.BlockSpec((1, nk_pad, d), lambda bh, i, _h=h: (bh // _h, 0, 0)),
        pl.BlockSpec((1, nk_pad, d), lambda bh, i, _h=h: (bh // _h, 0, 0)),
    ]
    args = [q_r, k, v]

    if fuse:
        in_specs += [
            pl.BlockSpec((1, d), lambda bh, i: (0, 0)),
            pl.BlockSpec((1, d), lambda bh, i: (0, 0)),
        ]
        args += [q_scale.reshape(1, d), k_scale.reshape(1, d)]

        def kernel(q_ref, k_ref, v_ref, qs_ref, ks_ref, o_ref):
            _flash_mqa_kernel(
                q_ref, k_ref, v_ref, o_ref, scale=scale, nk=nk, block_k=block_k,
                fuse_l2norm=True, q_scale_ref=qs_ref, k_scale_ref=ks_ref)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref):
            _flash_mqa_kernel(
                q_ref, k_ref, v_ref, o_ref, scale=scale, nk=nk, block_k=block_k,
                fuse_l2norm=False)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
        interpret=interpret,
    )(*args)

    return out.reshape(b, h, n, d)


def _naive_mqa(q, k, v, scale):
    """Reference-semantics attention (fp32 softmax) used for the backward pass."""
    sim = jnp.einsum('bhid,bjd->bhij', q, k) * scale
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(sim.dtype)
    return jnp.einsum('bhij,bjd->bhid', attn, v)


def _xla_l2norm_scale(t, gain):
    tf = t.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.maximum(
        jnp.sum(tf * tf, axis=-1, keepdims=True), 1e-12))
    return (tf * inv * gain).astype(t.dtype)


def _naive_cosine_mqa(q, k, v, q_scale, k_scale, scale):
    return _naive_mqa(
        _xla_l2norm_scale(q, q_scale), _xla_l2norm_scale(k, k_scale), v, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_multiquery_attention(q, k, v, scale):
    """Flash multi-query attention over pre-normalized q/k: q (b,h,n,d), k/v (b,nk,d)."""
    return _flash_mqa_forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _flash_mqa_forward(q, k, v, scale), (q, k, v)


def _bwd(scale, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _naive_mqa(q_, k_, v_, scale), q, k, v)
    return vjp(g)


flash_multiquery_attention.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_cosine_mqa(q, k, v, q_scale, k_scale, scale):
    """Fused cosine-sim flash attention: raw q/k + learned per-dim gains; the
    l2norm+gain prologue runs inside the kernel."""
    return _flash_mqa_forward(q, k, v, scale, q_scale=q_scale, k_scale=k_scale)


def _cos_fwd(q, k, v, q_scale, k_scale, scale):
    out = _flash_mqa_forward(q, k, v, scale, q_scale=q_scale, k_scale=k_scale)
    return out, (q, k, v, q_scale, k_scale)


def _cos_bwd(scale, residuals, g):
    q, k, v, q_scale, k_scale = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_, qs_, ks_: _naive_cosine_mqa(q_, k_, v_, qs_, ks_, scale),
        q, k, v, q_scale, k_scale)
    return vjp(g)


flash_cosine_mqa.defvjp(_cos_fwd, _cos_bwd)


def flash_attention_available(q_len, dim_head, has_mask, has_bias):
    """Heuristic gate for routing through the flash kernel."""
    if has_mask or has_bias:
        return False
    if q_len < FLASH_MIN_SEQ:
        return False
    if dim_head > 128:
        return False
    return jax.default_backend() == 'tpu'
