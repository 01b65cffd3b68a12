"""Attention cores as pure functions (XLA path).

These implement the reference's attention quirks exactly (SURVEY.md §2.1):
- cosine-sim attention: q/k l2-normalized then scaled by learned per-dim scales and a
  fixed scale (default 8)  — reference imagen_pytorch.py:510-513,566-570
- fp32 softmax island      — reference imagen_pytorch.py:583,829
- learned null KV token prepended for classifier-free guidance — reference :545-547,807-809
- multi-query attention (single KV head broadcast over query heads) — reference :522,588

A Pallas flash-attention kernel (imagen_tpu.ops.flash_attention) provides the fused path
for long flattened-pixel sequences; these XLA versions are the reference semantics and the
fallback. XLA already fuses the mask/bias/scale elementwise chain into the softmax.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from imagen_tpu.utils.helpers import exists


def _masked_softmax_fp32(sim, mask=None, null_tokens: int = 0):
    """Softmax in fp32 with optional key-padding mask.

    `mask` is (b, j_orig) boolean over the *original* context tokens; `null_tokens`
    leading keys (null KV and/or text tokens already accounted by caller) are always
    attended (reference pads mask with True at imagen_pytorch.py:576-579).
    """
    dtype = sim.dtype
    if exists(mask):
        if null_tokens > 0:
            mask = jnp.pad(mask, ((0, 0), (null_tokens, 0)), constant_values=True)
        max_neg = -jnp.finfo(dtype).max
        mask_b = mask[:, None, None, :]  # b 1 1 j
        sim = jnp.where(mask_b, sim, max_neg)
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
    return attn.astype(dtype)


def multiquery_attention(q, k, v, *, scale, mask=None, attn_bias=None, null_tokens=0,
                         q_scale=None, k_scale=None):
    """Multi-query attention: q is (b, h, i, d); k, v are (b, j, d).

    Mirrors the einsum pair at reference imagen_pytorch.py:565,588. When
    `q_scale`/`k_scale` are given, q/k arrive RAW and the cosine-sim
    l2norm+learned-gain prologue (reference :566-570) is applied here — fused into
    the Pallas flash kernel on the long-sequence route, so normalized q/k never
    round-trip HBM; on the XLA route it is ordinary fused elementwise code.
    """
    from imagen_tpu.ops.flash_attention import (
        flash_attention_available, flash_cosine_mqa, flash_multiquery_attention)
    from imagen_tpu.ops.tensor_utils import l2norm

    cosine = exists(q_scale)

    if flash_attention_available(q.shape[-2], q.shape[-1],
                                 exists(mask), exists(attn_bias)):
        if cosine:
            return flash_cosine_mqa(q, k, v, q_scale, k_scale, scale)
        return flash_multiquery_attention(q, k, v, scale)

    if cosine:
        q = l2norm(q) * q_scale.astype(q.dtype)
        k = l2norm(k) * k_scale.astype(k.dtype)

    sim = jnp.einsum('bhid,bjd->bhij', q, k) * scale
    if exists(attn_bias):
        sim = sim + attn_bias
    attn = _masked_softmax_fp32(sim, mask, null_tokens)
    out = jnp.einsum('bhij,bjd->bhid', attn, v)
    return out


def multiquery_attention_packed(q, k, v, heads, *, scale, mask=None,
                                attn_bias=None, null_tokens=0, q_scale=None,
                                k_scale=None):
    """multiquery_attention over HEAD-PACKED queries: q is (b, n, h*d) exactly as
    the q-projection emits it; k, v are (b, j, d). Returns (b, n, h*d).

    On the flash route the packed layout reshapes (for free — contiguous memory)
    to the kernel's rows layout (b, n*h, d), so the `b n (h d) <-> b h n d` head
    transposes — real HBM relayout passes, ~6% of round-2 sampler device time —
    never happen. The XLA fallback performs them internally (it computes on
    (b, h, i, d) like the reference einsums)."""
    from imagen_tpu.ops.flash_attention import (
        flash_attention_available, flash_cosine_mqa_rows, flash_mqa_rows)

    b, n, hd = q.shape
    d = hd // heads
    if flash_attention_available(n, d, exists(mask), exists(attn_bias),
                                 heads=heads):
        # NB: a packed-I/O variant that lane-slices heads in-kernel (avoiding
        # the rows retile, like the video grouped kernel) measured SLOWER here
        # (118.9 vs 122.1 steps/s): Mosaic keeps each unrolled head's sim tile
        # live, forcing 128-pixel blocks whose small matmuls cost more than
        # the retile saves at nk~1.2k. The retile stays.
        q_rows = q.reshape(b, n * heads, d)
        if exists(q_scale):
            out = flash_cosine_mqa_rows(q_rows, k, v, q_scale, k_scale, scale)
        else:
            out = flash_mqa_rows(q_rows, k, v, scale)
        return out.reshape(b, n, hd)

    q4 = q.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
    out = multiquery_attention(q4, k, v, scale=scale, mask=mask,
                               attn_bias=attn_bias, null_tokens=null_tokens,
                               q_scale=q_scale, k_scale=k_scale)
    return out.transpose(0, 2, 1, 3).reshape(b, n, hd)


def multihead_attention(q, k, v, *, scale, mask=None, attn_bias=None, null_tokens=0):
    """Full multi-head attention: q, k, v are (b, h, n, d).

    Mirrors reference imagen_pytorch.py:818-833 (CrossAttention).
    """
    sim = jnp.einsum('bhid,bhjd->bhij', q, k) * scale
    if exists(attn_bias):
        sim = sim + attn_bias
    attn = _masked_softmax_fp32(sim, mask, null_tokens)
    out = jnp.einsum('bhij,bhjd->bhid', attn, v)
    return out


def kernelized_linear_attention(q, k, v, *, scale):
    """softmax(q, -1) . softmax(k, -2) linear attention.

    q, k, v are (b*, n, d) with heads folded into batch;
    mirrors reference imagen_pytorch.py:864-872 / :934-939.
    """
    q = jax.nn.softmax(q, axis=-1)
    k = jax.nn.softmax(k, axis=-2)
    q = q * scale
    ctx = jnp.einsum('bnd,bne->bde', k, v)
    out = jnp.einsum('bnd,bde->bne', q, ctx)
    return out
