"""Tensor-level helper ops, pure jnp functions.

Capability parity with the reference's tensor helpers
(/root/reference/imagen_pytorch/imagen_pytorch.py:126-207), designed TPU-first:

- Everything is a pure function of arrays (+ explicit PRNG keys) so it can live inside a
  single jitted program. The reference's implicit-RNG helpers (`prob_mask_like`,
  `torch.randn_like`) take explicit `jax.random` keys here.
- Image layout is NHWC (TPU conv-native), not the reference's NCHW.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from imagen_tpu.utils.helpers import exists


def log(t, eps: float = 1e-12):
    """Stable log; reference imagen_pytorch.py:129-130."""
    return jnp.log(jnp.clip(t, min=eps))


def l2norm(t, axis: int = -1, eps: float = 1e-12):
    """F.normalize equivalent; reference imagen_pytorch.py:132-133."""
    denom = jnp.clip(jnp.linalg.norm(t, axis=axis, keepdims=True), min=eps)
    return t / denom


def right_pad_dims_to(x, t):
    """Right-pad `t`'s shape with singleton dims to match x.ndim.

    Reference imagen_pytorch.py:135-139.
    """
    padding_dims = x.ndim - t.ndim
    if padding_dims <= 0:
        return t
    return t.reshape(*t.shape, *((1,) * padding_dims))


def masked_mean(t, *, axis, mask=None):
    """Mean over `axis`, ignoring positions where mask is False.

    Reference imagen_pytorch.py:141-150. `t` is (b, n, d), mask (b, n).
    """
    if not exists(mask):
        return jnp.mean(t, axis=axis)

    denom = jnp.sum(mask, axis=axis, keepdims=True)
    mask_b = mask[..., None]
    masked_t = jnp.where(mask_b, t, 0.)

    return jnp.sum(masked_t, axis=axis) / jnp.clip(denom, min=1e-5)


def resize_image_to(image, target_image_size, clamp_range=None, method='nearest'):
    """Resize an NHWC image batch to a square target size.

    Reference imagen_pytorch.py:152-168 (F.interpolate, default nearest).
    `jax.image.resize` with static output shape keeps this jit-compatible.
    """
    orig_image_size = image.shape[-2]  # H of NHWC

    if orig_image_size == target_image_size:
        return image

    b, h, w, c = image.shape
    out = jax.image.resize(
        image,
        (b, target_image_size, target_image_size, c),
        method=method,
    )

    if exists(clamp_range):
        out = jnp.clip(out, clamp_range[0], clamp_range[1])

    return out


def cast_uint8_images_to_float(images):
    """uint8 [0,255] -> float [0,1]; reference imagen_pytorch.py:93-96."""
    if images.dtype != jnp.uint8:
        return images
    return images.astype(jnp.float32) / 255


def normalize_neg_one_to_one(img):
    """[0,1] -> [-1,1]; reference imagen_pytorch.py:193-194."""
    return img * 2 - 1


def unnormalize_zero_to_one(normed_img):
    """[-1,1] -> [0,1]; reference imagen_pytorch.py:196-197."""
    return (normed_img + 1) * 0.5


def prob_mask_like(key, shape, prob):
    """Bernoulli keep-mask for classifier-free-guidance dropout.

    Reference imagen_pytorch.py:200-207, with an explicit PRNG key. `prob` may be a
    python float (static branches preserved for jit specialization).
    """
    if prob == 1:
        return jnp.ones(shape, dtype=bool)
    elif prob == 0:
        return jnp.zeros(shape, dtype=bool)
    return jax.random.uniform(key, shape) < prob


def nonneg_order_stats(flat, lo):
    """Exact ascending order statistics (x_(lo), x_(lo+1)) per row of a
    NON-NEGATIVE fp32 (b, n) array, via radix select.

    Non-negative IEEE floats compare identically to their uint32 bit patterns,
    so a 32-step binary search over the bit prefix — each step one fused
    compare+count pass — recovers the exact k-th order statistic. Replaces
    `lax.top_k` in the dynamic-thresholding percentile (reference
    imagen_pytorch.py:2096-2101): at SR-1024 shapes top_k over the 3.1M-pixel
    tail was 18.5% of the whole sample (44 ms/step on v5e); the 32 counting
    passes are ~1 ms. Results are bit-identical to the sort-based path.

    `lo` is a static python int with 0 <= lo < n-1; x_(lo+1) falls back to
    x_(lo) when duplicates already cover rank lo+1.
    """
    bits = jax.lax.bitcast_convert_type(flat.astype(jnp.float32), jnp.uint32)
    b = bits.shape[0]

    def body(i, cand):
        trial = cand | (jnp.uint32(1) << (jnp.uint32(31) - i.astype(jnp.uint32)))
        cnt = jnp.sum((bits < trial[:, None]).astype(jnp.int32), axis=-1)
        return jnp.where(cnt <= lo, trial, cand)

    v_lo_bits = jax.lax.fori_loop(0, 32, body, jnp.zeros((b,), jnp.uint32))

    # rank lo+1: equal to x_(lo) when duplicates cover it, else the smallest
    # strictly-larger element (one extra masked-min pass)
    cnt_le = jnp.sum((bits <= v_lo_bits[:, None]).astype(jnp.int32), axis=-1)
    above_min = jnp.min(
        jnp.where(bits > v_lo_bits[:, None], bits, jnp.uint32(0xFFFFFFFF)),
        axis=-1)
    v_hi_bits = jnp.where(cnt_le > lo + 1, v_lo_bits, above_min)

    v_lo = jax.lax.bitcast_convert_type(v_lo_bits, jnp.float32)
    v_hi = jax.lax.bitcast_convert_type(v_hi_bits, jnp.float32)
    return v_lo, v_hi
