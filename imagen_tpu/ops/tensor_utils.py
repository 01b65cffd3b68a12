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
