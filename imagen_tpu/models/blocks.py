"""Neural building blocks (flax.linen, NHWC layout).

Capability parity with the reference block layer
(/root/reference/imagen_pytorch/imagen_pytorch.py:320-1110), redesigned TPU-first:

- **NHWC everywhere.** The reference is NCHW; on TPU channels-last is the native conv
  layout, and it collapses the reference's "Chan*" module family: a 1x1 conv is a Dense on
  the trailing axis (XLA lowers it straight onto the MXU), ChanLayerNorm == LayerNorm,
  ChanFeedForward == FeedForward. One implementation serves both token and fmap paths.
- Pure functional modules; dropout takes a `deterministic` flag + 'dropout' rng.
- fp32 softmax islands and the cosine-sim attention quirks live in
  `imagen_tpu.ops.attention` (cited there); modules here only build q/k/v.
- Param dtype stays fp32; activations follow `dtype` (bf16 for TPU training).
"""
from __future__ import annotations

import math
import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange, repeat
from jax.ad_checkpoint import checkpoint_name

from imagen_tpu.ops.attention import (
    kernelized_linear_attention,
    multihead_attention,
    multiquery_attention_packed,
)
from imagen_tpu.ops.tensor_utils import l2norm, masked_mean, resize_image_to
from imagen_tpu.utils.helpers import cast_tuple, default, exists

Dtype = Any


# --- norms ------------------------------------------------------------------------------

class LayerNorm(nn.Module):
    """Bias-free LayerNorm with optional amax-stabilization.

    Reference imagen_pytorch.py:331-349: stable variant divides by detached amax first;
    eps switches 1e-5 (fp32) / 1e-3 (half). Serves as ChanLayerNorm too (NHWC trailing
    axis == channel, reference :351).
    """
    stable: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_fold=False):
        dtype = x.dtype
        g = self.param('g', nn.initializers.ones, (x.shape[-1],), jnp.float32)

        if time_fold:
            # fused LN + (b f h w c) -> ((b h w) f c) relayout in one Pallas
            # pass (ops/temporal_layout.py); math identical to this module
            # followed by the rearrange. Video temporal path only.
            assert x.ndim == 5 and not self.stable
            from imagen_tpu.ops.temporal_layout import fused_ln_transpose
            eps = 1e-5 if dtype == jnp.float32 else 1e-3
            return fused_ln_transpose(x, g, eps)

        if self.stable:
            x = x / jax.lax.stop_gradient(
                jnp.max(x, axis=-1, keepdims=True))

        eps = 1e-5 if dtype == jnp.float32 else 1e-3
        var = jnp.var(x, axis=-1, keepdims=True)
        mean = jnp.mean(x, axis=-1, keepdims=True)

        return (x - mean) * jax.lax.rsqrt(var + eps).astype(dtype) * g.astype(dtype)


class ChanRMSNorm(nn.Module):
    """Channel RMSNorm; reference imagen_pytorch.py:322-329 (NHWC: trailing axis).

    With `scale_shift`/`fuse_silu`, also applies the FiLM + SiLU that always
    follow it in Block — and, under `IMAGEN_TPU_FUSED_FILM=1`, routes the whole
    norm→FiLM→SiLU chain through one Pallas pass (ops/fused_norm.py). Param
    tree ('gamma') is identical either way."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None, fuse_silu=False):
        dim = x.shape[-1]
        gamma = self.param('gamma', nn.initializers.ones, (dim,), jnp.float32)
        if (fuse_silu and x.ndim == 4 and dim % 128 == 0
                and os.environ.get('IMAGEN_TPU_FUSED_FILM', '0') == '1'):
            # dim%128: at c=64 (video dim-64 blocks) the fused kernel WEDGES
            # the v5e — the bench warmup dispatches and the first device sync
            # never returns (reproduced twice, round 5); c>=128 shapes run
            # fine (SR A/B: 10.20 -> 11.93 s/img, refuted on merit instead)
            from imagen_tpu.ops.fused_norm import fused_film_norm
            b = x.shape[0]
            if scale_shift is not None:
                scale, shift = scale_shift
                scale = scale.reshape(b, dim)
                shift = shift.reshape(b, dim)
            else:
                scale = jnp.zeros((b, dim), x.dtype)
                shift = jnp.zeros((b, dim), x.dtype)
            return fused_film_norm(x, gamma, scale, shift)
        out = l2norm(x, axis=-1) * (dim ** 0.5) * gamma.astype(x.dtype)
        if scale_shift is not None:
            scale, shift = scale_shift
            out = out * (scale + 1) + shift
        if fuse_silu:
            out = jax.nn.silu(out)
        return out


class TorchLayerNorm(nn.Module):
    """Standard LayerNorm with scale+bias (torch nn.LayerNorm, eps 1e-5); used by
    PerceiverAttention norms and to_context projections (reference :392-393,524)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


# --- feedforward ------------------------------------------------------------------------

class _ParamOnly(nn.Module):
    """Named scope holding one param — lets a module keep the param tree of a
    submodule chain while routing compute through a fused kernel."""
    shape: Tuple[int, ...]
    init: Any
    pname: str = 'kernel'

    @nn.compact
    def __call__(self):
        return self.param(self.pname, self.init, self.shape)


class FeedForward(nn.Module):
    """LayerNorm -> Dense -> GELU -> LayerNorm -> Dense, no biases.

    Reference imagen_pytorch.py:972-980; in NHWC it is also ChanFeedForward (:982-990)
    since 1x1 convs are trailing-axis Denses.

    On TPU the whole chain runs as one Pallas program per row block
    (`ops.fused_norm.fused_feedforward`): both weight matrices stay VMEM-resident,
    x is read once and the output written once — XLA runs the same chain as ~5
    HBM passes with slow cross-lane LayerNorm stat reductions. Param tree is
    identical on both routes.
    """
    mult: float = 2.
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from imagen_tpu.ops.fused_norm import (
            fused_feedforward, fused_feedforward_available)

        dim = x.shape[-1]
        hidden_dim = int(dim * self.mult)

        rows = 1
        for s in x.shape[:-1]:
            rows *= s
        x_c = x.astype(self.dtype)
        if fused_feedforward_available(rows, dim, hidden_dim, self.dtype):
            ones = nn.initializers.ones
            lecun = nn.initializers.lecun_normal()
            g0 = _ParamOnly((dim,), ones, 'g', name='LayerNorm_0')()
            w0 = _ParamOnly((dim, hidden_dim), lecun, name='Dense_0')()
            g1 = _ParamOnly((hidden_dim,), ones, 'g', name='LayerNorm_1')()
            w1 = _ParamOnly((hidden_dim, dim), lecun, name='Dense_1')()
            eps = 1e-5 if self.dtype == jnp.float32 else 1e-3
            return fused_feedforward(x_c, g0, w0, g1, w1, eps)

        x = LayerNorm(dtype=self.dtype)(x)
        x = nn.Dense(hidden_dim, use_bias=False, dtype=self.dtype)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = LayerNorm(dtype=self.dtype)(x)
        x = nn.Dense(dim, use_bias=False, dtype=self.dtype)(x)
        return x


ChanFeedForward = FeedForward  # NHWC equivalence, see FeedForward docstring


# --- time embeddings --------------------------------------------------------------------

class SinusoidalPosEmb(nn.Module):
    """reference imagen_pytorch.py:642-652."""
    dim: int

    @nn.compact
    def __call__(self, x):
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim) * -emb)
        emb = x[:, None] * emb[None, :]
        return jnp.concatenate((jnp.sin(emb), jnp.cos(emb)), axis=-1)


class LearnedSinusoidalPosEmb(nn.Module):
    """Learned random-fourier time embedding w/ raw t concat;
    reference imagen_pytorch.py:654-669."""
    dim: int

    @nn.compact
    def __call__(self, x):
        assert (self.dim % 2) == 0
        half_dim = self.dim // 2
        weights = self.param('weights', nn.initializers.normal(1.0), (half_dim,), jnp.float32)
        x = x[:, None]
        freqs = x * weights[None, :] * 2 * math.pi
        fouriered = jnp.concatenate((jnp.sin(freqs), jnp.cos(freqs)), axis=-1)
        fouriered = jnp.concatenate((x, fouriered), axis=-1)
        return fouriered


# --- attention --------------------------------------------------------------------------

class Attention(nn.Module):
    """Multi-query self attention with null KV and optional extra context tokens.

    Reference imagen_pytorch.py:502-591: single-head KV broadcast over query heads
    (:522), learned null KV (:520,545-547), optional text context tokens prepended to
    K/V (:527,551-555), cosine-sim QK with learned per-dim scales and fixed scale 8
    (:510-513,566-570), fp32 softmax (:583).
    """
    dim_head: int = 64
    heads: int = 8
    context_dim: Optional[int] = None
    scale: float = 8.
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None, attn_bias=None):
        b = x.shape[0]
        dim = x.shape[-1]
        inner_dim = self.dim_head * self.heads

        # plain module path: fusing the pre-norm into the q/kv projection with a
        # Pallas kernel (ops.fused_norm.fused_ln_matmul) measured ~5% SLOWER
        # end-to-end on v5e — XLA's own norm+matmul fusion wins here, as with
        # fused_film_norm (see BENCH.md kernel table)
        x = LayerNorm(dtype=self.dtype)(x)
        q = nn.Dense(inner_dim, use_bias=False, dtype=self.dtype, name='to_q')(x)
        kv = nn.Dense(self.dim_head * 2, use_bias=False, dtype=self.dtype,
                      name='to_kv')(x)
        k, v = jnp.split(kv, 2, axis=-1)

        # null key/value for classifier-free guidance
        null_kv = self.param('null_kv', nn.initializers.normal(1.0),
                             (2, self.dim_head), jnp.float32)
        nk = repeat(null_kv[0].astype(k.dtype), 'd -> b 1 d', b=b)
        nv = repeat(null_kv[1].astype(v.dtype), 'd -> b 1 d', b=b)
        k = jnp.concatenate((nk, k), axis=-2)
        v = jnp.concatenate((nv, v), axis=-2)

        num_prepended = 1
        if exists(context):
            assert exists(self.context_dim)
            ctx = TorchLayerNorm(dtype=self.dtype, name='ctx_norm')(context)
            ckv = nn.Dense(self.dim_head * 2, dtype=self.dtype, name='to_context')(ctx)
            ck, cv = jnp.split(ckv, 2, axis=-1)
            k = jnp.concatenate((ck, k), axis=-2)
            v = jnp.concatenate((cv, v), axis=-2)
            num_prepended += ck.shape[-2]

        # cosine-sim QK with learned per-dim scales (applied inside
        # multiquery_attention — fused into the flash kernel on the long route)
        q_scale = self.param('q_scale', nn.initializers.ones, (self.dim_head,), jnp.float32)
        k_scale = self.param('k_scale', nn.initializers.ones, (self.dim_head,), jnp.float32)

        out = multiquery_attention_packed(
            q, k, v, self.heads, scale=self.scale, mask=mask,
            attn_bias=attn_bias, null_tokens=num_prepended,
            q_scale=q_scale, k_scale=k_scale)

        out = nn.Dense(dim, use_bias=False, dtype=self.dtype, name='to_out')(out)
        return LayerNorm(dtype=self.dtype, name='out_norm')(out)


class CrossAttention(nn.Module):
    """Full multi-head cross-attention over conditioning tokens.

    Reference imagen_pytorch.py:759-834. `linear` switches to the kernelized
    LinearCrossAttention forward (:836-874) over identical parameters.
    """
    context_dim: Optional[int] = None
    dim_head: int = 64
    heads: int = 8
    norm_context: bool = False
    scale: float = 8.
    linear: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, mask=None):
        b = x.shape[0]
        dim = x.shape[-1]
        inner_dim = self.dim_head * self.heads

        if self.norm_context:
            context = LayerNorm(dtype=self.dtype, name='norm_context')(context)

        # plain module path — see Attention for the fused_ln_matmul negative result
        x = LayerNorm(dtype=self.dtype)(x)
        q = nn.Dense(inner_dim, use_bias=False, dtype=self.dtype, name='to_q')(x)
        kv = nn.Dense(inner_dim * 2, use_bias=False, dtype=self.dtype, name='to_kv')(context)
        k, v = jnp.split(kv, 2, axis=-1)

        null_kv = self.param('null_kv', nn.initializers.normal(1.0),
                             (2, self.dim_head), jnp.float32)

        if not self.linear:
            q, k, v = map(
                lambda t: rearrange(t, 'b n (h d) -> b h n d', h=self.heads), (q, k, v))

            nk = repeat(null_kv[0].astype(k.dtype), 'd -> b h 1 d', b=b, h=self.heads)
            nv = repeat(null_kv[1].astype(v.dtype), 'd -> b h 1 d', b=b, h=self.heads)
            k = jnp.concatenate((nk, k), axis=-2)
            v = jnp.concatenate((nv, v), axis=-2)

            q_scale = self.param('q_scale', nn.initializers.ones, (self.dim_head,), jnp.float32)
            k_scale = self.param('k_scale', nn.initializers.ones, (self.dim_head,), jnp.float32)
            q = l2norm(q) * q_scale.astype(q.dtype)
            k = l2norm(k) * k_scale.astype(k.dtype)

            out = multihead_attention(
                q, k, v, scale=self.scale, mask=mask, null_tokens=1)
            out = rearrange(out, 'b h n d -> b n (h d)')
        else:
            # LinearCrossAttention forward (reference :836-874); heads folded into batch.
            # NB: the reference's linear variant allocates q_scale/k_scale (inherited
            # params) but does not use them; we simply don't allocate them here.
            q, k, v = map(
                lambda t: rearrange(t, 'b n (h d) -> (b h) n d', h=self.heads), (q, k, v))
            nk = repeat(null_kv[0].astype(k.dtype), 'd -> b 1 d', b=b * self.heads)
            nv = repeat(null_kv[1].astype(v.dtype), 'd -> b 1 d', b=b * self.heads)
            k = jnp.concatenate((nk, k), axis=-2)
            v = jnp.concatenate((nv, v), axis=-2)

            if exists(mask):
                mask_p = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)
                mask_p = repeat(mask_p, 'b n -> (b h) n 1', h=self.heads)
                max_neg = -jnp.finfo(x.dtype).max
                k = jnp.where(mask_p, k, max_neg)
                v = jnp.where(mask_p, v, 0.)

            out = kernelized_linear_attention(q, k, v, scale=self.scale)
            out = rearrange(out, '(b h) n d -> b n (h d)', h=self.heads)

        out = nn.Dense(dim, use_bias=False, dtype=self.dtype, name='to_out')(out)
        return LayerNorm(dtype=self.dtype, name='out_norm')(out)


class LinearAttention(nn.Module):
    """Spatial linear attention on fmaps (Primer-style conv q/k/v with depthwise 3x3).

    Reference imagen_pytorch.py:876-943. Operates on NHWC fmaps directly.
    """
    dim_head: int = 32
    heads: int = 8
    dropout: float = 0.05
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fmap, context=None, *, deterministic: bool = True):
        h = self.heads
        x, y = fmap.shape[1], fmap.shape[2]
        dim = fmap.shape[-1]
        inner_dim = self.dim_head * self.heads
        scale = self.dim_head ** -0.5

        fmap = LayerNorm(dtype=self.dtype)(fmap)

        def to_qkv(name):
            t = nn.Dropout(self.dropout, deterministic=deterministic)(fmap)
            t = nn.Dense(inner_dim, use_bias=False, dtype=self.dtype,
                         name=f'{name}_proj')(t)
            t = nn.Conv(inner_dim, (3, 3), use_bias=False, padding='SAME',
                        feature_group_count=inner_dim, dtype=self.dtype,
                        name=f'{name}_dw')(t)
            return t

        q, k, v = to_qkv('to_q'), to_qkv('to_k'), to_qkv('to_v')
        q, k, v = map(
            lambda t: rearrange(t, 'b x y (h c) -> (b h) (x y) c', h=h), (q, k, v))

        if exists(context):
            assert exists(self.context_dim)
            ctx = TorchLayerNorm(dtype=self.dtype, name='ctx_norm')(context)
            ckv = nn.Dense(inner_dim * 2, use_bias=False, dtype=self.dtype,
                           name='to_context')(ctx)
            ck, cv = jnp.split(ckv, 2, axis=-1)
            ck, cv = map(
                lambda t: rearrange(t, 'b n (h d) -> (b h) n d', h=h), (ck, cv))
            k = jnp.concatenate((k, ck), axis=-2)
            v = jnp.concatenate((v, cv), axis=-2)

        out = kernelized_linear_attention(q, k, v, scale=scale)
        out = rearrange(out, '(b h) (x y) d -> b x y (h d)', h=h, x=x, y=y)

        out = jax.nn.silu(out)
        out = nn.Dense(dim, use_bias=False, dtype=self.dtype, name='to_out')(out)
        return LayerNorm(dtype=self.dtype, name='out_norm')(out)


class GlobalContext(nn.Module):
    """Squeeze-excite-like gating: softmax spatial pool -> bottleneck MLP -> sigmoid.

    Reference imagen_pytorch.py:945-970. Returns a (b, 1, 1, dim_out) gate.
    """
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        context = nn.Dense(1, dtype=self.dtype, name='to_k')(x)      # b h w 1
        x_flat = rearrange(x, 'b h w c -> b (h w) c')
        ctx_flat = rearrange(context, 'b h w c -> b (h w) c')
        attn = jax.nn.softmax(ctx_flat, axis=-2)                      # over spatial
        pooled = jnp.einsum('bni,bnc->bic', attn, x_flat)             # b 1 c
        pooled = pooled[:, :, None, :]                                # b 1 1 c
        hidden_dim = max(3, self.dim_out // 2)
        out = nn.Dense(hidden_dim, dtype=self.dtype)(pooled)
        out = jax.nn.silu(out)
        out = nn.Dense(self.dim_out, dtype=self.dtype)(out)
        return jax.nn.sigmoid(out)


# --- resnet -----------------------------------------------------------------------------

class SameConv3x3(nn.Module):
    """`nn.Conv(features, (3, 3), padding='SAME')` with a Pallas fast path.

    Param tree, init, and dtype promotion are IDENTICAL to nn.Conv (kernel
    (3, 3, cin, cout) lecun-normal, bias (cout,) zeros), so checkpoints and
    the torch weight-port are unaffected. Dispatches to the halo-DMA kernel
    (ops/conv2d.py) only on its measured >=1.0x win surface — the SR
    pre-downsampled big-channel shapes; everything else (incl. all base-64
    shapes) stays on XLA's conv emitter. `IMAGEN_TPU_PALLAS_CONV=0` disables.
    """
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)

        from imagen_tpu.ops import conv2d as _c2d
        if _c2d.conv2d_same_available(x.shape, kernel.shape, x.dtype):
            return _c2d.conv2d_same(x, kernel, bias)
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + bias


class Block(nn.Module):
    """ChanRMSNorm -> (FiLM scale/shift) -> SiLU -> 3x3 conv;
    reference imagen_pytorch.py:671-691."""
    dim_out: int
    norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None):
        if self.norm:
            # norm+FiLM+SiLU in one call — identical math to the separate
            # steps; IMAGEN_TPU_FUSED_FILM=1 additionally fuses the chain
            # into one Pallas pass (A/B flag, see ChanRMSNorm)
            x = ChanRMSNorm(dtype=self.dtype)(
                x, scale_shift=scale_shift, fuse_silu=True)
        else:
            if exists(scale_shift):
                scale, shift = scale_shift
                x = x * (scale + 1) + shift
            x = jax.nn.silu(x)
        x = SameConv3x3(self.dim_out, dtype=self.dtype, name='project')(x)
        # named for the selective-remat policy (unet2d remat='save_convs'):
        # the 3x3 convs are the FLOPs — save their outputs, recompute the
        # cheap norm/FiLM/SiLU prologue. Identity outside jax.checkpoint.
        return checkpoint_name(x, 'conv_out')


class ResnetBlock(nn.Module):
    """Time-FiLM'd double conv block with optional cross-attn and GlobalContext gate.

    Reference imagen_pytorch.py:693-757.
    """
    dim_out: int
    cond_dim: Optional[int] = None
    time_cond_dim: Optional[int] = None
    linear_attn: bool = False
    use_gca: bool = False
    squeeze_excite: bool = False  # accepted for config parity (reference ignores it too)
    attn_dim_head: int = 64
    attn_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None, cond=None):
        dim = x.shape[-1]

        scale_shift = None
        if exists(self.time_cond_dim) and exists(time_emb):
            t = jax.nn.silu(time_emb)
            t = nn.Dense(self.dim_out * 2, dtype=self.dtype, name='time_mlp')(t)
            t = rearrange(t, 'b c -> b 1 1 c')
            scale_shift = jnp.split(t, 2, axis=-1)

        h = Block(self.dim_out, dtype=self.dtype, name='block1')(x)

        if exists(self.cond_dim):
            assert exists(cond)
            hh, ww = h.shape[1], h.shape[2]
            h_flat = rearrange(h, 'b x y c -> b (x y) c')
            h_flat = CrossAttention(
                context_dim=self.cond_dim,
                linear=self.linear_attn,
                dim_head=self.attn_dim_head,
                heads=self.attn_heads,
                dtype=self.dtype,
                name='cross_attn',
            )(h_flat, context=cond) + h_flat
            h_flat = checkpoint_name(h_flat, 'attn_out')
            h = rearrange(h_flat, 'b (x y) c -> b x y c', x=hh, y=ww)

        h = Block(self.dim_out, dtype=self.dtype, name='block2')(h, scale_shift=scale_shift)

        if self.use_gca:
            h = h * GlobalContext(dim_out=self.dim_out, dtype=self.dtype, name='gca')(h)

        if dim != self.dim_out:
            x = nn.Dense(self.dim_out, dtype=self.dtype, name='res_conv')(x)
        return h + x


# --- transformer blocks ------------------------------------------------------------------

class TransformerBlock(nn.Module):
    """Flatten fmap to tokens, run depth x (multi-query attn + FF) residual layers.

    Reference imagen_pytorch.py:992-1022.
    """
    depth: int = 1
    heads: int = 8
    dim_head: int = 32
    ff_mult: float = 2.
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        hh, ww = x.shape[1], x.shape[2]
        x = rearrange(x, 'b x y c -> b (x y) c')
        for i in range(self.depth):
            x = checkpoint_name(Attention(
                heads=self.heads, dim_head=self.dim_head,
                context_dim=self.context_dim, dtype=self.dtype,
                name=f'attn_{i}')(x, context=context) + x, 'attn_out')
            x = checkpoint_name(
                FeedForward(mult=self.ff_mult, dtype=self.dtype,
                            name=f'ff_{i}')(x) + x, 'ff_out')
        return rearrange(x, 'b (x y) c -> b x y c', x=hh, y=ww)


class LinearAttentionTransformerBlock(nn.Module):
    """depth x (spatial LinearAttention + ChanFeedForward) residual layers on NHWC fmaps.

    Reference imagen_pytorch.py:1024-1049.
    """
    depth: int = 1
    heads: int = 8
    dim_head: int = 32
    ff_mult: float = 2.
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, deterministic: bool = True):
        for i in range(self.depth):
            x = LinearAttention(
                heads=self.heads, dim_head=self.dim_head,
                context_dim=self.context_dim, dtype=self.dtype,
                name=f'attn_{i}')(x, context=context, deterministic=deterministic) + x
            x = ChanFeedForward(mult=self.ff_mult, dtype=self.dtype, name=f'ff_{i}')(x) + x
        return x


# --- resolution changers -----------------------------------------------------------------

class Upsample(nn.Module):
    """Nearest x2 + 3x3 conv; reference imagen_pytorch.py:595-601."""
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method='nearest')
        return nn.Conv(self.dim_out, (3, 3), padding='SAME', dtype=self.dtype)(x)


def _pixelshuffle_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform sampled at dim_out then replicated x4 across the shuffle groups
    to kill checkerboard artifacts; reference imagen_pytorch.py:621-628."""
    kh, kw, fan_in_c, out4 = shape
    out = out4 // 4
    fan_in = kh * kw * fan_in_c
    bound = math.sqrt(6.0 / fan_in)
    w = jax.random.uniform(key, (kh, kw, fan_in_c, out), dtype, -bound, bound)
    return jnp.repeat(w, 4, axis=-1)  # out index = o*4 + rep, matches (c s1 s2) grouping


class _ShuffleConvParams(nn.Module):
    """Parameter-holder scope so the resolution changers keep the param tree of
    their original 1x1-conv formulations while computing with an equivalent
    strided (transposed) conv — see PixelShuffleUpsample/Downsample."""
    kernel_shape: Tuple[int, ...]
    bias_shape: Tuple[int, ...]
    kernel_init: Any = None

    @nn.compact
    def __call__(self):
        kernel_init = self.kernel_init or nn.initializers.lecun_normal()
        return (self.param('kernel', kernel_init, self.kernel_shape),
                self.param('bias', nn.initializers.zeros, self.bias_shape))


class PixelShuffleUpsample(nn.Module):
    """1x1 conv -> SiLU -> pixel shuffle x2; reference imagen_pytorch.py:603-631.

    Computed as the mathematically identical stride-2 transposed 2x2 conv (+ SiLU,
    which commutes with the shuffle's pure permutation): the explicit
    depth-to-space rearrange forces a slow HBM layout pass on TPU (measured
    ~80-350 GB/s vs 819 peak); the transposed conv writes output directly in its
    final layout (~2.5x faster end to end at the unet's upsample shapes on v5e).
    Param tree is unchanged: a (1, 1, c, 4*dim_out) 'conv' kernel with the
    replicated-kaiming pixel-shuffle init.
    """
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel, bias = _ShuffleConvParams(
            (1, 1, c, self.dim_out * 4), (self.dim_out * 4,),
            kernel_init=_pixelshuffle_init, name='conv')()
        # out[2i+s1, 2j+s2, o] = (x[i, j] @ W)[o*4 + s1*2 + s2]  (idx = (c s1 s2))
        # == conv_transpose with K[s1, s2, in, o] spatially flipped (lhs-dilation
        # conv semantics mirror the kernel)
        k_t = kernel[0, 0].reshape(c, self.dim_out, 2, 2).transpose(2, 3, 0, 1)
        k_t = k_t[::-1, ::-1]
        y = jax.lax.conv_transpose(
            x.astype(self.dtype), k_t.astype(self.dtype), (2, 2), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        # per-channel bias of the 1x1 conv becomes a 2x2-periodic spatial pattern
        b_t = bias.reshape(self.dim_out, 2, 2).transpose(1, 2, 0)
        b_t = jnp.tile(b_t, (y.shape[1] // 2, y.shape[2] // 2, 1))
        return jax.nn.silu(y + b_t.astype(y.dtype))


class Downsample(nn.Module):
    """Space-to-depth + 1x1 conv (SP-conv); reference imagen_pytorch.py:633-640.

    Computed as the mathematically identical 2x2/stride-2 conv (weights reshaped
    from the stored (4c, dim_out) SP-conv matrix): the explicit space-to-depth
    rearrange is a slow HBM layout pass on TPU; the strided conv reads input
    in place (~2x faster at the unet's downsample shapes on v5e). Param tree is
    unchanged ('conv' Dense kernel/bias).
    """
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel, bias = _ShuffleConvParams(
            (4 * c, self.dim_out), (self.dim_out,), name='conv')()
        # Dense over (c s1 s2)-packed channels == 2x2 conv with
        # K[s1, s2, c, o] = W[c*4 + s1*2 + s2, o]
        k2 = kernel.reshape(c, 2, 2, self.dim_out).transpose(1, 2, 0, 3)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k2.astype(self.dtype), (2, 2), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + bias.astype(y.dtype)


def _phase_tiled_kernel(w, s):
    """Rewrite a (K, K, c, o) stride-1 conv kernel as its 2x2-phase-tiled
    equivalent (Kt, Kt, s*s*c, s*s*o) operating on space-to-depth input.

    For output phase (p1, p2) and tap (a, b):
      y[s*i+p1, s*j+p2, o] = sum x[s*i+p1+a-P, ...] w[a, b, c, o]   (P = K//2)
    With the input padded by P on each side and space-to-depth'd, tap a of
    phase p1 lands at s2d block (p1+a)//s, sub-row (p1+a)%s — i.e. the kernel
    left-padded by p1 (right-padded to a multiple of s) then reshaped (Kt, s).
    """
    K = w.shape[0]
    Kt = (K + s - 1) // s + (1 if (K - 1) % s else 0)
    phases = []
    for p1 in range(s):
        for p2 in range(s):
            wp = jnp.pad(w, ((p1, Kt * s - K - p1), (p2, Kt * s - K - p2),
                             (0, 0), (0, 0)))
            wp = rearrange(wp, '(u s1) (v s2) c o -> u v (s1 s2 c) o', s1=s, s2=s)
            phases.append(wp)
    return jnp.concatenate(phases, axis=-1), Kt  # out channels = (p1 p2 o)


class CrossEmbedLayer(nn.Module):
    """Multi-kernel-size stem conv, channel-split per scale, concat.

    Reference imagen_pytorch.py:1051-1076.

    TPU note: XLA's conv lowering is degenerate for tiny input-channel counts
    (the RGB stem: C_in=3, 15x15 kernel measured ~6 TF/s on v5e — ~400 us/step
    on the flagship unet). For stride-1 stems with c <= 4, the per-scale
    kernels are merged into one max-K kernel and run as a phase-tiled conv:
    2x2 space-to-depth input (c -> 4c), one (K+1)/2-sized conv producing all 4
    output phases, depth-to-space out. Identical math, MXU-shaped contraction.
    Params are unchanged per-scale 'conv_{i}' Conv kernels.
    """
    kernel_sizes: Tuple[int, ...]
    dim_out: int
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert all((k % 2) == (self.stride % 2) for k in self.kernel_sizes)
        kernel_sizes = sorted(self.kernel_sizes)
        num_scales = len(kernel_sizes)

        dim_scales = [int(self.dim_out / (2 ** i)) for i in range(1, num_scales)]
        dim_scales = [*dim_scales, self.dim_out - sum(dim_scales)]

        c = x.shape[-1]
        # phase tiling wins in isolation at every measured shape, but at
        # 1024^2 the depth-to-space output layout slows downstream consumers
        # more than the conv saves end-to-end (6.85 vs 6.30 s/image SR tail);
        # at <=512^2 it is a clear net win (cascade 3.97 -> 4.38 img/s)
        big = x.shape[1] * x.shape[2] > 512 * 512
        tiled = (self.stride == 1 and c <= 8 and max(kernel_sizes) % 2 == 1

                 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        if tiled:
            # One shared space-to-depth input padded for the LARGEST kernel;
            # each scale runs its OWN phase-tiled conv over a centered slice
            # (running the small scales inside one merged max-K kernel costs
            # K_max^2 taps for every scale — ~3x the FLOPs at (3, 7, 15)).
            kmax = max(kernel_sizes)
            pmax = kmax // 2
            xp = jnp.pad(x.astype(self.dtype),
                         ((0, 0), (pmax, pmax), (pmax, pmax), (0, 0)))
            xs = rearrange(xp, 'b (h s1) (w s2) c -> b h w (s1 s2 c)', s1=2, s2=2)
            ys, bs = [], []
            for i, (kernel, dim_scale) in enumerate(zip(kernel_sizes, dim_scales)):
                w, b = _ShuffleConvParams(
                    (kernel, kernel, c, dim_scale), (dim_scale,),
                    name=f'conv_{i}')()
                # the slice below needs (pmax - pad_k) even: widen the kernel by
                # one zero tap per side when parities differ
                if (pmax - kernel // 2) % 2:
                    w = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
                wt, _ = _phase_tiled_kernel(w.astype(self.dtype), 2)
                off = (pmax - w.shape[0] // 2) // 2  # in space-to-depth blocks
                xs_k = xs if off == 0 else xs[:, off:-off, off:-off, :]
                ys.append(jax.lax.conv_general_dilated(
                    xs_k, wt, (1, 1), 'VALID',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC')))
                bs.append(b)
            bias = jnp.concatenate(bs)
            # per-scale channels are (p1 p2 o_i); emit phase-major across scales
            # so one depth-to-space covers the concatenated output
            o_sz = [y.shape[-1] // 4 for y in ys]
            y = jnp.concatenate(
                [y[..., ph * o: (ph + 1) * o] for ph in range(4)
                 for y, o in zip(ys, o_sz)], axis=-1)
            y = rearrange(y, 'b h w (p1 p2 o) -> b (h p1) (w p2) o', p1=2, p2=2)
            y = y + bias.astype(y.dtype)
            if big:
                # at >512^2 the depth-to-space gather fused into consumers
                # drops their read bandwidth; materialize once instead
                y = jax.lax.optimization_barrier(y)
            return y

        fmaps = []
        for i, (kernel, dim_scale) in enumerate(zip(kernel_sizes, dim_scales)):
            pad = (kernel - self.stride) // 2
            fmaps.append(nn.Conv(
                dim_scale, (kernel, kernel), strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)), dtype=self.dtype,
                name=f'conv_{i}')(x))
        return jnp.concatenate(fmaps, axis=-1)


class UpsampleCombiner(nn.Module):
    """Optionally resize+conv all upsample-stage fmaps and concat at the end.

    Reference imagen_pytorch.py:1078-1110. `dim_out` property parity: use
    `combined_dim()` statically when wiring the final conv.
    """
    dim: int
    enabled: bool = False
    dim_ins: Tuple[int, ...] = ()
    dim_outs: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @staticmethod
    def combined_dim(dim, enabled, dim_ins, dim_outs):
        dim_outs = cast_tuple(dim_outs, len(dim_ins))
        if not enabled:
            return dim
        return dim + (sum(dim_outs) if len(dim_outs) > 0 else 0)

    @nn.compact
    def __call__(self, x, fmaps=None):
        target_size = x.shape[-2]
        fmaps = default(fmaps, tuple())

        if not self.enabled or len(fmaps) == 0 or len(self.dim_ins) == 0:
            return x

        dim_outs = cast_tuple(self.dim_outs, len(self.dim_ins))
        outs = []
        for i, (fmap, dim_out) in enumerate(zip(fmaps, dim_outs)):
            fmap = resize_image_to(fmap, target_size)
            outs.append(Block(dim_out, dtype=self.dtype, name=f'fmap_conv_{i}')(fmap))
        return jnp.concatenate((x, *outs), axis=-1)


# --- perceiver resampler -----------------------------------------------------------------

class PerceiverAttention(nn.Module):
    """Latents attend over (sequence ++ latents); reference imagen_pytorch.py:379-446."""
    dim_head: int = 64
    heads: int = 8
    scale: float = 8.
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latents, mask=None):
        dim = x.shape[-1]
        inner_dim = self.dim_head * self.heads

        x = TorchLayerNorm(dtype=self.dtype, name='norm')(x)
        latents = TorchLayerNorm(dtype=self.dtype, name='norm_latents')(latents)

        q = nn.Dense(inner_dim, use_bias=False, dtype=self.dtype, name='to_q')(latents)
        kv_input = jnp.concatenate((x, latents), axis=-2)
        kv = nn.Dense(inner_dim * 2, use_bias=False, dtype=self.dtype, name='to_kv')(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        q, k, v = map(
            lambda t: rearrange(t, 'b n (h d) -> b h n d', h=self.heads), (q, k, v))

        q_scale = self.param('q_scale', nn.initializers.ones, (self.dim_head,), jnp.float32)
        k_scale = self.param('k_scale', nn.initializers.ones, (self.dim_head,), jnp.float32)
        q = l2norm(q) * q_scale.astype(q.dtype)
        k = l2norm(k) * k_scale.astype(k.dtype)

        if exists(mask):
            # latents (appended at the end of K) are always attended
            mask = jnp.pad(mask, ((0, 0), (0, latents.shape[-2])), constant_values=True)

        out = multihead_attention(q, k, v, scale=self.scale, mask=mask, null_tokens=0)
        out = rearrange(out, 'b h n d -> b n (h d)')
        out = nn.Dense(dim, use_bias=False, dtype=self.dtype, name='to_out')(out)
        return TorchLayerNorm(dtype=self.dtype, name='out_norm')(out)


class PerceiverResampler(nn.Module):
    """Attention-pool text tokens into a fixed set of latents (+ mean-pooled latents).

    Reference imagen_pytorch.py:448-498.
    """
    depth: int
    dim_head: int = 64
    heads: int = 8
    num_latents: int = 64
    num_latents_mean_pooled: int = 4
    max_seq_len: int = 512
    ff_mult: float = 4.
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        n, dim = x.shape[1], x.shape[-1]
        pos_emb = nn.Embed(self.max_seq_len, dim, dtype=self.dtype,
                           name='pos_emb')(jnp.arange(n))
        x_with_pos = x + pos_emb

        latents_p = self.param('latents', nn.initializers.normal(1.0),
                               (self.num_latents, dim), jnp.float32)
        latents = repeat(latents_p.astype(x.dtype), 'n d -> b n d', b=x.shape[0])

        if self.num_latents_mean_pooled > 0:
            meanpooled_seq = masked_mean(
                x, axis=1, mask=jnp.ones(x.shape[:2], dtype=bool))
            mp = LayerNorm(dtype=self.dtype, name='mp_norm')(meanpooled_seq)
            mp = nn.Dense(dim * self.num_latents_mean_pooled, dtype=self.dtype,
                          name='mp_proj')(mp)
            mp_latents = rearrange(mp, 'b (n d) -> b n d', n=self.num_latents_mean_pooled)
            latents = jnp.concatenate((mp_latents, latents), axis=-2)

        for i in range(self.depth):
            latents = PerceiverAttention(
                dim_head=self.dim_head, heads=self.heads, dtype=self.dtype,
                name=f'attn_{i}')(x_with_pos, latents, mask=mask) + latents
            latents = FeedForward(mult=self.ff_mult, dtype=self.dtype,
                                  name=f'ff_{i}')(latents) + latents

        return latents
