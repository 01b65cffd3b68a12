"""Video (pseudo-3D) building blocks, NFHWC layout (batch, frames, h, w, channels).

Capability parity with the reference imagen_video.py block layer
(/root/reference/imagen_pytorch/imagen_video.py:190-1223), TPU-first:

- **Frames fold into batch for all spatial ops**: a "pseudo-3D" conv is the same 2D
  conv XLA already tiles onto the MXU, applied to (b*f, h, w, c). We therefore *reuse*
  the 2D flax blocks directly instead of re-implementing "3D" variants — identical
  kernels, identical params.
- Genuinely temporal modules are implemented here: causal temporal conv
  (make-a-video axial conv, reference :397-451), temporal PEG (causal depthwise
  (3,1,1) conv, :1413-1414), temporal attention over frames with continuous relative
  position bias (:1182-1223,1416), RWKV-style TimeTokenShift feedforward (:1039-1057),
  temporal up/downsampling (:649-686).
- Reference deviation (documented): the reference dirac-inits its causal temporal conv
  at the center tap (:421), which combined with causal padding makes the "identity"
  init actually a one-frame shift; we init the delta at the last tap so the init is a
  true identity.
"""
from __future__ import annotations

import math
import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange, repeat

from imagen_tpu.models.blocks import (
    Attention as TokenAttention,
    ChanRMSNorm,
    CrossAttention,
    GlobalContext,
    LayerNorm,
    LinearAttention,
    TorchLayerNorm,
)
from imagen_tpu.ops.tensor_utils import l2norm
from imagen_tpu.utils.helpers import default, exists

Dtype = Any


# --- video resize helpers (reference imagen_video.py:134-178) ---------------------------

def resize_video_to(video, target_image_size, target_frames=None, clamp_range=None,
                    method='nearest'):
    """Resize NFHWC video spatially (and optionally temporally)."""
    b, f, h, w, c = video.shape
    target_frames = default(target_frames, f)
    target_shape = (f if target_frames is None else target_frames,
                    target_image_size, target_image_size)
    if (f, h, w) == target_shape:
        return video
    out = jax.image.resize(video, (b, *target_shape, c), method=method)
    if exists(clamp_range):
        out = jnp.clip(out, clamp_range[0], clamp_range[1])
    return out


def scale_video_time(video, downsample_scale=1, method='nearest'):
    """Temporal downsample of conditioning frames; reference imagen_video.py:158-178."""
    if downsample_scale == 1:
        return video
    frames = video.shape[1]
    assert frames % downsample_scale == 0, \
        f'{frames} frames not divisible by temporal downsample {downsample_scale}'
    return resize_video_to(
        video, video.shape[-2], target_frames=frames // downsample_scale,
        method=method)


# --- frame folding ----------------------------------------------------------------------

def fold_frames(x):
    b = x.shape[0]
    return rearrange(x, 'b f h w c -> (b f) h w c'), b


def unfold_frames(x, b):
    return rearrange(x, '(b f) h w c -> b f h w c', b=b)


def spatial(module, x, *args, **kwargs):
    """Apply a 2D NHWC module per-frame (XLA sees one big batched conv)."""
    folded, b = fold_frames(x)
    out = module(folded, *args, **kwargs)
    return unfold_frames(out, b)


# --- pseudo-3D conv (make-a-video axial conv) -------------------------------------------

def _causal_identity_init(key, shape, dtype=jnp.float32):
    """Identity init for the causal temporal conv: delta at the LAST tap so that with
    left-only (causal) padding the op starts as identity (see module docstring for the
    reference-deviation note)."""
    k, cin, cout = shape
    w = jnp.zeros(shape, dtype)
    eye = jnp.eye(cin, cout, dtype=dtype)
    return w.at[k - 1].set(eye)


class PseudoConv3d(nn.Module):
    """Spatial 2D conv + causal temporal 1D conv; reference imagen_video.py:397-451."""
    dim_out: int
    kernel_size: int = 3
    temporal_kernel_size: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ignore_time: bool = False):
        k = self.kernel_size
        tk = default(self.temporal_kernel_size, k)
        is_video = x.ndim == 5
        ignore_time &= is_video

        if is_video:
            b = x.shape[0]
            x_sp = rearrange(x, 'b f h w c -> (b f) h w c')
        else:
            x_sp = x

        x_sp = nn.Conv(self.dim_out, (k, k), padding='SAME', dtype=self.dtype,
                       name='spatial_conv')(x_sp)

        if is_video:
            x = rearrange(x_sp, '(b f) h w c -> b f h w c', b=b)
        else:
            x = x_sp

        if ignore_time or not is_video or k <= 1:
            return x

        # causal temporal conv over frames, per spatial position
        h, w = x.shape[2], x.shape[3]
        xt = rearrange(x, 'b f h w c -> (b h w) f c')
        xt = nn.Conv(self.dim_out, (tk,), padding=((tk - 1, 0),), dtype=self.dtype,
                     kernel_init=_causal_identity_init,
                     bias_init=nn.initializers.zeros,
                     name='temporal_conv')(xt)
        return rearrange(xt, '(b h w) f c -> b f h w c', h=h, w=w)


class SpatialConvIn3d(nn.Module):
    """Kernel (1, k, k) conv on video (the reference's video `Conv2d`, :574-588).

    In NFHWC this is just a 2D conv with frames folded into batch.
    """
    dim_out: int
    kernel: int = 1
    stride: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        is_video = x.ndim == 5
        if is_video:
            b = x.shape[0]
            x = rearrange(x, 'b f h w c -> (b f) h w c')
        k, s = self.kernel, self.stride
        pad = 'SAME' if s == 1 else [((k - s) // 2, (k - s) // 2)] * 2
        x = nn.Conv(self.dim_out, (k, k), strides=(s, s), padding=pad,
                    use_bias=self.use_bias, dtype=self.dtype, name='conv')(x)
        if is_video:
            x = rearrange(x, '(b f) h w c -> b f h w c', b=b)
        return x


# --- temporal attention machinery --------------------------------------------------------

class DynamicPositionBias(nn.Module):
    """Continuous relative-position bias MLP; reference imagen_video.py:1182-1223.

    Returns (heads, n, n) bias for frame-axis attention.
    """
    dim: int
    heads: int
    depth: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, n):
        i = jnp.arange(n)
        j = jnp.arange(n)
        indices = i[:, None] - j[None, :] + (n - 1)

        pos = jnp.arange(-n + 1, n, dtype=jnp.float32)[:, None]

        pos = nn.Dense(self.dim, dtype=self.dtype, name='mlp_in')(pos)
        pos = LayerNorm(dtype=self.dtype, name='norm_in')(pos)
        pos = jax.nn.silu(pos)
        for d in range(max(self.depth - 1, 0)):
            pos = nn.Dense(self.dim, dtype=self.dtype, name=f'mlp_{d}')(pos)
            pos = LayerNorm(dtype=self.dtype, name=f'norm_{d}')(pos)
            pos = jax.nn.silu(pos)
        pos = nn.Dense(self.heads, dtype=self.dtype, name='mlp_out')(pos)

        bias = pos[indices]                      # (n, n, h)
        return rearrange(bias, 'i j h -> h i j')


class _EinsumProj(nn.Module):
    """Bias-free projection with a layout-permuting einsum.

    Param tree and init are IDENTICAL to `nn.Dense(features, use_bias=False)`
    ({'kernel': (cin, features)}, lecun-normal), so checkpoints/weight-ports
    are unaffected — only the output LAYOUT differs: the einsum spec makes the
    matmul epilogue write the permuted layout directly, so no standalone HBM
    transpose pass runs (the reference's RearrangeTimeCentric,
    imagen_video.py:257-270, is a real relayout on TPU)."""
    features: int
    eq: str
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        return jnp.einsum(self.eq, x, kernel)


class VideoAttention(nn.Module):
    """Multi-query attention with optional causality, relative position bias, null
    attention-bias token, and zero-init output norm.

    Reference imagen_video.py:455-570 — the video Attention adds `causal`,
    `rel_pos_bias` (DynamicPositionBias), `null_attn_bias` and `init_zero` on top of
    the image Attention. fp32 softmax retained (the reference drops it here — :563 —
    we keep the stabler island).
    """
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    context_dim: Optional[int] = None
    rel_pos_bias: bool = False
    rel_pos_bias_mlp_depth: int = 2
    init_zero: bool = False
    scale: float = 8.
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None, attn_bias=None,
                 fused_ln=False):
        import imagen_tpu.ops.flash_attention as fa

        video = x.ndim == 5                 # native (b, f, h, w, c) layout
        if video:
            assert not (exists(context) or exists(mask)), \
                'native-layout input is the per-pixel temporal case only'
            b0, n, hh, ww = x.shape[0], x.shape[1], x.shape[2], x.shape[3]
            b = b0 * hh * ww
        else:
            b, n = x.shape[0], x.shape[1]
        dim = x.shape[-1]
        inner_dim = self.dim_head * self.heads

        x_native = x if (video and fused_ln) else None
        # with fused_ln the norm itself performs the fold to ((b h w) f c) —
        # one Pallas pass instead of transpose + norm (ops/temporal_layout)
        x = LayerNorm(dtype=self.dtype)(x, time_fold=video and fused_ln)
        if video and fused_ln:
            video = False   # downstream runs the standard rows path on 3D x

        if video:
            # Transposing projections: q/kv matmuls emit the time-centric
            # (b h w) f e layout directly and to_out writes NFHWC back, so no
            # standalone HBM relayout brackets the attention (measured:
            # tools/microbench_video_layout.py). Param trees match nn.Dense.
            q = _EinsumProj(inner_dim, 'bfhwc,ce->bhwfe', dtype=self.dtype,
                            name='to_q')(x)
            kv = _EinsumProj(self.dim_head * 2, 'bfhwc,ce->bhwfe',
                             dtype=self.dtype, name='to_kv')(x)
            q = q.reshape(b, n, inner_dim)
            kv = kv.reshape(b, n, self.dim_head * 2)
        else:
            q = nn.Dense(inner_dim, use_bias=False, dtype=self.dtype,
                         name='to_q')(x)
            kv = nn.Dense(self.dim_head * 2, use_bias=False, dtype=self.dtype,
                          name='to_kv')(x)
        k, v = jnp.split(kv, 2, axis=-1)

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

        q_scale = self.param('q_scale', nn.initializers.ones, (self.dim_head,), jnp.float32)
        k_scale = self.param('k_scale', nn.initializers.ones, (self.dim_head,), jnp.float32)

        # T5-style relative position bias over the (non-null) frame keys
        if not exists(attn_bias) and self.rel_pos_bias:
            attn_bias = DynamicPositionBias(
                dim=dim, heads=self.heads, depth=self.rel_pos_bias_mlp_depth,
                dtype=self.dtype, name='dyn_pos_bias')(n)

        # per-pixel additive bias (h, n, nk_local) incl. the null column
        bias_full = None
        if exists(attn_bias):
            null_attn_bias = self.param(
                'null_attn_bias', nn.initializers.normal(1.0),
                (self.heads,), jnp.float32)
            nb = repeat(null_attn_bias.astype(jnp.float32), 'h -> h n 1', n=n)
            bias_full = jnp.concatenate(
                (nb, attn_bias.astype(jnp.float32)), axis=-1)

        nk_local = k.shape[-2]
        per_pixel = not (exists(context) or exists(mask))
        Gr = (fa.temporal_rows_available(
                b, n, self.heads, nk_local, interpret=fa._INTERPRET)
              if per_pixel else None)
        G = (fa.grouped_temporal_available(
                b, n, self.heads, nk_local, interpret=fa._INTERPRET)
             if per_pixel and not exists(Gr) else None)

        plain = not (exists(bias_full) or self.causal or exists(mask)
                     or exists(context))
        if plain and fa.flash_attention_available(
                n, self.dim_head, False, False, heads=self.heads):
            # bias-free flattened attention (e.g. Unet3D mid_attn over
            # (f x y) tokens): standard rows flash route, no tile needed
            q_rows = q.reshape(b, n * self.heads, self.dim_head)
            out = fa.flash_cosine_mqa_rows(
                q_rows, k, v, q_scale, k_scale, self.scale)
            out = out.reshape(b, n, inner_dim)
        elif exists(Gr):
            # rows-packed path (2nd-gen temporal kernel): all heads fold into
            # the matmul M dim via the FREE (rows, h*d) -> (rows*h, d) reshape
            # and Gr pixels' keys share ONE 128-lane tile — half the padded
            # sim/softmax area of the grouped path below, one matmul per
            # program instead of an unrolled head loop
            bias_hfj = (bias_full if exists(bias_full)
                        else jnp.zeros((self.heads, n, nk_local), jnp.float32))
            causal_mask = (jnp.triu(jnp.ones((n, nk_local), bool),
                                    nk_local - n + 1)
                           if self.causal else None)
            tile = fa.build_rows_bias(bias_hfj, causal_mask, Gr)
            q_g = q.reshape(b // Gr, Gr * n, inner_dim)
            k_g = k.reshape(b // Gr, Gr * nk_local, self.dim_head)
            v_g = v.reshape(b // Gr, Gr * nk_local, self.dim_head)
            out = fa.flash_temporal_rows(
                q_g, k_g, v_g, q_scale, k_scale, tile, self.scale, self.heads)
            out = out.reshape(b, n, inner_dim)
        elif exists(G):
            # grouped packed path: frames*heads rows per pixel share one KV —
            # MQA — so G pixels batch into one dense program with a
            # block-diagonal bias tile instead of b*h*w tiny (n, nk)
            # attentions; the kernel lane-slices heads from the packed q block
            # so no head retile touches HBM (ops.flash_attention, grouped
            # section)
            bias_hfj = (bias_full if exists(bias_full)
                        else jnp.zeros((self.heads, n, nk_local), jnp.float32))
            causal_mask = (jnp.triu(jnp.ones((n, nk_local), bool),
                                    nk_local - n + 1)
                           if self.causal else None)
            tile = fa.build_grouped_bias(bias_hfj, causal_mask, G)
            q_g = q.reshape(b // G, G * n, inner_dim)
            k_g = k.reshape(b // G, G * nk_local, self.dim_head)
            v_g = v.reshape(b // G, G * nk_local, self.dim_head)
            out = fa.flash_grouped_cosine(
                q_g, k_g, v_g, q_scale, k_scale, tile, self.scale, self.heads)
            out = out.reshape(b, n, inner_dim)
        else:
            q = rearrange(q, 'b n (h d) -> b h n d', h=self.heads)
            q = l2norm(q) * q_scale.astype(q.dtype)
            k = l2norm(k) * k_scale.astype(k.dtype)

            sim = jnp.einsum('bhid,bjd->bhij', q, k) * self.scale
            if exists(bias_full):
                sim = sim + bias_full[None].astype(sim.dtype)

            max_neg = -jnp.finfo(sim.dtype).max

            if self.causal:
                i, j = sim.shape[-2:]
                causal_mask = jnp.triu(jnp.ones((i, j), dtype=bool), j - i + 1)
                sim = jnp.where(causal_mask, max_neg, sim)

            if exists(mask):
                mask_p = jnp.pad(mask, ((0, 0), (num_prepended, 0)),
                                 constant_values=True)
                sim = jnp.where(mask_p[:, None, None, :], sim, max_neg)

            attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(sim.dtype)
            out = jnp.einsum('bhij,bjd->bhid', attn, v)
            out = rearrange(out, 'b h n d -> b n (h d)')
        if video:
            out = out.reshape(b0, hh, ww, n, inner_dim)
            out = _EinsumProj(dim, 'bhwfe,ec->bfhwc', dtype=self.dtype,
                              name='to_out')(out)
        else:
            out = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                           name='to_out')(out)

        g_init = nn.initializers.zeros if self.init_zero else nn.initializers.ones
        # out norm with configurable-init gain (init_zero makes the residual branch
        # start as a no-op; reference :496-497)
        dtype = out.dtype
        g = self.param('out_norm_g', g_init, (dim,), jnp.float32)
        eps = 1e-5 if dtype == jnp.float32 else 1e-3
        if x_native is not None:
            # fused out-norm + unfold-to-native + temporal residual in one
            # Pallas pass (ops/temporal_layout.py) — the residual is folded
            # here, so the caller must NOT add it again
            from imagen_tpu.ops.temporal_layout import fused_norm_untranspose
            return fused_norm_untranspose(out, x_native, g, eps)
        var = jnp.var(out, axis=-1, keepdims=True)
        mean = jnp.mean(out, axis=-1, keepdims=True)
        return (out - mean) * jax.lax.rsqrt(var + eps).astype(dtype) * g.astype(dtype)


class TemporalAttention(nn.Module):
    """Residual causal attention over frames, per spatial position
    (RearrangeTimeCentric; reference imagen_video.py:257-270,1416)."""
    dim_head: int = 64
    heads: int = 8
    causal: bool = True
    rel_pos_bias_mlp_depth: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        attn = VideoAttention(
            dim_head=self.dim_head, heads=self.heads, causal=self.causal,
            init_zero=True, rel_pos_bias=True,
            rel_pos_bias_mlp_depth=self.rel_pos_bias_mlp_depth,
            dtype=self.dtype, name='attn')
        if os.environ.get('IMAGEN_TPU_TEMPORAL_FUSED_LN', '0') == '1':
            from imagen_tpu.ops import temporal_layout as tl
            if tl.available(x.shape):
                # LN and out-norm each fused with their relayout
                # (ops/temporal_layout.py); the temporal residual is folded
                # into the out kernel — no add here
                return attn(x, fused_ln=True)
        if os.environ.get('IMAGEN_TPU_TEMPORAL_EINSUM', '0') == '1':
            # native-layout path: the attention's transposing projections
            # absorb the time-centric relayout. MEASURED NEGATIVE end-to-end
            # (round 5): 0.729 vs 0.930 clips/s — the permuted einsum epilogue
            # slows the 8x-LARGER q/kv projection writes (inner=512) far more
            # than the explicit transpose of the small c-dim tensor costs.
            # Kept opt-in as a receipt; see tools/microbench_video_layout.py.
            return attn(x) + x
        h, w = x.shape[2], x.shape[3]
        xt = rearrange(x, 'b f h w c -> (b h w) f c')
        out = attn(xt) + xt
        return rearrange(out, '(b h w) f c -> b f h w c', h=h, w=w)


class TemporalPeg(nn.Module):
    """Residual causal-padded depthwise (3,1,1) conv; reference :1413-1414."""
    causal: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        pad = (2, 0) if self.causal else (1, 1)

        class _Conv(nn.Module):
            """Holds the same conv/{kernel,bias} params as the 1D nn.Conv."""
            @nn.compact
            def __call__(self):
                k = self.param('kernel', nn.initializers.lecun_normal(),
                               (3, 1, dim))
                b = self.param('bias', nn.initializers.zeros, (dim,))
                return k, b

        # depthwise (3,1,1) conv directly on NFHWC — the reference's
        # time-centric rearrange (imagen_video.py:257-270) is a real HBM
        # transpose on TPU; a 3D conv with unit spatial taps is the same math
        # with zero relayout. Param tree unchanged ('conv' kernel/bias).
        w3, b3 = _Conv(name='conv')()
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w3.reshape(3, 1, 1, 1, dim).astype(self.dtype),
            (1, 1, 1), ((pad[0], pad[1]), (0, 0), (0, 0)),
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
            feature_group_count=dim)
        return out + b3.astype(out.dtype) + x


# --- token-shift feedforward -------------------------------------------------------------

class TimeTokenShift(nn.Module):
    """Shift half the hidden channels one frame forward (RWKV-style);
    reference imagen_video.py:1039-1049."""

    @nn.compact
    def __call__(self, x):
        if x.ndim != 5:
            return x
        x_keep, x_shift = jnp.split(x, 2, axis=-1)
        x_shift = jnp.pad(x_shift, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1]
        return jnp.concatenate((x_keep, x_shift), axis=-1)


class ChanFeedForwardVideo(nn.Module):
    """ChanLayerNorm -> 1x1 -> GELU -> (TimeTokenShift) -> ChanLayerNorm -> 1x1 on
    NFHWC video; reference imagen_video.py:1051-1061."""
    mult: float = 2.
    time_token_shift: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        hidden_dim = int(dim * self.mult)
        h = LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(hidden_dim, use_bias=False, dtype=self.dtype)(h)
        h = jax.nn.gelu(h, approximate=False)
        if self.time_token_shift:
            h = TimeTokenShift()(h)
        h = LayerNorm(dtype=self.dtype)(h)
        h = nn.Dense(dim, use_bias=False, dtype=self.dtype)(h)
        return h


# --- resnet / transformer for video ------------------------------------------------------

class BlockVideo(nn.Module):
    """ChanRMSNorm -> FiLM -> SiLU -> pseudo-3D conv; reference imagen_video.py:706-731."""
    dim_out: int
    norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None, ignore_time=False):
        if self.norm:
            x = ChanRMSNorm(dtype=self.dtype)(x)
        if exists(scale_shift):
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        x = jax.nn.silu(x)
        return PseudoConv3d(self.dim_out, 3, dtype=self.dtype,
                            name='project')(x, ignore_time=ignore_time)


class ResnetBlockVideo(nn.Module):
    """Video resnet block; reference imagen_video.py:733-814. Cross-attn runs over
    flattened (f h w) tokens; GCA pools over all of them."""
    dim_out: int
    cond_dim: Optional[int] = None
    time_cond_dim: Optional[int] = None
    linear_attn: bool = False
    use_gca: bool = False
    attn_dim_head: int = 64
    attn_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None, cond=None, ignore_time=False):
        dim = x.shape[-1]

        scale_shift = None
        if exists(self.time_cond_dim) and exists(time_emb):
            t = jax.nn.silu(time_emb)
            t = nn.Dense(self.dim_out * 2, dtype=self.dtype, name='time_mlp')(t)
            t = rearrange(t, 'b c -> b 1 1 1 c')
            scale_shift = jnp.split(t, 2, axis=-1)

        h = BlockVideo(self.dim_out, dtype=self.dtype, name='block1')(
            x, ignore_time=ignore_time)

        if exists(self.cond_dim):
            assert exists(cond)
            f, hh, ww = h.shape[1], h.shape[2], h.shape[3]
            h_flat = rearrange(h, 'b f x y c -> b (f x y) c')
            h_flat = CrossAttention(
                context_dim=self.cond_dim, linear=self.linear_attn,
                dim_head=self.attn_dim_head, heads=self.attn_heads,
                dtype=self.dtype, name='cross_attn')(h_flat, context=cond) + h_flat
            h = rearrange(h_flat, 'b (f x y) c -> b f x y c', f=f, x=hh, y=ww)

        h = BlockVideo(self.dim_out, dtype=self.dtype, name='block2')(
            h, scale_shift=scale_shift, ignore_time=ignore_time)

        if self.use_gca:
            # pool over (f h w): reuse GlobalContext by folding frames into height
            b, f, hh, ww, c = h.shape
            gate = GlobalContext(dim_out=self.dim_out, dtype=self.dtype, name='gca')(
                h.reshape(b, f * hh, ww, c))
            h = h * gate[:, None]

        if dim != self.dim_out:
            x = nn.Dense(self.dim_out, dtype=self.dtype, name='res_conv')(x)
        return h + x


class TransformerBlockVideo(nn.Module):
    """Full attention over (f h w) tokens + token-shift channel FF;
    reference imagen_video.py:1063-1103."""
    depth: int = 1
    heads: int = 8
    dim_head: int = 32
    ff_mult: float = 2.
    ff_time_token_shift: bool = True
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        f, hh, ww = x.shape[1], x.shape[2], x.shape[3]
        for i in range(self.depth):
            tokens = rearrange(x, 'b f x y c -> b (f x y) c')
            tokens = TokenAttention(
                heads=self.heads, dim_head=self.dim_head,
                context_dim=self.context_dim, dtype=self.dtype,
                name=f'attn_{i}')(tokens, context=context) + tokens
            x = rearrange(tokens, 'b (f x y) c -> b f x y c', f=f, x=hh, y=ww)
            x = ChanFeedForwardVideo(
                mult=self.ff_mult, time_token_shift=self.ff_time_token_shift,
                dtype=self.dtype, name=f'ff_{i}')(x) + x
        return x


class LinearAttentionTransformerBlockVideo(nn.Module):
    """Per-frame spatial linear attention + token-shift FF;
    reference imagen_video.py:1105-1130."""
    depth: int = 1
    heads: int = 8
    dim_head: int = 32
    ff_mult: float = 2.
    ff_time_token_shift: bool = True
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, deterministic: bool = True):
        b = x.shape[0]
        for i in range(self.depth):
            folded, _ = fold_frames(x)
            ctx = None
            if exists(context):
                ctx = repeat(context, 'b n d -> (b f) n d', f=x.shape[1])
            folded = LinearAttention(
                heads=self.heads, dim_head=self.dim_head,
                context_dim=self.context_dim, dtype=self.dtype,
                name=f'attn_{i}')(folded, context=ctx,
                                  deterministic=deterministic) + folded
            x = unfold_frames(folded, b)
            x = ChanFeedForwardVideo(
                mult=self.ff_mult, time_token_shift=self.ff_time_token_shift,
                dtype=self.dtype, name=f'ff_{i}')(x) + x
        return x


# --- temporal resolution changers --------------------------------------------------------

def _temporal_pixelshuffle_init(stride):
    def init(key, shape, dtype=jnp.float32):
        cin, cout_s = shape[-2], shape[-1]
        cout = cout_s // stride
        fan_in = cin
        bound = math.sqrt(6.0 / fan_in)
        w = jax.random.uniform(key, (*shape[:-1], cout), dtype, -bound, bound)
        return jnp.repeat(w, stride, axis=-1)
    return init


class TemporalPixelShuffleUpsample(nn.Module):
    """1x1 temporal conv c->c*stride (replicated kaiming init), SiLU, frame shuffle;
    reference imagen_video.py:649-677."""
    dim_out: int
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.Dense(self.dim_out * self.stride, dtype=self.dtype,
                       kernel_init=_temporal_pixelshuffle_init(self.stride),
                       bias_init=nn.initializers.zeros, name='conv')(x)
        out = jax.nn.silu(out)
        return rearrange(out, 'b f h w (c r) -> b (f r) h w c', r=self.stride)


class TemporalDownsample(nn.Module):
    """Frames-to-channels + 1x1 conv; reference imagen_video.py:679-686."""
    dim_out: int
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = rearrange(x, 'b (f p) h w c -> b f h w (c p)', p=self.stride)
        return nn.Dense(self.dim_out, dtype=self.dtype, name='conv')(x)


class UpsampleCombinerVideo(nn.Module):
    """reference imagen_video.py:1164-1180 (video resize + Block per fmap)."""
    dim: int
    enabled: bool = False
    dim_ins: Tuple[int, ...] = ()
    dim_outs: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, fmaps=None):
        from imagen_tpu.utils.helpers import cast_tuple
        target_size = x.shape[-2]
        fmaps = default(fmaps, tuple())
        if not self.enabled or len(fmaps) == 0 or len(self.dim_ins) == 0:
            return x
        dim_outs = cast_tuple(self.dim_outs, len(self.dim_ins))
        outs = []
        for i, (fmap, dim_out) in enumerate(zip(fmaps, dim_outs)):
            fmap = resize_video_to(fmap, target_size)
            outs.append(BlockVideo(dim_out, dtype=self.dtype,
                                   name=f'fmap_conv_{i}')(fmap))
        return jnp.concatenate((x, *outs), axis=-1)
