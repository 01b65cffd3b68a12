"""Pseudo-3D video denoising U-Net (flax.linen, NFHWC).

Capability parity with the reference `Unet3D`
(/root/reference/imagen_pytorch/imagen_video.py:1225-1941), TPU-first (see
video_blocks.py for the layout/fold strategy):

- temporal PEG + causal temporal attention at every resolution (reference :1504-1505,
  init :1449-1450, mid :1512-1513)
- per-resolution temporal strides with TemporalDownsample / TemporalPixelShuffleUpsample
  (reference :1432-1433,1506,1540)
- `ignore_time` trains the 3D net on still images (reference :1664,1743)
- conditioning on preceding/succeeding video frames: concatenated on the frame axis and
  cropped from the output (reference :1694-1718,1935-1939)
"""
from __future__ import annotations

import functools
import operator
from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange, repeat

from imagen_tpu.models.blocks import (
    CrossEmbedLayer,
    Downsample,
    LayerNorm,
    LearnedSinusoidalPosEmb,
    PerceiverResampler,
    PixelShuffleUpsample,
    TorchLayerNorm,
    Upsample,
)
from imagen_tpu.models.unet2d import DEFAULT_TEXT_EMBED_DIM
from imagen_tpu.models.video_blocks import (
    LinearAttentionTransformerBlockVideo,
    ResnetBlockVideo,
    SpatialConvIn3d,
    TemporalAttention,
    TemporalDownsample,
    TemporalPeg,
    TemporalPixelShuffleUpsample,
    TransformerBlockVideo,
    UpsampleCombinerVideo,
    VideoAttention,
    fold_frames,
    resize_video_to,
    unfold_frames,
)
from imagen_tpu.ops.tensor_utils import prob_mask_like
from imagen_tpu.utils.helpers import cast_tuple, default, exists

Dtype = Any
IntTuple = Union[int, Tuple[int, ...]]
BoolTuple = Union[bool, Tuple[bool, ...]]


class Unet3D(nn.Module):
    """The video denoiser. Attribute names mirror the reference kwargs (:1226-1278)."""
    dim: int = 128
    text_embed_dim: Optional[int] = DEFAULT_TEXT_EMBED_DIM
    num_resnet_blocks: IntTuple = 1
    cond_dim: Optional[int] = None
    num_image_tokens: int = 4   # kwarg-parity only: dead in the reference too
                                # (imagen_video.py:1233 declares, never reads it)
    num_time_tokens: int = 2
    learned_sinu_pos_emb_dim: int = 16
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    temporal_strides: IntTuple = 1
    cond_images_channels: int = 0
    channels: int = 3
    channels_out: Optional[int] = None
    attn_dim_head: int = 64
    attn_heads: int = 8
    ff_mult: float = 2.
    ff_time_token_shift: bool = True
    lowres_cond: bool = False
    layer_attns: BoolTuple = False
    layer_attns_depth: IntTuple = 1
    layer_attns_add_text_cond: bool = True
    attend_at_middle: bool = True
    time_rel_pos_bias_depth: int = 2
    time_causal_attn: bool = True
    layer_cross_attns: BoolTuple = True
    use_linear_attn: bool = False
    use_linear_cross_attn: bool = False
    cond_on_text: bool = True
    max_text_len: int = 256
    init_dim: Optional[int] = None
    init_conv_kernel_size: int = 7
    init_cross_embed: bool = True
    init_cross_embed_kernel_sizes: Tuple[int, ...] = (3, 7, 15)
    cross_embed_downsample: bool = False
    cross_embed_downsample_kernel_sizes: Tuple[int, ...] = (2, 4)
    attn_pool_text: bool = True
    attn_pool_num_latents: int = 32
    dropout: float = 0.
    memory_efficient: bool = False
    init_conv_to_final_conv_residual: bool = False
    use_global_context_attn: bool = True
    scale_skip_connection: bool = True
    final_resnet_block: bool = True
    final_conv_kernel_size: int = 3
    self_cond: bool = False
    combine_upsample_fmaps: bool = False
    pixel_shuffle_upsample: bool = True
    resize_mode: str = 'nearest'
    remat: bool = False                     # rematerialize blocks (jax.checkpoint)
    dtype: Dtype = jnp.float32

    is_video_unet: bool = True  # marker for Imagen.is_video detection

    @property
    def has_cond_image(self):
        return self.cond_images_channels > 0

    @property
    def channels_out_(self):
        return default(self.channels_out, self.channels)

    @property
    def total_temporal_divisor(self):
        strides = cast_tuple(self.temporal_strides, len(self.dim_mults))
        return functools.reduce(operator.mul, strides, 1)

    def forward_with_cond_scale(self, variables, x, time, *, cond_scale=1., **kwargs):
        """CFG forward (reference imagen_video.py:1643-1655); delegates to the
        batched implementation."""
        from imagen_tpu.diffusion.imagen import unet_forward_with_cond_scale
        return unet_forward_with_cond_scale(
            self, variables, x, time, cond_scale=cond_scale, **kwargs)

    def cast_model_parameters(self, *, lowres_cond, text_embed_dim, channels,
                              channels_out, cond_on_text):
        """reference imagen_video.py:1594-1619."""
        if (lowres_cond == self.lowres_cond
                and channels == self.channels
                and cond_on_text == self.cond_on_text
                and text_embed_dim == self.text_embed_dim
                and default(channels_out, channels) == self.channels_out_):
            return self
        return self.clone(
            lowres_cond=lowres_cond,
            text_embed_dim=text_embed_dim,
            channels=channels,
            channels_out=channels_out,
            cond_on_text=cond_on_text,
        )

    @nn.compact
    def __call__(
        self,
        x,
        time,
        *,
        lowres_cond_img=None,
        lowres_noise_times=None,
        text_embeds=None,
        text_mask=None,
        cond_images=None,
        cond_video_frames=None,
        post_cond_video_frames=None,
        self_cond=None,
        cond_drop_prob: float = 0.,
        force_text_drop_mask=None,
        ignore_time: bool = False,
        deterministic: bool = True,
    ):
        assert x.ndim == 5, 'input to 3d unet must be (batch, frames, h, w, channels)'
        assert self.attn_heads > 1

        batch_size, frames = x.shape[0], x.shape[1]
        dtype = self.dtype

        assert ignore_time or frames % self.total_temporal_divisor == 0, \
            f'frames {frames} must divide total temporal divisor {self.total_temporal_divisor}'

        # rematerialization: trade FLOPs for activation memory
        if self.remat:
            # ignore_time is a static python flag -> static_argnums (module is 0)
            ResnetBlockVideoK = nn.remat(ResnetBlockVideo, static_argnums=(4,))
        else:
            ResnetBlockVideoK = ResnetBlockVideo

        num_layers = len(self.dim_mults)
        init_dim = default(self.init_dim, self.dim)
        cond_dim = default(self.cond_dim, self.dim)
        time_cond_dim = self.dim * 4 * (2 if self.lowres_cond else 1)

        num_resnet_blocks = cast_tuple(self.num_resnet_blocks, num_layers)
        layer_attns = cast_tuple(self.layer_attns, num_layers)
        layer_attns_depth = cast_tuple(self.layer_attns_depth, num_layers)
        layer_cross_attns = cast_tuple(self.layer_cross_attns, num_layers)
        temporal_strides = cast_tuple(self.temporal_strides, num_layers)

        dims = [init_dim, *(self.dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))

        attn_kwargs = dict(heads=self.attn_heads, dim_head=self.attn_dim_head)
        # time_rel_pos_bias_depth threads into the temporal attention's
        # DynamicPositionBias MLP depth (reference imagen_video.py:1256,1416)
        temporal_attn_kwargs = dict(
            rel_pos_bias_mlp_depth=self.time_rel_pos_bias_depth, **attn_kwargs)
        skip_connect_scale = 1. if not self.scale_skip_connection else 2 ** -0.5

        # --- input concatenation ---------------------------------------------------------
        if self.self_cond:
            self_cond = default(self_cond, lambda: jnp.zeros_like(x))
            x = jnp.concatenate((x, self_cond), axis=-1)

        assert not (self.lowres_cond and not exists(lowres_cond_img))
        assert not (self.lowres_cond and not exists(lowres_noise_times))
        if exists(lowres_cond_img):
            x = jnp.concatenate((x, lowres_cond_img), axis=-1)

            # frame-prompt conditioning doubles channels of the cond frames so they
            # match (x ++ lowres) layout (reference :1685-1692)
            if exists(cond_video_frames):
                lowres_cond_img = jnp.concatenate(
                    (cond_video_frames, lowres_cond_img), axis=1)
                cond_video_frames = jnp.concatenate(
                    (cond_video_frames, cond_video_frames), axis=-1)
            if exists(post_cond_video_frames):
                lowres_cond_img = jnp.concatenate(
                    (lowres_cond_img, post_cond_video_frames), axis=1)
                post_cond_video_frames = jnp.concatenate(
                    (post_cond_video_frames, post_cond_video_frames), axis=-1)

        # prompt frames prepended / appended on the frame axis (reference :1694-1718)
        num_preceding_frames = 0
        if exists(cond_video_frames):
            n = cond_video_frames.shape[1]
            assert n % self.total_temporal_divisor == 0
            cond_video_frames = resize_video_to(cond_video_frames, x.shape[-2])
            x = jnp.concatenate((cond_video_frames.astype(x.dtype), x), axis=1)
            num_preceding_frames = n

        num_succeeding_frames = 0
        if exists(post_cond_video_frames):
            n = post_cond_video_frames.shape[1]
            assert n % self.total_temporal_divisor == 0
            post_cond_video_frames = resize_video_to(post_cond_video_frames, x.shape[-2])
            # APPENDED on the frame axis — consistent with the lowres concat above
            # and the end-of-video output crop below. The reference PREPENDS here
            # (imagen_video.py:1715) yet crops from the end (:1935-1939), silently
            # misaligning succeeding-frame conditioning with its crop; fixed, like
            # the other reference bugs listed in SURVEY.md §7.
            x = jnp.concatenate((x, post_cond_video_frames.astype(x.dtype)), axis=1)
            num_succeeding_frames = n

        if num_preceding_frames or num_succeeding_frames:
            # expose the [preceding | video | succeeding] frame layout so tests can
            # assert prompt-frame/crop alignment (test_unet3d.py)
            self.sow('intermediates', 'assembled_frames', x)

        assert not (self.has_cond_image ^ exists(cond_images))
        if exists(cond_images):
            assert cond_images.ndim == 4, \
                'cond_images must be (b, h, w, c); use cond_video_frames for video'
            assert cond_images.shape[-1] == self.cond_images_channels
            ci = repeat(cond_images, 'b h w c -> b f h w c', f=x.shape[1])
            ci = resize_video_to(ci, x.shape[-2], method=self.resize_mode)
            x = jnp.concatenate((ci.astype(x.dtype), x), axis=-1)

        # --- initial convolution ---------------------------------------------------------
        b = x.shape[0]
        if self.init_cross_embed:
            folded, _ = fold_frames(x)
            folded = CrossEmbedLayer(
                kernel_sizes=self.init_cross_embed_kernel_sizes, dim_out=init_dim,
                stride=1, dtype=dtype, name='init_conv')(folded)
            x = unfold_frames(folded, b)
        else:
            x = SpatialConvIn3d(init_dim, kernel=self.init_conv_kernel_size,
                                dtype=dtype, name='init_conv')(x)

        if not ignore_time:
            x = TemporalPeg(causal=self.time_causal_attn, dtype=dtype,
                            name='init_temporal_peg')(x)
            x = TemporalAttention(causal=self.time_causal_attn, dtype=dtype,
                                  name='init_temporal_attn', **temporal_attn_kwargs)(x)

        init_conv_residual = x if self.init_conv_to_final_conv_residual else None

        # --- time conditioning -----------------------------------------------------------
        def time_mlp(t_in, prefix):
            h = LearnedSinusoidalPosEmb(self.learned_sinu_pos_emb_dim,
                                        name=f'{prefix}_sinu')(t_in)
            h = nn.Dense(time_cond_dim, dtype=dtype,
                         name=f'{prefix}_hiddens')(h.astype(dtype))
            h = jax.nn.silu(h)
            tok = nn.Dense(cond_dim * self.num_time_tokens, dtype=dtype,
                           name=f'{prefix}_tokens')(h)
            tok = rearrange(tok, 'b (r d) -> b r d', r=self.num_time_tokens)
            cnd = nn.Dense(time_cond_dim, dtype=dtype, name=f'{prefix}_cond')(h)
            return cnd, tok

        t, time_tokens = time_mlp(time, 'to_time')

        if self.lowres_cond:
            lowres_t, lowres_time_tokens = time_mlp(lowres_noise_times, 'to_lowres_time')
            t = t + lowres_t
            time_tokens = jnp.concatenate((time_tokens, lowres_time_tokens), axis=-2)

        # --- text conditioning (identical machinery to Unet2D) ---------------------------
        text_tokens = None
        if exists(text_embeds) and self.cond_on_text:
            assert exists(self.text_embed_dim)

            if exists(force_text_drop_mask):
                text_keep_mask = jnp.logical_not(force_text_drop_mask)
            else:
                if cond_drop_prob in (0., 1.):
                    keep_key = None
                else:
                    keep_key = self.make_rng('cond_drop')
                text_keep_mask = prob_mask_like(
                    keep_key, (batch_size,), 1 - cond_drop_prob)
            text_keep_mask_embed = text_keep_mask[:, None, None]
            text_keep_mask_hidden = text_keep_mask[:, None]

            text_tokens = nn.Dense(cond_dim, dtype=dtype,
                                   name='text_to_cond')(text_embeds.astype(dtype))
            text_tokens = text_tokens[:, :self.max_text_len]
            if exists(text_mask):
                text_mask = text_mask[:, :self.max_text_len]

            remainder = self.max_text_len - text_tokens.shape[1]
            if remainder > 0:
                text_tokens = jnp.pad(text_tokens, ((0, 0), (0, remainder), (0, 0)))
                if exists(text_mask):
                    text_mask = jnp.pad(text_mask, ((0, 0), (0, remainder)),
                                        constant_values=False)

            if exists(text_mask):
                text_keep_mask_embed = text_mask[:, :, None] & text_keep_mask_embed

            null_text_embed = self.param(
                'null_text_embed', nn.initializers.normal(1.0),
                (1, self.max_text_len, cond_dim), jnp.float32)
            text_tokens = jnp.where(
                text_keep_mask_embed, text_tokens,
                null_text_embed.astype(text_tokens.dtype))

            if self.attn_pool_text:
                text_tokens = PerceiverResampler(
                    depth=2, dim_head=self.attn_dim_head, heads=self.attn_heads,
                    num_latents=self.attn_pool_num_latents, dtype=dtype,
                    name='attn_pool')(text_tokens)

            mean_pooled = jnp.mean(text_tokens, axis=-2)
            # torch nn.LayerNorm (scale+bias, mean-subtracting) per reference
            # imagen_video.py:1399 — matches unet2d's text_hidden_norm
            th = TorchLayerNorm(dtype=dtype, name='text_hidden_norm')(mean_pooled)
            th = nn.Dense(time_cond_dim, dtype=dtype, name='text_hidden_proj1')(th)
            th = jax.nn.silu(th)
            text_hiddens = nn.Dense(time_cond_dim, dtype=dtype,
                                    name='text_hidden_proj2')(th)

            null_text_hidden = self.param(
                'null_text_hidden', nn.initializers.normal(1.0),
                (1, time_cond_dim), jnp.float32)
            text_hiddens = jnp.where(
                text_keep_mask_hidden, text_hiddens,
                null_text_hidden.astype(text_hiddens.dtype))

            t = t + text_hiddens

        c = time_tokens if not exists(text_tokens) else jnp.concatenate(
            (time_tokens, text_tokens), axis=-2)
        c = TorchLayerNorm(dtype=dtype, name='norm_cond')(c)

        # --- layer machinery -------------------------------------------------------------
        def make_downsample(dim_out, name):
            def apply(x):
                folded, b_ = fold_frames(x)
                if self.cross_embed_downsample:
                    folded = CrossEmbedLayer(
                        kernel_sizes=self.cross_embed_downsample_kernel_sizes,
                        dim_out=dim_out, stride=2, dtype=dtype, name=name)(folded)
                else:
                    folded = Downsample(dim_out=dim_out, dtype=dtype,
                                        name=name)(folded)
                return unfold_frames(folded, b_)
            return apply

        def make_upsample(dim_out, name):
            klass = PixelShuffleUpsample if self.pixel_shuffle_upsample else Upsample

            def apply(x):
                folded, b_ = fold_frames(x)
                folded = klass(dim_out=dim_out, dtype=dtype, name=name)(folded)
                return unfold_frames(folded, b_)
            return apply

        def transformer_for(layer_attn, depth, name):
            if layer_attn:
                return TransformerBlockVideo(
                    depth=depth, ff_mult=self.ff_mult,
                    ff_time_token_shift=self.ff_time_token_shift,
                    context_dim=cond_dim, dtype=dtype, name=name,
                    **attn_kwargs), False
            if self.use_linear_attn:
                return LinearAttentionTransformerBlockVideo(
                    depth=depth, ff_mult=self.ff_mult,
                    ff_time_token_shift=self.ff_time_token_shift,
                    context_dim=cond_dim, dtype=dtype, name=name,
                    **attn_kwargs), True
            return None, False

        if self.memory_efficient:
            x = ResnetBlockVideoK(
                dim_out=init_dim, time_cond_dim=time_cond_dim,
                use_gca=self.use_global_context_attn, dtype=dtype,
                attn_dim_head=self.attn_dim_head, attn_heads=self.attn_heads,
                name='init_resnet_block')(x, t, None, ignore_time)

        hiddens = []
        for ind, ((dim_in, dim_out), nblocks, layer_attn, attn_depth,
                  layer_cross_attn, temporal_stride) in enumerate(zip(
                      in_out, num_resnet_blocks, layer_attns, layer_attns_depth,
                      layer_cross_attns, temporal_strides)):
            is_last = ind >= (num_layers - 1)
            layer_use_linear_cross_attn = (
                not layer_cross_attn and self.use_linear_cross_attn)
            layer_cond_dim = cond_dim if (
                layer_cross_attn or layer_use_linear_cross_attn) else None

            if self.memory_efficient:
                x = make_downsample(dim_out, f'down_{ind}_pre')(x)
                current_dim = dim_out
            else:
                current_dim = dim_in

            x = ResnetBlockVideoK(
                dim_out=current_dim, cond_dim=layer_cond_dim,
                linear_attn=layer_use_linear_cross_attn,
                time_cond_dim=time_cond_dim, dtype=dtype,
                attn_dim_head=self.attn_dim_head, attn_heads=self.attn_heads,
                name=f'down_{ind}_init_block')(
                    x, t, c, ignore_time)

            for j in range(nblocks):
                x = ResnetBlockVideoK(
                    dim_out=current_dim, time_cond_dim=time_cond_dim,
                    use_gca=self.use_global_context_attn, dtype=dtype,
                    attn_dim_head=self.attn_dim_head, attn_heads=self.attn_heads,
                    name=f'down_{ind}_block_{j}')(
                        x, t, None, ignore_time)
                hiddens.append(x)

            tb, tb_linear = transformer_for(
                layer_attn, attn_depth, f'down_{ind}_attn')
            if exists(tb):
                x = tb(x, context=c, **(
                    dict(deterministic=deterministic) if tb_linear else {}))

            if not ignore_time:
                x = TemporalPeg(causal=self.time_causal_attn, dtype=dtype,
                                name=f'down_{ind}_temporal_peg')(x)
                x = TemporalAttention(causal=self.time_causal_attn, dtype=dtype,
                                      name=f'down_{ind}_temporal_attn',
                                      **temporal_attn_kwargs)(x)

            hiddens.append(x)

            if temporal_stride > 1 and not ignore_time:
                x = TemporalDownsample(
                    dim_out=current_dim, stride=temporal_stride, dtype=dtype,
                    name=f'down_{ind}_temporal_down')(x)

            if not self.memory_efficient:
                if not is_last:
                    x = make_downsample(dim_out, f'down_{ind}_post')(x)
                else:
                    a = SpatialConvIn3d(dim_out, kernel=3, dtype=dtype,
                                        name=f'down_{ind}_post_a')(x)
                    bb = nn.Dense(dim_out, dtype=dtype,
                                  name=f'down_{ind}_post_b')(x)
                    x = a + bb

        # --- middle ----------------------------------------------------------------------
        mid_dim = dims[-1]
        # NB: the reference constructs mid_block1/2 as plain ResnetBlock
        # (imagen_video.py:1507,1511), NOT via the attn-kwarg'd klass, so their
        # cross-attention uses the CrossAttention defaults (dim_head=64, heads=8)
        # regardless of attn_dim_head/attn_heads — mirrored exactly for
        # weight-level parity (tools/port_weights_video.py), same as unet2d
        x = ResnetBlockVideoK(
            dim_out=mid_dim, cond_dim=cond_dim, time_cond_dim=time_cond_dim,
            dtype=dtype, name='mid_block1')(
                x, t, c, ignore_time)

        if self.attend_at_middle:
            f_m, h_m, w_m = x.shape[1], x.shape[2], x.shape[3]
            tokens = rearrange(x, 'b f x y c -> b (f x y) c')
            tokens = VideoAttention(dtype=dtype, name='mid_attn',
                                    **attn_kwargs)(tokens) + tokens
            x = rearrange(tokens, 'b (f x y) c -> b f x y c', f=f_m, x=h_m, y=w_m)

        if not ignore_time:
            x = TemporalPeg(causal=self.time_causal_attn, dtype=dtype,
                            name='mid_temporal_peg')(x)
            x = TemporalAttention(causal=self.time_causal_attn, dtype=dtype,
                                  name='mid_temporal_attn', **temporal_attn_kwargs)(x)

        x = ResnetBlockVideoK(
            dim_out=mid_dim, cond_dim=cond_dim, time_cond_dim=time_cond_dim,
            dtype=dtype, name='mid_block2')(
                x, t, c, ignore_time)

        # --- upsample path ---------------------------------------------------------------
        def add_skip(x):
            return jnp.concatenate((x, hiddens.pop() * skip_connect_scale), axis=-1)

        skip_dims_check = None  # skip dims implied by hiddens stack
        up_hiddens = []
        upsample_fmap_dims = []
        rev = lambda tup: tuple(reversed(tup))
        for ind, ((dim_in, dim_out), nblocks, layer_attn, attn_depth,
                  layer_cross_attn, temporal_stride) in enumerate(zip(
                      rev(tuple(in_out)), rev(num_resnet_blocks), rev(layer_attns),
                      rev(layer_attns_depth), rev(layer_cross_attns),
                      rev(temporal_strides))):
            is_last = ind == (num_layers - 1)
            layer_use_linear_cross_attn = (
                not layer_cross_attn and self.use_linear_cross_attn)
            layer_cond_dim = cond_dim if (
                layer_cross_attn or layer_use_linear_cross_attn) else None
            upsample_fmap_dims.append(dim_out)

            if temporal_stride > 1 and not ignore_time:
                x = TemporalPixelShuffleUpsample(
                    dim_out=x.shape[-1], stride=temporal_stride, dtype=dtype,
                    name=f'up_{ind}_temporal_up')(x)

            x = add_skip(x)
            x = ResnetBlockVideoK(
                dim_out=dim_out, cond_dim=layer_cond_dim,
                linear_attn=layer_use_linear_cross_attn,
                time_cond_dim=time_cond_dim, dtype=dtype,
                attn_dim_head=self.attn_dim_head, attn_heads=self.attn_heads,
                name=f'up_{ind}_init_block')(
                    x, t, c, ignore_time)

            for j in range(nblocks):
                x = add_skip(x)
                x = ResnetBlockVideoK(
                    dim_out=dim_out, time_cond_dim=time_cond_dim,
                    use_gca=self.use_global_context_attn, dtype=dtype,
                    attn_dim_head=self.attn_dim_head, attn_heads=self.attn_heads,
                    name=f'up_{ind}_block_{j}')(
                        x, t, None, ignore_time)

            tb, tb_linear = transformer_for(
                layer_attn, attn_depth, f'up_{ind}_attn')
            if exists(tb):
                x = tb(x, context=c, **(
                    dict(deterministic=deterministic) if tb_linear else {}))

            if not ignore_time:
                x = TemporalPeg(causal=self.time_causal_attn, dtype=dtype,
                                name=f'up_{ind}_temporal_peg')(x)
                x = TemporalAttention(causal=self.time_causal_attn, dtype=dtype,
                                      name=f'up_{ind}_temporal_attn',
                                      **temporal_attn_kwargs)(x)

            up_hiddens.append(x)

            if not is_last or self.memory_efficient:
                x = make_upsample(dim_in, f'up_{ind}_upsample')(x)

        x = UpsampleCombinerVideo(
            dim=self.dim, enabled=self.combine_upsample_fmaps,
            dim_ins=tuple(upsample_fmap_dims), dim_outs=self.dim, dtype=dtype,
            name='upsample_combiner')(x, fmaps=tuple(up_hiddens))

        if exists(init_conv_residual):
            x = jnp.concatenate((x, init_conv_residual), axis=-1)

        if self.final_resnet_block:
            x = ResnetBlockVideoK(
                dim_out=self.dim, time_cond_dim=time_cond_dim, use_gca=True,
                dtype=dtype, attn_dim_head=self.attn_dim_head,
                attn_heads=self.attn_heads, name='final_res_block')(
                    x, t, None, ignore_time)

        if exists(lowres_cond_img):
            x = jnp.concatenate((x, lowres_cond_img), axis=-1)

        # zero-init final conv (reference :1588-1590)
        folded, b_ = fold_frames(x)
        k = self.final_conv_kernel_size
        out = nn.Conv(self.channels_out_, (k, k), padding='SAME', dtype=dtype,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name='final_conv')(folded)
        out = unfold_frames(out, b_)

        if num_preceding_frames > 0:
            out = out[:, num_preceding_frames:]
        if num_succeeding_frames > 0:
            out = out[:, :-num_succeeding_frames]

        return out
