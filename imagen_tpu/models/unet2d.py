"""2D text-conditional denoising U-Net (flax.linen, NHWC).

Capability parity with the reference `Unet`
(/root/reference/imagen_pytorch/imagen_pytorch.py:1112-1725) including the full init
config surface (:1113-1161), redesigned TPU-first:

- NHWC layout; all 1x1 convs are trailing-axis Denses (MXU-native).
- Pure module: CFG text dropout uses the 'cond_drop' rng collection only when
  0 < cond_drop_prob < 1 (training); sampling uses the static 0/1 branches so the whole
  sampler stays a single compiled scan without RNG plumbing.
- Static config drives wiring; `cast_model_parameters` (reference :1446-1470) is
  `Module.clone` over the same attribute names.
- The reference's `cross_embed_downsample=True` wiring raises TypeError upstream
  (partial(CrossEmbedLayer, kernel_sizes=...) called positionally, :1316-1319 vs
  :1051-1056); here it is implemented working.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange

from imagen_tpu.models.blocks import (
    CrossEmbedLayer,
    Downsample,
    LayerNorm,
    LearnedSinusoidalPosEmb,
    LinearAttentionTransformerBlock,
    PerceiverResampler,
    PixelShuffleUpsample,
    ResnetBlock,
    TorchLayerNorm,
    TransformerBlock,
    Upsample,
    UpsampleCombiner,
)
from imagen_tpu.ops.tensor_utils import prob_mask_like, resize_image_to
from imagen_tpu.utils.helpers import cast_tuple, default, exists

Dtype = Any
IntTuple = Union[int, Tuple[int, ...]]
BoolTuple = Union[bool, Tuple[bool, ...]]

DEFAULT_TEXT_EMBED_DIM = 768  # t5-v1_1-base d_model (reference t5.py:21, get_encoded_dim)


class Unet(nn.Module):
    """The 2D denoiser. Attribute names mirror the reference kwargs (:1113-1161)."""
    dim: int = 128
    text_embed_dim: Optional[int] = DEFAULT_TEXT_EMBED_DIM
    num_resnet_blocks: IntTuple = 1
    cond_dim: Optional[int] = None
    num_image_tokens: int = 4
    num_time_tokens: int = 2
    learned_sinu_pos_emb_dim: int = 16
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    cond_images_channels: int = 0
    channels: int = 3
    channels_out: Optional[int] = None
    attn_dim_head: int = 64
    attn_heads: int = 8
    ff_mult: float = 2.
    lowres_cond: bool = False               # cascading diffusion lowres conditioning
    layer_attns: BoolTuple = True
    layer_attns_depth: IntTuple = 1
    layer_mid_attns_depth: int = 1
    layer_attns_add_text_cond: bool = True  # condition self-attn blocks on text (App. D.3.1)
    attend_at_middle: bool = True
    layer_cross_attns: BoolTuple = True
    use_linear_attn: BoolTuple = False
    use_linear_cross_attn: BoolTuple = False
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
    resize_mode: str = 'nearest'
    combine_upsample_fmaps: bool = False    # unet-squared style upsample fmap combining
    pixel_shuffle_upsample: bool = True
    remat: Any = False                      # rematerialize blocks (jax.checkpoint):
                                            # False | True (save nothing) |
                                            # 'save_convs' (selective: keep the
                                            # 3x3-conv / attention / FF outputs,
                                            # recompute only the cheap
                                            # norm/FiLM/SiLU elementwise — ~the
                                            # memory win at a fraction of the
                                            # recompute FLOPs)
    dtype: Dtype = jnp.float32

    @property
    def has_cond_image(self):
        return self.cond_images_channels > 0

    @property
    def channels_out_(self):
        return default(self.channels_out, self.channels)

    def forward_with_cond_scale(self, variables, x, time, *, cond_scale=1., **kwargs):
        """CFG forward (reference :1510-1522); see
        imagen_tpu.diffusion.imagen.unet_forward_with_cond_scale for the batched
        implementation this delegates to."""
        from imagen_tpu.diffusion.imagen import unet_forward_with_cond_scale
        return unet_forward_with_cond_scale(
            self, variables, x, time, cond_scale=cond_scale, **kwargs)

    def cast_model_parameters(self, *, lowres_cond, text_embed_dim, channels,
                              channels_out, cond_on_text):
        """Re-clone with cascade-corrected conditioning config; reference :1446-1470."""
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
        self_cond=None,
        cond_drop_prob: float = 0.,
        force_text_drop_mask=None,
        deterministic: bool = True,
    ):
        """`force_text_drop_mask` (b,) bool overrides the CFG bernoulli draw — True
        drops to null embeddings. Enables batched CFG: conditional and null halves run
        in ONE doubled-batch forward (imagen_tpu.diffusion.imagen cond-scale path)."""
        assert self.attn_heads > 1, 'you need more than 1 attention head'
        batch_size = x.shape[0]
        dtype = self.dtype

        # rematerialization: trade FLOPs for activation memory (new capability;
        # the reference relies on gradient-checkpoint-free training)
        if self.remat:
            remat_kwargs = {}
            if self.remat == 'save_convs':
                remat_kwargs['policy'] = (
                    jax.checkpoint_policies.save_only_these_names(
                        'conv_out', 'attn_out', 'ff_out'))
            ResnetBlockK = nn.remat(ResnetBlock, **remat_kwargs)
            TransformerBlockK = nn.remat(TransformerBlock, **remat_kwargs)
            LinearAttentionTransformerBlockK = nn.remat(
                LinearAttentionTransformerBlock, **remat_kwargs)
        else:
            ResnetBlockK = ResnetBlock
            TransformerBlockK = TransformerBlock
            LinearAttentionTransformerBlockK = LinearAttentionTransformerBlock

        num_layers = len(self.dim_mults)
        init_dim = default(self.init_dim, self.dim)
        cond_dim = default(self.cond_dim, self.dim)
        time_cond_dim = self.dim * 4 * (2 if self.lowres_cond else 1)

        num_resnet_blocks = cast_tuple(self.num_resnet_blocks, num_layers)
        layer_attns = cast_tuple(self.layer_attns, num_layers)
        layer_attns_depth = cast_tuple(self.layer_attns_depth, num_layers)
        layer_cross_attns = cast_tuple(self.layer_cross_attns, num_layers)
        use_linear_attn = cast_tuple(self.use_linear_attn, num_layers)
        use_linear_cross_attn = cast_tuple(self.use_linear_cross_attn, num_layers)

        dims = [init_dim, *(self.dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))

        attn_kwargs = dict(heads=self.attn_heads, dim_head=self.attn_dim_head)
        skip_connect_scale = 1. if not self.scale_skip_connection else 2 ** -0.5

        # --- input channel concatenation -------------------------------------------------
        # self-conditioning (reference :1541-1543)
        if self.self_cond:
            self_cond = default(self_cond, lambda: jnp.zeros_like(x))
            x = jnp.concatenate((x, self_cond), axis=-1)

        # lowres conditioning (reference :1546-1551)
        assert not (self.lowres_cond and not exists(lowres_cond_img)), \
            'low resolution conditioning image must be present'
        assert not (self.lowres_cond and not exists(lowres_noise_times)), \
            'low resolution conditioning noise time must be present'
        if exists(lowres_cond_img):
            x = jnp.concatenate((x, lowres_cond_img), axis=-1)

        # image conditioning (reference :1555-1560); resized and prepended
        assert not (self.has_cond_image ^ exists(cond_images)), \
            'cond_images must be supplied iff the unet was configured for them'
        if exists(cond_images):
            assert cond_images.shape[-1] == self.cond_images_channels
            cond_images = resize_image_to(
                cond_images, x.shape[-2], method=self.resize_mode)
            x = jnp.concatenate((cond_images.astype(x.dtype), x), axis=-1)

        # --- initial convolution (reference :1564) ---------------------------------------
        if self.init_cross_embed:
            x = CrossEmbedLayer(
                kernel_sizes=self.init_cross_embed_kernel_sizes, dim_out=init_dim,
                stride=1, dtype=dtype, name='init_conv')(x)
        else:
            k = self.init_conv_kernel_size
            x = nn.Conv(init_dim, (k, k), padding='SAME', dtype=dtype,
                        name='init_conv')(x)

        init_conv_residual = x if self.init_conv_to_final_conv_residual else None

        # --- time conditioning (reference :1216-1230, :1573-1578) ------------------------
        def time_mlp(t_in, prefix):
            h = LearnedSinusoidalPosEmb(self.learned_sinu_pos_emb_dim,
                                        name=f'{prefix}_sinu')(t_in)
            h = nn.Dense(time_cond_dim, dtype=dtype, name=f'{prefix}_hiddens')(h.astype(dtype))
            h = jax.nn.silu(h)                                      # time_hiddens
            tok = nn.Dense(cond_dim * self.num_time_tokens, dtype=dtype,
                           name=f'{prefix}_tokens')(h)
            tok = rearrange(tok, 'b (r d) -> b r d', r=self.num_time_tokens)
            cnd = nn.Dense(time_cond_dim, dtype=dtype, name=f'{prefix}_cond')(h)
            return cnd, tok

        t, time_tokens = time_mlp(time, 'to_time')

        # lowres aug-noise time conditioning (reference :1238-1252, :1583-1589)
        if self.lowres_cond:
            lowres_t, lowres_time_tokens = time_mlp(lowres_noise_times, 'to_lowres_time')
            t = t + lowres_t
            time_tokens = jnp.concatenate((time_tokens, lowres_time_tokens), axis=-2)

        # --- text conditioning (reference :1594-1652) ------------------------------------
        text_tokens = None
        if exists(text_embeds) and self.cond_on_text:
            assert exists(self.text_embed_dim)

            # CFG conditional dropout mask
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

            # pad/truncate to a fixed max_text_len (static shapes for jit)
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
                text_keep_mask_embed, text_tokens, null_text_embed.astype(text_tokens.dtype))

            if self.attn_pool_text:
                text_tokens = PerceiverResampler(
                    depth=2, dim_head=self.attn_dim_head, heads=self.attn_heads,
                    num_latents=self.attn_pool_num_latents, dtype=dtype,
                    name='attn_pool')(text_tokens)

            # non-attention text conditioning summed into t (reference :1640-1652)
            # NB: the reference's to_text_non_attn_cond opens with a plain torch
            # nn.LayerNorm (:1283), NOT its custom stable LayerNorm — mirrored for
            # weight-level parity.
            mean_pooled = jnp.mean(text_tokens, axis=-2)
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

        # main conditioning tokens (reference :1656-1660)
        c = time_tokens if not exists(text_tokens) else jnp.concatenate(
            (time_tokens, text_tokens), axis=-2)
        c = TorchLayerNorm(dtype=dtype, name='norm_cond')(c)

        # --- downsample path (reference :1352-1374, :1671-1685) --------------------------
        def make_downsample(dim_out, name):
            if self.cross_embed_downsample:
                return CrossEmbedLayer(
                    kernel_sizes=self.cross_embed_downsample_kernel_sizes,
                    dim_out=dim_out, stride=2, dtype=dtype, name=name)
            return Downsample(dim_out=dim_out, dtype=dtype, name=name)

        # NB: reference declares layer_attns_add_text_cond (:1135) but never reads it —
        # transformer blocks always receive context_dim=cond_dim and the cond tokens c
        # (:1367,:1683). We keep the kwarg for config parity and mirror that behavior.
        def transformer_for(layer_attn, layer_use_linear_attn, depth, name):
            if layer_attn:
                return TransformerBlockK(
                    depth=depth, ff_mult=self.ff_mult, context_dim=cond_dim,
                    dtype=dtype, name=name, **attn_kwargs), False
            if layer_use_linear_attn:
                return LinearAttentionTransformerBlockK(
                    depth=depth, ff_mult=self.ff_mult, context_dim=cond_dim,
                    dtype=dtype, name=name, **attn_kwargs), True
            return None, False

        # initial resnet block for the memory-efficient variant (reference :1331)
        if self.memory_efficient:
            x = ResnetBlockK(
                dim_out=init_dim, time_cond_dim=time_cond_dim,
                use_gca=self.use_global_context_attn, dtype=dtype,
                attn_dim_head=self.attn_dim_head, attn_heads=self.attn_heads,
                name='init_resnet_block')(x, time_emb=t)

        hiddens = []
        skip_dims = []
        for ind, ((dim_in, dim_out), nblocks, layer_attn, attn_depth, layer_cross_attn,
                  lin_attn, lin_cross) in enumerate(zip(
                      in_out, num_resnet_blocks, layer_attns, layer_attns_depth,
                      layer_cross_attns, use_linear_attn, use_linear_cross_attn)):
            is_last = ind >= (num_layers - 1)
            layer_cond_dim = cond_dim if (layer_cross_attn or lin_cross) else None

            if self.memory_efficient:       # pre-downsample
                x = make_downsample(dim_out, f'down_{ind}_pre')(x)
                current_dim = dim_out
            else:
                current_dim = dim_in
            skip_dims.append(current_dim)

            x = ResnetBlockK(
                dim_out=current_dim, cond_dim=layer_cond_dim, linear_attn=lin_cross,
                time_cond_dim=time_cond_dim, dtype=dtype,
                attn_dim_head=self.attn_dim_head, attn_heads=self.attn_heads,
                name=f'down_{ind}_init_block')(x, time_emb=t, cond=c)

            for j in range(nblocks):
                x = ResnetBlockK(
                    dim_out=current_dim, time_cond_dim=time_cond_dim,
                    use_gca=self.use_global_context_attn, dtype=dtype,
                    attn_dim_head=self.attn_dim_head, attn_heads=self.attn_heads,
                    name=f'down_{ind}_block_{j}')(x, time_emb=t)
                hiddens.append(x)

            tb, tb_linear = transformer_for(
                layer_attn, lin_attn, attn_depth, f'down_{ind}_attn')
            if exists(tb):
                x = tb(x, context=c, **(
                    dict(deterministic=deterministic) if tb_linear else {}))
            hiddens.append(x)

            if not self.memory_efficient:   # post-downsample
                if not is_last:
                    x = make_downsample(dim_out, f'down_{ind}_post')(x)
                else:
                    # Parallel(Conv3x3, Conv1x1) channel change at full res (reference :1370)
                    a = nn.Conv(dim_out, (3, 3), padding='SAME', dtype=dtype,
                                name=f'down_{ind}_post_a')(x)
                    b = nn.Dense(dim_out, dtype=dtype, name=f'down_{ind}_post_b')(x)
                    x = a + b

        # --- middle (reference :1378-1382, :1687-1692) -----------------------------------
        # NB: the reference constructs mid_block1/2 as plain ResnetBlock (:1381-1383),
        # NOT via `resnet_klass = partial(ResnetBlock, **attn_kwargs)` (:1299), so their
        # cross-attention uses the CrossAttention defaults (dim_head=64, heads=8)
        # regardless of the unet's attn_dim_head/attn_heads. Mirrored exactly for
        # weight-level parity (tools/port_weights.py).
        mid_dim = dims[-1]
        x = ResnetBlockK(
            dim_out=mid_dim, cond_dim=cond_dim, time_cond_dim=time_cond_dim,
            dtype=dtype, name='mid_block1')(x, time_emb=t, cond=c)
        if self.attend_at_middle:
            x = TransformerBlockK(
                depth=self.layer_mid_attns_depth, dtype=dtype,
                name='mid_attn', **attn_kwargs)(x)
        x = ResnetBlockK(
            dim_out=mid_dim, cond_dim=cond_dim, time_cond_dim=time_cond_dim,
            dtype=dtype, name='mid_block2')(x, time_emb=t, cond=c)

        # --- upsample path (reference :1386-1416, :1694-1708) ----------------------------
        upsample_klass = PixelShuffleUpsample if self.pixel_shuffle_upsample else Upsample

        def add_skip(x):
            return jnp.concatenate(
                (x, hiddens.pop() * skip_connect_scale), axis=-1)

        up_hiddens = []
        upsample_fmap_dims = []
        rev = lambda tup: tuple(reversed(tup))
        for ind, ((dim_in, dim_out), nblocks, layer_attn, attn_depth, layer_cross_attn,
                  lin_attn, lin_cross) in enumerate(zip(
                      rev(tuple(in_out)), rev(num_resnet_blocks), rev(layer_attns),
                      rev(layer_attns_depth), rev(layer_cross_attns),
                      rev(use_linear_attn), rev(use_linear_cross_attn))):
            is_last = ind == (num_layers - 1)
            layer_cond_dim = cond_dim if (layer_cross_attn or lin_cross) else None
            upsample_fmap_dims.append(dim_out)

            x = add_skip(x)
            x = ResnetBlockK(
                dim_out=dim_out, cond_dim=layer_cond_dim, linear_attn=lin_cross,
                time_cond_dim=time_cond_dim, dtype=dtype,
                attn_dim_head=self.attn_dim_head, attn_heads=self.attn_heads,
                name=f'up_{ind}_init_block')(x, time_emb=t, cond=c)

            for j in range(nblocks):
                x = add_skip(x)
                x = ResnetBlockK(
                    dim_out=dim_out, time_cond_dim=time_cond_dim,
                    use_gca=self.use_global_context_attn, dtype=dtype,
                    attn_dim_head=self.attn_dim_head, attn_heads=self.attn_heads,
                    name=f'up_{ind}_block_{j}')(x, time_emb=t)

            tb, tb_linear = transformer_for(
                layer_attn, lin_attn, attn_depth, f'up_{ind}_attn')
            if exists(tb):
                x = tb(x, context=c, **(
                    dict(deterministic=deterministic) if tb_linear else {}))
            up_hiddens.append(x)

            if not is_last or self.memory_efficient:
                x = upsample_klass(dim_out=dim_in, dtype=dtype,
                                   name=f'up_{ind}_upsample')(x)

        # combine upsample fmaps (reference :1420-1425, :1712)
        x = UpsampleCombiner(
            dim=self.dim, enabled=self.combine_upsample_fmaps,
            dim_ins=tuple(upsample_fmap_dims), dim_outs=self.dim, dtype=dtype,
            name='upsample_combiner')(x, fmaps=tuple(up_hiddens))

        # init-conv residual (reference :1429-1430, :1716-1717)
        if exists(init_conv_residual):
            x = jnp.concatenate((x, init_conv_residual), axis=-1)

        # final resnet block (reference :1434, :1719-1721)
        if self.final_resnet_block:
            x = ResnetBlockK(
                dim_out=self.dim, time_cond_dim=time_cond_dim, use_gca=True,
                dtype=dtype, attn_dim_head=self.attn_dim_head,
                attn_heads=self.attn_heads, name='final_res_block')(x, time_emb=t)

        if exists(lowres_cond_img):
            x = jnp.concatenate((x, lowres_cond_img), axis=-1)

        # zero-init final conv (reference :1438-1441)
        k = self.final_conv_kernel_size
        out = nn.Conv(
            self.channels_out_, (k, k), padding='SAME', dtype=dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name='final_conv')(x)
        return out


class NullUnet(nn.Module):
    """Identity placeholder so a cascade stage can be skipped;
    reference imagen_pytorch.py:1729-1739.

    Unlike the reference (whose NullUnet pins lowres_cond=False and therefore trips
    Imagen's cascade check when placed after the first stage), cast_model_parameters
    here records the requested lowres_cond so a NullUnet is valid at any position.
    """
    lowres_cond: bool = False
    channels: int = 3
    self_cond: bool = False
    cond_images_channels: int = 0

    @property
    def has_cond_image(self):
        return False

    @property
    def channels_out_(self):
        return self.channels

    def cast_model_parameters(self, *, lowres_cond=False, **kwargs):
        if lowres_cond == self.lowres_cond:
            return self
        return self.clone(lowres_cond=lowres_cond)

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        # a dummy param so the pytree is non-empty (keeps optimizer plumbing uniform)
        self.param('dummy', nn.initializers.zeros, (1,), jnp.float32)
        return x


# --- preset unets matching the Imagen paper appendix (reference :1741-1783) -------------

def BaseUnet64(**kwargs):
    base = dict(
        dim=512,
        dim_mults=(1, 2, 3, 4),
        num_resnet_blocks=3,
        layer_attns=(False, True, True, True),
        layer_cross_attns=(False, True, True, True),
        attn_heads=8,
        ff_mult=2.,
        memory_efficient=False,
    )
    return Unet(**{**base, **kwargs})


def SRUnet256(**kwargs):
    base = dict(
        dim=128,
        dim_mults=(1, 2, 4, 8),
        num_resnet_blocks=(2, 4, 8, 8),
        layer_attns=(False, False, False, True),
        layer_cross_attns=(False, False, False, True),
        attn_heads=8,
        ff_mult=2.,
        memory_efficient=True,
    )
    return Unet(**{**base, **kwargs})


def SRUnet1024(**kwargs):
    base = dict(
        dim=128,
        dim_mults=(1, 2, 4, 8),
        num_resnet_blocks=(2, 4, 8, 8),
        layer_attns=False,
        layer_cross_attns=(False, False, False, True),
        attn_heads=8,
        ff_mult=2.,
        memory_efficient=True,
    )
    return Unet(**{**base, **kwargs})
