"""Port reference PyTorch `Unet3D` weights (state_dict) into imagen_tpu flax variables.

Video counterpart of tools/port_weights.py, for the cross-framework parity
harness (tests/test_reference_parity_video.py). Reference module tree:
/root/reference/imagen_pytorch/imagen_video.py:1225-1941 (positional
ModuleLists; Residual/RearrangeTimeCentric wrappers add `.fn` path segments).

Layout rules on top of the 2D port's:
- PseudoConv3d spatial (O, I, kh, kw)      -> (kh, kw, I, O)
- PseudoConv3d temporal (O, I, k)          -> (k, I, O)
- Conv3d with unit time (O, I, 1, K, K)    -> (K, K, I, O)
- Conv3d 1x1x1 (O, I, 1, 1, 1)             -> Dense (I, O)
- temporal PEG depthwise (C, 1, 3, 1, 1)   -> flax 1D depthwise (3, 1, C)
- ChanLayerNorm g (1, C, 1, 1, 1)          -> (C,)
- video ChanFeedForward Sequential indices are 0,1,4,5 (TimeTokenShift sits at
  3), unlike the 2D FeedForward's 0,1,3,4.

Deliberate divergences that do NOT affect ported-weight parity (they are
init-time or bug-fix semantics, documented in PARITY.md): temporal-conv
identity init, post-cond frame alignment.
"""
from __future__ import annotations

import re

import numpy as np

from tools.port_weights import _cross_attn, _ff, _perceiver_attn, _wb


def _ff_chan_video(rest):
    """Video ChanFeedForward: Sequential(ChanLayerNorm, Conv, GELU,
    TimeTokenShift, ChanLayerNorm, Conv) -> 0,1,4,5 (imagen_video.py:1051)."""
    return {
        'LayerNorm_0/g': '0.g',
        'Dense_0/kernel': '1.weight',
        'LayerNorm_1/g': '4.g',
        'Dense_1/kernel': '5.weight',
    }[rest]


def _video_attn(rest):
    """imagen_video Attention (:455-570) — cross-attn naming + to_context branch
    + null_attn_bias."""
    table = {
        'ctx_norm/LayerNorm_0/scale': 'to_context.0.weight',
        'ctx_norm/LayerNorm_0/bias': 'to_context.0.bias',
        'to_context/kernel': 'to_context.1.weight',
        'to_context/bias': 'to_context.1.bias',
        'null_attn_bias': 'null_attn_bias',
        'out_norm_g': 'to_out.1.g',
    }
    if rest in table:
        return table[rest]
    return _cross_attn(rest)


def _temporal_attn(rest):
    """Our VideoAttention under TemporalAttention ('attn/...') vs reference
    Residual(RearrangeTimeCentric(Attention)) => 'fn.fn.' prefix handled by the
    caller; DynamicPositionBias MLP (:1182-1223)."""
    table = {
        'LayerNorm_0/g': 'norm.g',
        'out_norm_g': 'to_out.1.g',
        'dyn_pos_bias/mlp_in/kernel': 'rel_pos_bias.mlp.0.0.weight',
        'dyn_pos_bias/mlp_in/bias': 'rel_pos_bias.mlp.0.0.bias',
        'dyn_pos_bias/norm_in/g': 'rel_pos_bias.mlp.0.1.g',
        'dyn_pos_bias/mlp_0/kernel': 'rel_pos_bias.mlp.1.0.weight',
        'dyn_pos_bias/mlp_0/bias': 'rel_pos_bias.mlp.1.0.bias',
        'dyn_pos_bias/norm_0/g': 'rel_pos_bias.mlp.1.1.g',
        'dyn_pos_bias/mlp_out/kernel': 'rel_pos_bias.mlp.2.weight',
        'dyn_pos_bias/mlp_out/bias': 'rel_pos_bias.mlp.2.bias',
    }
    if rest in table:
        return table[rest]
    return _video_attn(rest)


def _transformer_video(rest):
    """TransformerBlockVideo: layers.{d}.(0: attn | 1: chan-FF w/ token shift)."""
    m = re.fullmatch(r'attn_(\d+)/(.*)', rest)
    if m:
        return f'layers.{m.group(1)}.0.' + _video_attn(m.group(2))
    m = re.fullmatch(r'ff_(\d+)/(.*)', rest)
    if m:
        return f'layers.{m.group(1)}.1.' + _ff_chan_video(m.group(2))
    raise KeyError(rest)


def _block_video(rest):
    """Video Block: ChanRMSNorm + PseudoConv3d (spatial + temporal convs)."""
    table = {
        'ChanRMSNorm_0/gamma': 'norm.gamma',
        'project/spatial_conv/kernel': 'project.spatial_conv.weight',
        'project/spatial_conv/bias': 'project.spatial_conv.bias',
        'project/temporal_conv/kernel': 'project.temporal_conv.weight',
        'project/temporal_conv/bias': 'project.temporal_conv.bias',
    }
    return table[rest]


def _resnet_video(rest):
    m = re.fullmatch(r'time_mlp/(kernel|bias)', rest)
    if m:
        return f'time_mlp.1.{_wb(m.group(1))}'
    m = re.fullmatch(r'(block[12])/(.*)', rest)
    if m:
        return f'{m.group(1)}.' + _block_video(m.group(2))
    m = re.fullmatch(r'cross_attn/(.*)', rest)
    if m:
        return 'cross_attn.' + _cross_attn(m.group(1))
    m = re.fullmatch(r'gca/(.*)', rest)
    if m:
        from tools.port_weights import _gca
        return 'gca.' + _gca(m.group(1))
    m = re.fullmatch(r'res_conv/(kernel|bias)', rest)
    if m:
        return f'res_conv.{_wb(m.group(1))}'
    raise KeyError(rest)


def ref_key_for_video(path: str) -> str:
    """Translate an imagen_tpu Unet3D flax param path into the reference
    imagen_video state_dict key."""
    # --- conditioning heads (same naming as 2D) -----------------------------------------
    m = re.fullmatch(r'(to_time|to_lowres_time)_sinu/weights', path)
    if m:
        return f'{m.group(1)}_hiddens.0.weights'
    m = re.fullmatch(r'(to_time|to_lowres_time)_(hiddens)/(kernel|bias)', path)
    if m:
        return f'{m.group(1)}_hiddens.1.{_wb(m.group(3))}'
    m = re.fullmatch(r'(to_time|to_lowres_time)_(tokens|cond)/(kernel|bias)', path)
    if m:
        return f'{m.group(1)}_{m.group(2)}.0.{_wb(m.group(3))}'
    m = re.fullmatch(r'text_to_cond/(kernel|bias)', path)
    if m:
        return f'text_to_cond.{_wb(m.group(1))}'
    if path in ('null_text_embed', 'null_text_hidden'):
        return path
    m = re.fullmatch(r'text_hidden_norm/LayerNorm_0/(scale|bias)', path)
    if m:
        return 'to_text_non_attn_cond.0.' + (
            'weight' if m.group(1) == 'scale' else 'bias')
    m = re.fullmatch(r'text_hidden_proj([12])/(kernel|bias)', path)
    if m:
        idx = '1' if m.group(1) == '1' else '3'
        return f'to_text_non_attn_cond.{idx}.{_wb(m.group(2))}'
    m = re.fullmatch(r'norm_cond/LayerNorm_0/(scale|bias)', path)
    if m:
        return 'norm_cond.' + ('weight' if m.group(1) == 'scale' else 'bias')

    # --- attention pool (same structure as 2D) ------------------------------------------
    if path == 'attn_pool/latents':
        return 'attn_pool.latents'
    if path == 'attn_pool/pos_emb/embedding':
        return 'attn_pool.pos_emb.weight'
    if path == 'attn_pool/mp_norm/g':
        return 'attn_pool.to_latents_from_mean_pooled_seq.0.g'
    m = re.fullmatch(r'attn_pool/mp_proj/(kernel|bias)', path)
    if m:
        return f'attn_pool.to_latents_from_mean_pooled_seq.1.{_wb(m.group(1))}'
    m = re.fullmatch(r'attn_pool/attn_(\d+)/(.*)', path)
    if m:
        return f'attn_pool.layers.{m.group(1)}.0.' + _perceiver_attn(m.group(2))
    m = re.fullmatch(r'attn_pool/ff_(\d+)/(.*)', path)
    if m:
        return f'attn_pool.layers.{m.group(1)}.1.' + _ff(m.group(2))

    # --- stem + init temporal layers ----------------------------------------------------
    m = re.fullmatch(r'init_conv/conv_(\d+)/(kernel|bias)', path)
    if m:
        return f'init_conv.convs.{m.group(1)}.{_wb(m.group(2))}'
    m = re.fullmatch(r'init_temporal_peg/conv/(kernel|bias)', path)
    if m:
        return f'init_temporal_peg.fn.1.{_wb(m.group(1))}'
    m = re.fullmatch(r'init_temporal_attn/attn/(.*)', path)
    if m:
        return 'init_temporal_attn.fn.fn.' + _temporal_attn(m.group(1))

    # --- down path (imagen_video down ModuleList order: 0 pre-downsample,
    # 1 init resnet, 2 resnets, 3 spatial transformer, 4 temporal peg,
    # 5 temporal attn, 6 temporal downsample, 7 spatial downsample) ---------------------
    m = re.fullmatch(r'down_(\d+)_pre/conv/(kernel|bias)', path)
    if m:
        return f'downs.{m.group(1)}.0.1.{_wb(m.group(2))}'
    m = re.fullmatch(r'down_(\d+)_init_block/(.*)', path)
    if m:
        return f'downs.{m.group(1)}.1.' + _resnet_video(m.group(2))
    m = re.fullmatch(r'down_(\d+)_block_(\d+)/(.*)', path)
    if m:
        return f'downs.{m.group(1)}.2.{m.group(2)}.' + _resnet_video(m.group(3))
    m = re.fullmatch(r'down_(\d+)_attn/(.*)', path)
    if m:
        return f'downs.{m.group(1)}.3.' + _transformer_video(m.group(2))
    m = re.fullmatch(r'down_(\d+)_temporal_peg/conv/(kernel|bias)', path)
    if m:
        return f'downs.{m.group(1)}.4.fn.1.{_wb(m.group(2))}'
    m = re.fullmatch(r'down_(\d+)_temporal_attn/attn/(.*)', path)
    if m:
        return f'downs.{m.group(1)}.5.fn.fn.' + _temporal_attn(m.group(2))
    m = re.fullmatch(r'down_(\d+)_temporal_downsample/conv/(kernel|bias)', path)
    if m:
        return f'downs.{m.group(1)}.6.conv.{_wb(m.group(2))}'
    m = re.fullmatch(r'down_(\d+)_post/conv/(kernel|bias)', path)
    if m:
        return f'downs.{m.group(1)}.7.1.{_wb(m.group(2))}'
    m = re.fullmatch(r'down_(\d+)_post_a/conv/(kernel|bias)', path)
    if m:
        return f'downs.{m.group(1)}.7.fns.0.{_wb(m.group(2))}'
    m = re.fullmatch(r'down_(\d+)_post_b/(kernel|bias)', path)
    if m:
        return f'downs.{m.group(1)}.7.fns.1.{_wb(m.group(2))}'

    # --- middle -------------------------------------------------------------------------
    m = re.fullmatch(r'(mid_block[12]|final_res_block)/(.*)', path)
    if m:
        return f'{m.group(1)}.' + _resnet_video(m.group(2))
    m = re.fullmatch(r'mid_attn/(.*)', path)
    if m:  # Residual(Attention) => '.fn.'
        return 'mid_attn.fn.' + _video_attn(m.group(1))
    m = re.fullmatch(r'mid_temporal_peg/conv/(kernel|bias)', path)
    if m:
        return f'mid_temporal_peg.fn.1.{_wb(m.group(1))}'
    m = re.fullmatch(r'mid_temporal_attn/attn/(.*)', path)
    if m:
        return 'mid_temporal_attn.fn.fn.' + _temporal_attn(m.group(1))

    # --- up path (ups order: 0 init resnet, 1 resnets, 2 spatial transformer,
    # 3 temporal peg, 4 temporal attn, 5 temporal upsample, 6 spatial upsample) ---------
    m = re.fullmatch(r'up_(\d+)_init_block/(.*)', path)
    if m:
        return f'ups.{m.group(1)}.0.' + _resnet_video(m.group(2))
    m = re.fullmatch(r'up_(\d+)_block_(\d+)/(.*)', path)
    if m:
        return f'ups.{m.group(1)}.1.{m.group(2)}.' + _resnet_video(m.group(3))
    m = re.fullmatch(r'up_(\d+)_attn/(.*)', path)
    if m:
        return f'ups.{m.group(1)}.2.' + _transformer_video(m.group(2))
    m = re.fullmatch(r'up_(\d+)_temporal_peg/conv/(kernel|bias)', path)
    if m:
        return f'ups.{m.group(1)}.3.fn.1.{_wb(m.group(2))}'
    m = re.fullmatch(r'up_(\d+)_temporal_attn/attn/(.*)', path)
    if m:
        return f'ups.{m.group(1)}.4.fn.fn.' + _temporal_attn(m.group(2))
    m = re.fullmatch(r'up_(\d+)_temporal_upsample/conv/(kernel|bias)', path)
    if m:
        return f'ups.{m.group(1)}.5.conv.{_wb(m.group(2))}'
    m = re.fullmatch(r'up_(\d+)_upsample/conv/(kernel|bias)', path)
    if m:  # PixelShuffleUpsample: Sequential 'net', conv at 0
        return f'ups.{m.group(1)}.6.net.0.{_wb(m.group(2))}'
    m = re.fullmatch(r'up_(\d+)_upsample/Conv_0/(kernel|bias)', path)
    if m:  # plain Upsample
        return f'ups.{m.group(1)}.6.1.{_wb(m.group(2))}'

    # --- tail ---------------------------------------------------------------------------
    m = re.fullmatch(r'upsample_combiner/fmap_conv_(\d+)/(.*)', path)
    if m:
        return (f'upsample_combiner.fmap_convs.{m.group(1)}.'
                + _block_video(m.group(2)))
    m = re.fullmatch(r'final_conv/(kernel|bias)', path)
    if m:
        return f'final_conv.{_wb(m.group(1))}'

    raise KeyError(f'no reference mapping for flax param path {path!r}')


def convert_tensor_video(ref_arr: np.ndarray, target_shape, leaf: str) -> np.ndarray:
    a = np.asarray(ref_arr)
    if leaf == 'kernel':
        if a.ndim == 2:
            a = a.T                                   # Linear -> Dense
        elif a.ndim == 3 and len(target_shape) == 3:
            a = a.transpose(2, 1, 0)                  # temporal Conv1d (O,I,k)
        elif a.ndim == 4 and len(target_shape) == 4:
            a = a.transpose(2, 3, 1, 0)               # spatial Conv2d
        elif a.ndim == 5 and len(target_shape) == 3 and a.shape[1] == 1:
            # depthwise temporal PEG (C,1,3,1,1) -> (3, 1, C)
            a = a.reshape(a.shape[0], a.shape[2]).T.reshape(target_shape)
        elif a.ndim == 5 and len(target_shape) == 4:
            assert a.shape[2] == 1, a.shape           # Conv3d unit time
            a = a[:, :, 0].transpose(2, 3, 1, 0)
        elif a.ndim == 5 and len(target_shape) == 2:
            a = a.reshape(a.shape[0], a.shape[1]).T   # 1x1x1 Conv3d -> Dense
        elif a.ndim == 4 and len(target_shape) == 2:
            a = a.reshape(a.shape[0], a.shape[1]).T   # 1x1 Conv2d -> Dense
        else:
            raise ValueError(f'kernel rank combo {a.shape} -> {target_shape}')
    else:
        a = a.reshape(target_shape)
    assert a.shape == tuple(target_shape), (a.shape, target_shape, leaf)
    return a


# reference params that exist but are unused on the mapped forward paths
# (imagen_video Attention always allocates null_attn_bias; it only enters the
# forward when a rel-pos bias exists — the flat mid/spatial attentions have none)
_ALLOWED_UNUSED = re.compile(
    r'.*\.null_attn_bias$')


def port_unet3d_params(state_dict, flax_params):
    """Build flax Unet3D params from a reference `Unet3D.state_dict()`.

    Asserts bidirectional completeness (modulo _ALLOWED_UNUSED)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(flax_params)
    out = {}
    used = set()
    for key_tuple, leaf in flat.items():
        path = '/'.join(key_tuple)
        ref_key = ref_key_for_video(path)
        if ref_key not in state_dict:
            raise KeyError(
                f'flax path {path!r} maps to {ref_key!r}, absent from state_dict')
        t = state_dict[ref_key]
        arr = convert_tensor_video(
            t.detach().cpu().numpy() if hasattr(t, 'detach') else t,
            leaf.shape, key_tuple[-1])
        out[key_tuple] = arr.astype(np.float32)
        used.add(ref_key)

    unused = set(state_dict.keys()) - used
    hard_unused = [k for k in unused if not _ALLOWED_UNUSED.fullmatch(k)]
    if hard_unused:
        raise KeyError(
            f'reference tensors not consumed: {sorted(hard_unused)[:10]} '
            f'(+{max(0, len(hard_unused) - 10)} more)')
    return unflatten_dict(out)
