"""Port reference PyTorch `Unet` weights (state_dict) into imagen_tpu flax variables.

This is the bridge for the cross-framework numerical parity harness
(tests/test_reference_parity.py): load the same randomly-initialized weights into
both frameworks and assert forward/sampling outputs agree.

Mapping rules (reference module -> imagen_tpu module, layouts):
- torch Linear weight (O, I)        -> flax Dense kernel (I, O)          [transpose]
- torch Conv2d weight (O, I, kh, kw)-> flax Conv kernel (kh, kw, I, O)   [transpose(2,3,1,0)]
- torch Conv2d 1x1 (O, I, 1, 1)     -> flax Dense kernel (I, O)          [reshape+transpose]
  (all 1x1 convs are trailing-axis Denses in the NHWC redesign)
- ChanRMSNorm gamma (C,1,1)         -> (C,)                              [reshape]
- nn.Embedding weight               -> flax Embed embedding              [direct]
- everything else (g, scale, bias, null_kv, latents, q_scale, ...)      [direct/reshape]

Name translation walks MY flax param paths (semantic names, unet2d.py) and computes
the reference state_dict key for each (reference naming: positional ModuleLists,
imagen_pytorch.py:1327-1443). Both directions are asserted fully consumed, so any
structural divergence between the two models fails loudly.
"""
from __future__ import annotations

import re

import numpy as np


def _ff(rest):
    """FeedForward: Sequential(LayerNorm, Linear, GELU, LayerNorm, Linear) -> 0,1,3,4."""
    return {
        'LayerNorm_0/g': '0.g',
        'Dense_0/kernel': '1.weight',
        'LayerNorm_1/g': '3.g',
        'Dense_1/kernel': '4.weight',
    }[rest]


def _cross_attn(rest):
    """CrossAttention (reference imagen_pytorch.py:759-834)."""
    table = {
        'LayerNorm_0/g': 'norm.g',
        'to_q/kernel': 'to_q.weight',
        'to_kv/kernel': 'to_kv.weight',
        'null_kv': 'null_kv',
        'q_scale': 'q_scale',
        'k_scale': 'k_scale',
        'to_out/kernel': 'to_out.0.weight',
        'out_norm/g': 'to_out.1.g',
    }
    return table[rest]


def _self_attn(rest):
    """Attention (multi-query, reference :502-591); adds the to_context branch."""
    table = {
        'ctx_norm/LayerNorm_0/scale': 'to_context.0.weight',
        'ctx_norm/LayerNorm_0/bias': 'to_context.0.bias',
        'to_context/kernel': 'to_context.1.weight',
        'to_context/bias': 'to_context.1.bias',
    }
    if rest in table:
        return table[rest]
    return _cross_attn(rest)


def _linear_attn(rest):
    """LinearAttention (reference :876-943): conv q/k/v stacks."""
    m = re.fullmatch(r'to_([qkv])_proj/kernel', rest)
    if m:
        return f'to_{m.group(1)}.1.weight'
    m = re.fullmatch(r'to_([qkv])_dw/kernel', rest)
    if m:
        return f'to_{m.group(1)}.2.weight'
    table = {
        'LayerNorm_0/g': 'norm.g',
        'ctx_norm/LayerNorm_0/scale': 'to_context.0.weight',
        'ctx_norm/LayerNorm_0/bias': 'to_context.0.bias',
        'to_context/kernel': 'to_context.1.weight',
        'to_out/kernel': 'to_out.0.weight',
        'out_norm/g': 'to_out.1.g',
    }
    return table[rest]


def _transformer(rest):
    """TransformerBlock / LinearAttentionTransformerBlock: layers.{d}.(0|1)."""
    m = re.fullmatch(r'attn_(\d+)/(.*)', rest)
    if m:
        d, sub = m.groups()
        # linear-attention sublayers are distinguished by their conv-stack names
        if re.match(r'to_[qkv]_(proj|dw)/', sub) or (
                sub == 'LayerNorm_0/g' and False):
            return f'layers.{d}.0.' + _linear_attn(sub)
        try:
            return f'layers.{d}.0.' + _self_attn(sub)
        except KeyError:
            return f'layers.{d}.0.' + _linear_attn(sub)
    m = re.fullmatch(r'ff_(\d+)/(.*)', rest)
    if m:
        return f'layers.{m.group(1)}.1.' + _ff(m.group(2))
    raise KeyError(rest)


def _block(rest):
    """Block: ChanRMSNorm + project conv (reference :671-691)."""
    table = {
        'ChanRMSNorm_0/gamma': 'norm.gamma',
        'project/kernel': 'project.weight',
        'project/bias': 'project.bias',
    }
    return table[rest]


def _gca(rest):
    """GlobalContext (reference :945-970)."""
    table = {
        'to_k/kernel': 'to_k.weight',
        'to_k/bias': 'to_k.bias',
        'Dense_0/kernel': 'net.0.weight',
        'Dense_0/bias': 'net.0.bias',
        'Dense_1/kernel': 'net.2.weight',
        'Dense_1/bias': 'net.2.bias',
    }
    return table[rest]


def _resnet(rest):
    """ResnetBlock (reference :693-757)."""
    m = re.fullmatch(r'time_mlp/(kernel|bias)', rest)
    if m:
        return f'time_mlp.1.{"weight" if m.group(1) == "kernel" else "bias"}'
    m = re.fullmatch(r'(block[12])/(.*)', rest)
    if m:
        return f'{m.group(1)}.' + _block(m.group(2))
    m = re.fullmatch(r'cross_attn/(.*)', rest)
    if m:
        return 'cross_attn.' + _cross_attn(m.group(1))
    m = re.fullmatch(r'gca/(.*)', rest)
    if m:
        return 'gca.' + _gca(m.group(1))
    m = re.fullmatch(r'res_conv/(kernel|bias)', rest)
    if m:
        return f'res_conv.{"weight" if m.group(1) == "kernel" else "bias"}'
    raise KeyError(rest)


def _perceiver_attn(rest):
    """PerceiverAttention (reference :379-446): torch LayerNorms with weight+bias."""
    table = {
        'norm/LayerNorm_0/scale': 'norm.weight',
        'norm/LayerNorm_0/bias': 'norm.bias',
        'norm_latents/LayerNorm_0/scale': 'norm_latents.weight',
        'norm_latents/LayerNorm_0/bias': 'norm_latents.bias',
        'to_q/kernel': 'to_q.weight',
        'to_kv/kernel': 'to_kv.weight',
        'q_scale': 'q_scale',
        'k_scale': 'k_scale',
        'to_out/kernel': 'to_out.0.weight',
        'out_norm/LayerNorm_0/scale': 'to_out.1.weight',
        'out_norm/LayerNorm_0/bias': 'to_out.1.bias',
    }
    return table[rest]


def _wb(leaf):
    return 'weight' if leaf == 'kernel' else 'bias'


def ref_key_for(path: str) -> str:
    """Translate an imagen_tpu flax param path ('/'-joined) into the reference
    state_dict key."""
    # --- time/text conditioning heads ---------------------------------------------------
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

    # --- attention pool (PerceiverResampler, reference :448-498) ------------------------
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

    # --- init conv ----------------------------------------------------------------------
    m = re.fullmatch(r'init_conv/conv_(\d+)/(kernel|bias)', path)
    if m:
        return f'init_conv.convs.{m.group(1)}.{_wb(m.group(2))}'
    m = re.fullmatch(r'init_conv/(kernel|bias)', path)
    if m:
        return f'init_conv.{_wb(m.group(1))}'

    # --- down path ----------------------------------------------------------------------
    m = re.fullmatch(r'init_resnet_block/(.*)', path)
    if m:
        return 'init_resnet_block.' + _resnet(m.group(1))
    m = re.fullmatch(r'down_(\d+)_pre/conv/(kernel|bias)', path)
    if m:  # space-to-depth Downsample = Sequential(Rearrange, Conv 1x1)
        return f'downs.{m.group(1)}.0.1.{_wb(m.group(2))}'
    m = re.fullmatch(r'down_(\d+)_pre/conv_(\d+)/(kernel|bias)', path)
    if m:  # cross_embed_downsample
        return f'downs.{m.group(1)}.0.convs.{m.group(2)}.{_wb(m.group(3))}'
    m = re.fullmatch(r'down_(\d+)_init_block/(.*)', path)
    if m:
        return f'downs.{m.group(1)}.1.' + _resnet(m.group(2))
    m = re.fullmatch(r'down_(\d+)_block_(\d+)/(.*)', path)
    if m:
        return f'downs.{m.group(1)}.2.{m.group(2)}.' + _resnet(m.group(3))
    m = re.fullmatch(r'down_(\d+)_attn/(.*)', path)
    if m:
        return f'downs.{m.group(1)}.3.' + _transformer(m.group(2))
    m = re.fullmatch(r'down_(\d+)_post_a/(kernel|bias)', path)
    if m:  # Parallel(Conv3x3, Conv1x1) at the last non-downsampling level
        return f'downs.{m.group(1)}.4.fns.0.{_wb(m.group(2))}'
    m = re.fullmatch(r'down_(\d+)_post_b/(kernel|bias)', path)
    if m:
        return f'downs.{m.group(1)}.4.fns.1.{_wb(m.group(2))}'
    m = re.fullmatch(r'down_(\d+)_post/conv/(kernel|bias)', path)
    if m:
        return f'downs.{m.group(1)}.4.1.{_wb(m.group(2))}'
    m = re.fullmatch(r'down_(\d+)_post/conv_(\d+)/(kernel|bias)', path)
    if m:
        return f'downs.{m.group(1)}.4.convs.{m.group(2)}.{_wb(m.group(3))}'

    # --- middle -------------------------------------------------------------------------
    m = re.fullmatch(r'(mid_block[12]|final_res_block)/(.*)', path)
    if m:
        return f'{m.group(1)}.' + _resnet(m.group(2))
    m = re.fullmatch(r'mid_attn/(.*)', path)
    if m:
        return 'mid_attn.' + _transformer(m.group(1))

    # --- up path ------------------------------------------------------------------------
    m = re.fullmatch(r'up_(\d+)_init_block/(.*)', path)
    if m:
        return f'ups.{m.group(1)}.0.' + _resnet(m.group(2))
    m = re.fullmatch(r'up_(\d+)_block_(\d+)/(.*)', path)
    if m:
        return f'ups.{m.group(1)}.1.{m.group(2)}.' + _resnet(m.group(3))
    m = re.fullmatch(r'up_(\d+)_attn/(.*)', path)
    if m:
        return f'ups.{m.group(1)}.2.' + _transformer(m.group(2))
    m = re.fullmatch(r'up_(\d+)_upsample/conv/(kernel|bias)', path)
    if m:  # PixelShuffleUpsample = Sequential named 'net', conv at index 0
        return f'ups.{m.group(1)}.3.net.0.{_wb(m.group(2))}'
    m = re.fullmatch(r'up_(\d+)_upsample/Conv_0/(kernel|bias)', path)
    if m:  # plain Upsample = Sequential(nn.Upsample, Conv2d)
        return f'ups.{m.group(1)}.3.1.{_wb(m.group(2))}'

    # --- tail ---------------------------------------------------------------------------
    m = re.fullmatch(r'upsample_combiner/fmap_conv_(\d+)/(.*)', path)
    if m:
        return f'upsample_combiner.fmap_convs.{m.group(1)}.' + _block(m.group(2))
    m = re.fullmatch(r'final_conv/(kernel|bias)', path)
    if m:
        return f'final_conv.{_wb(m.group(1))}'

    raise KeyError(f'no reference mapping for flax param path {path!r}')


def convert_tensor(ref_arr: np.ndarray, target_shape, leaf: str) -> np.ndarray:
    """Layout-convert one reference tensor to the flax leaf's shape."""
    a = np.asarray(ref_arr)
    if leaf == 'kernel':
        if a.ndim == 2:
            a = a.T                               # Linear -> Dense
        elif a.ndim == 4 and len(target_shape) == 4:
            a = a.transpose(2, 3, 1, 0)           # Conv2d -> flax Conv
        elif a.ndim == 4 and len(target_shape) == 2:
            a = a.reshape(a.shape[0], a.shape[1]).T  # 1x1 Conv2d -> Dense
        else:
            raise ValueError(f'kernel rank combo {a.shape} -> {target_shape}')
    else:
        a = a.reshape(target_shape)
    assert a.shape == tuple(target_shape), (a.shape, target_shape, leaf)
    return a


def port_unet_params(state_dict, flax_params):
    """Build flax params from a reference `Unet.state_dict()`.

    Asserts bidirectional completeness: every flax leaf gets a source tensor and
    every reference tensor is consumed exactly once.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(flax_params)
    out = {}
    used = set()
    for key_tuple, leaf in flat.items():
        path = '/'.join(key_tuple)
        ref_key = ref_key_for(path)
        if ref_key not in state_dict:
            raise KeyError(
                f'flax path {path!r} maps to {ref_key!r}, absent from state_dict')
        t = state_dict[ref_key]
        arr = convert_tensor(
            t.detach().cpu().numpy() if hasattr(t, 'detach') else t,
            leaf.shape, key_tuple[-1])
        out[key_tuple] = arr.astype(np.float32)
        used.add(ref_key)

    unused = set(state_dict.keys()) - used
    if unused:
        raise KeyError(f'reference tensors not consumed: {sorted(unused)[:10]} '
                       f'(+{max(0, len(unused) - 10)} more)')
    return unflatten_dict(out)
