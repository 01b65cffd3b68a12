"""Shape and behavior tests for the neural blocks (tiny dims, reference-test idiom)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagen_tpu.models import blocks


KEY = jax.random.PRNGKey(0)


def init_and_apply(mod, *args, rngs=None, **kwargs):
    variables = mod.init(rngs or {'params': KEY}, *args, **kwargs)
    return mod.apply(variables, *args, **kwargs), variables


def test_layernorm_stable_and_plain():
    x = jax.random.normal(KEY, (2, 5, 16))
    for stable in (False, True):
        out, _ = init_and_apply(blocks.LayerNorm(stable=stable), x)
        assert out.shape == x.shape
        np.testing.assert_allclose(np.asarray(out.mean(-1)), 0., atol=1e-4)


def test_chan_rmsnorm():
    x = jax.random.normal(KEY, (2, 4, 4, 8))
    out, _ = init_and_apply(blocks.ChanRMSNorm(), x)
    assert out.shape == x.shape
    # unit gamma: per-position channel norm should be sqrt(dim) * unit vector norm
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, np.sqrt(8), rtol=1e-4)


def test_feedforward():
    x = jax.random.normal(KEY, (2, 5, 16))
    out, _ = init_and_apply(blocks.FeedForward(mult=2.), x)
    assert out.shape == x.shape


def test_sinusoidal_pos_emb():
    t = jnp.asarray([0.1, 0.9])
    out, _ = init_and_apply(blocks.SinusoidalPosEmb(dim=16), t)
    assert out.shape == (2, 16)
    out2, _ = init_and_apply(blocks.LearnedSinusoidalPosEmb(dim=16), t)
    assert out2.shape == (2, 17)  # raw t concat


def test_attention_self_and_context():
    x = jax.random.normal(KEY, (2, 12, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 24))
    out, _ = init_and_apply(blocks.Attention(dim_head=8, heads=4), x)
    assert out.shape == x.shape
    out, _ = init_and_apply(
        blocks.Attention(dim_head=8, heads=4, context_dim=24), x, context=ctx)
    assert out.shape == x.shape


def test_attention_mask_ignores_masked_keys():
    """Masked-out context should not affect output (mask offsets account for null kv)."""
    x = jax.random.normal(KEY, (1, 4, 16))
    mod = blocks.Attention(dim_head=8, heads=2)
    variables = mod.init({'params': KEY}, x)
    mask = jnp.array([[True, True, False, False]])
    out1 = mod.apply(variables, x, mask=mask)
    x_perturbed = x.at[:, 2:].set(jax.random.normal(jax.random.PRNGKey(3), (1, 2, 16)))
    out2 = mod.apply(variables, x_perturbed, mask=mask)
    # queries at unmasked positions attend only to unmasked keys + null kv
    np.testing.assert_allclose(
        np.asarray(out1[:, :2]), np.asarray(out2[:, :2]), atol=1e-5)


def test_cross_attention_full_and_linear():
    x = jax.random.normal(KEY, (2, 10, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 24))
    mask = jnp.ones((2, 7), dtype=bool)
    out, _ = init_and_apply(
        blocks.CrossAttention(context_dim=24, dim_head=8, heads=4), x, ctx, mask=mask)
    assert out.shape == x.shape
    out, _ = init_and_apply(
        blocks.CrossAttention(context_dim=24, dim_head=8, heads=4, linear=True),
        x, ctx, mask=mask)
    assert out.shape == x.shape


def test_linear_attention_spatial():
    fmap = jax.random.normal(KEY, (2, 8, 8, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 24))
    out, _ = init_and_apply(
        blocks.LinearAttention(dim_head=8, heads=2, context_dim=24), fmap, context=ctx)
    assert out.shape == fmap.shape


def test_global_context_gate_range():
    x = jax.random.normal(KEY, (2, 4, 4, 8))
    out, _ = init_and_apply(blocks.GlobalContext(dim_out=8), x)
    assert out.shape == (2, 1, 1, 8)
    assert np.all(np.asarray(out) > 0) and np.all(np.asarray(out) < 1)


def test_resnet_block_variants():
    x = jax.random.normal(KEY, (2, 8, 8, 16))
    t = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 24))

    out, _ = init_and_apply(blocks.ResnetBlock(dim_out=24), x)
    assert out.shape == (2, 8, 8, 24)

    out, _ = init_and_apply(
        blocks.ResnetBlock(dim_out=16, time_cond_dim=32, cond_dim=24, use_gca=True,
                           attn_dim_head=8, attn_heads=2),
        x, time_emb=t, cond=cond)
    assert out.shape == x.shape

    out, _ = init_and_apply(
        blocks.ResnetBlock(dim_out=16, cond_dim=24, linear_attn=True,
                           attn_dim_head=8, attn_heads=2),
        x, cond=cond)
    assert out.shape == x.shape


def test_transformer_blocks():
    x = jax.random.normal(KEY, (2, 8, 8, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 24))
    out, _ = init_and_apply(
        blocks.TransformerBlock(depth=2, heads=2, dim_head=8, context_dim=24),
        x, context=ctx)
    assert out.shape == x.shape
    out, _ = init_and_apply(
        blocks.LinearAttentionTransformerBlock(depth=1, heads=2, dim_head=8,
                                               context_dim=24),
        x, context=ctx)
    assert out.shape == x.shape


def test_up_down_sample():
    x = jax.random.normal(KEY, (2, 8, 8, 16))
    out, _ = init_and_apply(blocks.Upsample(dim_out=8), x)
    assert out.shape == (2, 16, 16, 8)
    out, _ = init_and_apply(blocks.PixelShuffleUpsample(dim_out=8), x)
    assert out.shape == (2, 16, 16, 8)
    out, _ = init_and_apply(blocks.Downsample(dim_out=32), x)
    assert out.shape == (2, 4, 4, 32)


def test_pixelshuffle_init_replicated():
    """Replicated kaiming init: all 4 shuffle positions identical at init
    (checkerboard-free; reference imagen_pytorch.py:621-628)."""
    x = jnp.ones((1, 4, 4, 8))
    mod = blocks.PixelShuffleUpsample(dim_out=8)
    variables = mod.init({'params': KEY}, x)
    w = np.asarray(variables['params']['conv']['kernel'])  # (1,1,8,32)
    w4 = w.reshape(1, 1, 8, 8, 4)
    for i in range(1, 4):
        np.testing.assert_array_equal(w4[..., 0], w4[..., i])


def test_cross_embed_layer():
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    out, _ = init_and_apply(
        blocks.CrossEmbedLayer(kernel_sizes=(3, 7, 15), dim_out=32, stride=1), x)
    assert out.shape == (2, 16, 16, 32)
    out, _ = init_and_apply(
        blocks.CrossEmbedLayer(kernel_sizes=(2, 4), dim_out=32, stride=2), x)
    assert out.shape == (2, 8, 8, 32)


def test_cross_embed_tiled_matches_plain_convs():
    """The per-scale phase-tiled stem path == the plain multi-conv definition
    (reference imagen_pytorch.py:1051-1076) on identical parameters."""
    import flax.linen as nn
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    mod = blocks.CrossEmbedLayer(kernel_sizes=(3, 7, 15), dim_out=32, stride=1)
    variables = mod.init({'params': KEY}, x)
    out = mod.apply(variables, x)

    dim_scales = [16, 8, 8]
    ref = []
    for i, (kernel, dim_scale) in enumerate(zip((3, 7, 15), dim_scales)):
        pad = (kernel - 1) // 2
        conv = nn.Conv(dim_scale, (kernel, kernel), strides=(1, 1),
                       padding=((pad, pad), (pad, pad)))
        ref.append(conv.apply(
            {'params': variables['params'][f'conv_{i}']}, x))
    ref = jnp.concatenate(ref, axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_upsample_combiner():
    x = jax.random.normal(KEY, (2, 8, 8, 16))
    fmaps = [jax.random.normal(jax.random.PRNGKey(i), (2, s, s, d))
             for i, (s, d) in enumerate([(2, 4), (4, 8)])]
    mod = blocks.UpsampleCombiner(dim=16, enabled=True, dim_ins=(4, 8), dim_outs=(4, 4))
    out, _ = init_and_apply(mod, x, fmaps=fmaps)
    assert out.shape == (2, 8, 8, 16 + 8)
    # disabled passthrough
    mod = blocks.UpsampleCombiner(dim=16, enabled=False)
    out, _ = init_and_apply(mod, x, fmaps=fmaps)
    assert out.shape == x.shape


def test_perceiver_resampler():
    x = jax.random.normal(KEY, (2, 10, 32))
    mask = jnp.asarray([[True] * 10, [True] * 5 + [False] * 5])
    mod = blocks.PerceiverResampler(depth=2, dim_head=8, heads=2, num_latents=6,
                                    num_latents_mean_pooled=2, max_seq_len=32)
    out, _ = init_and_apply(mod, x, mask=mask)
    assert out.shape == (2, 8, 32)  # 6 latents + 2 mean-pooled
