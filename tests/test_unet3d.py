"""Unet3D shape tests at tiny dims: temporal machinery, ignore_time, frame prompts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagen_tpu.models.unet3d import Unet3D
from imagen_tpu.models import video_blocks as vb

KEY = jax.random.PRNGKey(0)

TINY = dict(
    dim=8,
    dim_mults=(1, 2),
    text_embed_dim=16,
    cond_dim=8,
    attn_dim_head=4,
    attn_heads=2,
    attn_pool_num_latents=2,
    max_text_len=8,
    layer_attns=False,
    layer_cross_attns=(False, True),
)


def make_inputs(b=1, f=4, size=8, text_len=6, text_dim=16):
    x = jax.random.normal(KEY, (b, f, size, size, 3))
    time = jnp.full((b,), 0.5)
    text = jax.random.normal(jax.random.PRNGKey(1), (b, text_len, text_dim))
    mask = jnp.ones((b, text_len), dtype=bool)
    return x, time, text, mask


def test_pseudo_conv3d_identity_temporal_init():
    """At init, the causal temporal conv must be an identity (true identity, unlike
    the reference's shifted dirac — see video_blocks docstring)."""
    mod = vb.PseudoConv3d(dim_out=6, kernel_size=3)
    x = jax.random.normal(KEY, (2, 4, 6, 6, 6))
    variables = mod.init({'params': KEY}, x)
    out = mod.apply(variables, x)
    # spatial conv applied then temporal identity: compare against ignore_time
    out_ignore = mod.apply(variables, x, ignore_time=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ignore), atol=1e-5)


def test_temporal_attention_and_peg_shapes():
    x = jax.random.normal(KEY, (2, 4, 4, 4, 8))
    mod = vb.TemporalAttention(dim_head=4, heads=2)
    variables = mod.init({'params': KEY}, x)
    assert mod.apply(variables, x).shape == x.shape

    peg = vb.TemporalPeg()
    variables = peg.init({'params': KEY}, x)
    assert peg.apply(variables, x).shape == x.shape


def test_causal_temporal_attention_is_causal():
    """Future-frame perturbations must not affect past-frame outputs."""
    x = jax.random.normal(KEY, (1, 4, 2, 2, 8))
    mod = vb.TemporalAttention(dim_head=4, heads=2, causal=True)
    variables = mod.init({'params': KEY}, x)
    out1 = mod.apply(variables, x)
    x2 = x.at[:, -1].set(jax.random.normal(jax.random.PRNGKey(9), (1, 2, 2, 8)))
    out2 = mod.apply(variables, x2)
    np.testing.assert_allclose(
        np.asarray(out1[:, :3]), np.asarray(out2[:, :3]), atol=1e-5)


def test_time_token_shift():
    x = jnp.arange(2 * 3 * 2 * 2 * 4, dtype=jnp.float32).reshape(2, 3, 2, 2, 4)
    out = vb.TimeTokenShift().apply({}, x)
    np.testing.assert_array_equal(np.asarray(out[..., :2]), np.asarray(x[..., :2]))
    np.testing.assert_array_equal(np.asarray(out[:, 0, :, :, 2:]), 0.)
    np.testing.assert_array_equal(
        np.asarray(out[:, 1:, :, :, 2:]), np.asarray(x[:, :-1, :, :, 2:]))


def test_temporal_up_down_sample():
    x = jax.random.normal(KEY, (2, 4, 4, 4, 8))
    down = vb.TemporalDownsample(dim_out=8, stride=2)
    variables = down.init({'params': KEY}, x)
    assert down.apply(variables, x).shape == (2, 2, 4, 4, 8)

    up = vb.TemporalPixelShuffleUpsample(dim_out=8, stride=2)
    variables = up.init({'params': KEY}, x)
    assert up.apply(variables, x).shape == (2, 8, 4, 4, 8)


def test_unet3d_forward():
    unet = Unet3D(**TINY)
    x, time, text, mask = make_inputs()
    variables = unet.init({'params': KEY}, x, time, text_embeds=text, text_mask=mask)
    out = unet.apply(variables, x, time, text_embeds=text, text_mask=mask)
    assert out.shape == x.shape
    np.testing.assert_array_equal(np.asarray(out), 0.)  # zero-init final conv


def test_unet3d_ignore_time():
    unet = Unet3D(**TINY)
    x, time, text, mask = make_inputs(f=1)
    variables = unet.init({'params': KEY}, x, time, text_embeds=text,
                          text_mask=mask, ignore_time=True)
    out = unet.apply(variables, x, time, text_embeds=text, text_mask=mask,
                     ignore_time=True)
    assert out.shape == x.shape


def test_unet3d_temporal_strides_and_lowres():
    unet = Unet3D(**TINY, temporal_strides=(1, 2), lowres_cond=True)
    x, time, text, mask = make_inputs(f=4)
    lowres = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    variables = unet.init(
        {'params': KEY}, x, time, lowres_cond_img=lowres, lowres_noise_times=time,
        text_embeds=text, text_mask=mask)
    out = unet.apply(variables, x, time, lowres_cond_img=lowres,
                     lowres_noise_times=time, text_embeds=text, text_mask=mask)
    assert out.shape == x.shape


def test_unet3d_cond_video_frames():
    unet = Unet3D(**TINY)
    x, time, text, mask = make_inputs(f=4)
    cond_frames = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 8, 8, 3))
    variables = unet.init(
        {'params': KEY}, x, time, text_embeds=text, text_mask=mask,
        cond_video_frames=cond_frames)
    out = unet.apply(variables, x, time, text_embeds=text, text_mask=mask,
                     cond_video_frames=cond_frames)
    assert out.shape == x.shape  # prompt frames cropped from output

    out = unet.apply(variables, x, time, text_embeds=text, text_mask=mask,
                     post_cond_video_frames=cond_frames)
    assert out.shape == x.shape


def test_unet3d_prompt_frame_alignment():
    """Preceding frames PREPEND, succeeding frames APPEND, and the output crop
    removes exactly those positions — i.e. output frame t corresponds to input
    video frame t. The reference prepends succeeding frames yet crops from the end
    (imagen_video.py:1715 vs :1935-1939), silently misaligning; we fix it and pin
    the layout here via the sown 'assembled_frames' intermediate."""
    unet = Unet3D(**TINY)
    x, time, text, mask = make_inputs(f=4)
    pre = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 8, 8, 3))
    post = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 8, 8, 3))
    variables = unet.init(
        {'params': KEY}, x, time, text_embeds=text, text_mask=mask,
        cond_video_frames=pre, post_cond_video_frames=post)

    out, mods = unet.apply(
        variables, x, time, text_embeds=text, text_mask=mask,
        cond_video_frames=pre, post_cond_video_frames=post,
        mutable=['intermediates'])
    assembled = mods['intermediates']['assembled_frames'][0]

    n_pre, f, n_post = pre.shape[1], x.shape[1], post.shape[1]
    assert assembled.shape[1] == n_pre + f + n_post
    # layout: [preceding | video | succeeding] on the frame axis
    np.testing.assert_allclose(
        np.asarray(assembled[:, :n_pre]), np.asarray(pre), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(assembled[:, n_pre:n_pre + f]), np.asarray(x), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(assembled[:, n_pre + f:]), np.asarray(post), rtol=1e-6)
    # crop removes exactly the prompt positions
    assert out.shape == x.shape


def test_unet3d_layer_attn_and_memory_efficient():
    unet = Unet3D(**{**TINY, 'layer_attns': (False, True)}, memory_efficient=True)
    x, time, text, mask = make_inputs(f=2)
    variables = unet.init({'params': KEY}, x, time, text_embeds=text, text_mask=mask)
    out = unet.apply(variables, x, time, text_embeds=text, text_mask=mask)
    assert out.shape == x.shape


def test_video_resize_helpers():
    v = jax.random.normal(KEY, (2, 4, 8, 8, 3))
    out = vb.resize_video_to(v, 16)
    assert out.shape == (2, 4, 16, 16, 3)
    out = vb.resize_video_to(v, 8, target_frames=2)
    assert out.shape == (2, 2, 8, 8, 3)
    out = vb.scale_video_time(v, 2)
    assert out.shape == (2, 2, 8, 8, 3)


def test_time_rel_pos_bias_depth_threads_through():
    """A non-default time_rel_pos_bias_depth must change the temporal attention's
    DynamicPositionBias MLP param tree (reference imagen_video.py:1256)."""
    x, time, text, mask = make_inputs()

    def param_names(depth):
        unet = Unet3D(**TINY, time_rel_pos_bias_depth=depth)
        variables = jax.eval_shape(
            lambda: unet.init({'params': KEY}, x, time,
                              text_embeds=text, text_mask=mask))
        flat = jax.tree_util.tree_flatten_with_path(variables)[0]
        return {jax.tree_util.keystr(p) for p, _ in flat
                if 'dyn_pos_bias' in jax.tree_util.keystr(p)}

    names_d2 = param_names(2)
    names_d4 = param_names(4)
    assert names_d4 > names_d2  # deeper MLP adds layers
    assert any('mlp_2' in n for n in names_d4)
    assert not any('mlp_2' in n for n in names_d2)


def test_temporal_attention_einsum_path_equivalence(monkeypatch):
    """The opt-in native-layout (transposing-einsum) TemporalAttention path
    must be numerically identical to the wired rearrange path, with an
    identical param tree (measured-negative perf variant kept as a receipt —
    BENCH.md round 5)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8, 16), jnp.float32)
    m = vb.TemporalAttention(dim_head=4, heads=2, dtype=jnp.float32)

    monkeypatch.setenv('IMAGEN_TPU_TEMPORAL_EINSUM', '0')
    p_old = m.init(jax.random.PRNGKey(0), x)
    y_old = m.apply(p_old, x)

    monkeypatch.setenv('IMAGEN_TPU_TEMPORAL_EINSUM', '1')
    p_new = m.init(jax.random.PRNGKey(0), x)
    y_new = m.apply(p_new, x)

    shapes_old = jax.tree_util.tree_map(lambda a: a.shape, p_old)
    shapes_new = jax.tree_util.tree_map(lambda a: a.shape, p_new)
    assert shapes_old == shapes_new
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_old),
                               atol=2e-5, rtol=2e-5)


def test_temporal_fused_ln_path_equivalence(monkeypatch):
    """IMAGEN_TPU_TEMPORAL_FUSED_LN=1 fuses the temporal LayerNorm/out-norm
    with their relayouts (ops/temporal_layout.py). Outputs AND grads must
    match the wired path exactly (backward recomputes via the XLA reference
    chain), with an identical param tree."""
    import imagen_tpu.ops.temporal_layout as tl

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8, 64),
                          jnp.float32)
    m = vb.TemporalAttention(dim_head=4, heads=2, dtype=jnp.float32)
    monkeypatch.setenv('IMAGEN_TPU_TEMPORAL_FUSED_LN', '0')
    p = m.init(jax.random.PRNGKey(0), x)
    y0 = m.apply(p, x)
    g0 = jax.grad(lambda p_: jnp.sum(m.apply(p_, x) ** 2))(p)

    monkeypatch.setattr(tl, '_INTERPRET', True)
    monkeypatch.setenv('IMAGEN_TPU_TEMPORAL_FUSED_LN', '1')
    p1 = m.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_map(lambda a: a.shape, p)
            == jax.tree_util.tree_map(lambda a: a.shape, p1))
    y1 = m.apply(p, x)
    g1 = jax.grad(lambda p_: jnp.sum(m.apply(p_, x) ** 2))(p)

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
