"""Unet2D shape/config tests at tiny dims (reference test idiom, test_trainer.py:7-24)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagen_tpu.models.unet2d import NullUnet, Unet

KEY = jax.random.PRNGKey(0)

TINY = dict(
    dim=8,
    dim_mults=(1, 1, 1, 1),
    text_embed_dim=16,
    cond_dim=8,
    attn_dim_head=4,
    attn_heads=2,
    attn_pool_num_latents=2,
    max_text_len=8,
)


def make_inputs(b=2, size=16, channels=3, text_len=6, text_dim=16):
    x = jax.random.normal(KEY, (b, size, size, channels))
    time = jnp.full((b,), 0.5)
    text = jax.random.normal(jax.random.PRNGKey(1), (b, text_len, text_dim))
    mask = jnp.ones((b, text_len), dtype=bool)
    return x, time, text, mask


def test_unet_basic_forward():
    unet = Unet(**TINY, layer_attns=(False, False, False, True),
                layer_cross_attns=(False, False, False, True))
    x, time, text, mask = make_inputs()
    variables = unet.init({'params': KEY}, x, time, text_embeds=text, text_mask=mask)
    out = unet.apply(variables, x, time, text_embeds=text, text_mask=mask)
    assert out.shape == x.shape
    # zero-init final conv -> output exactly zero at init
    np.testing.assert_array_equal(np.asarray(out), 0.)


def test_unet_lowres_cond_and_memory_efficient():
    unet = Unet(**TINY, lowres_cond=True, memory_efficient=True,
                layer_attns=False, layer_cross_attns=(False, False, False, True),
                use_linear_attn=(True, False, False, False))
    x, time, text, mask = make_inputs()
    lowres = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    variables = unet.init(
        {'params': KEY}, x, time, lowres_cond_img=lowres,
        lowres_noise_times=time, text_embeds=text, text_mask=mask)
    out = unet.apply(
        variables, x, time, lowres_cond_img=lowres, lowres_noise_times=time,
        text_embeds=text, text_mask=mask)
    assert out.shape == x.shape


def test_unet_self_cond_and_cond_images():
    unet = Unet(**TINY, self_cond=True, cond_images_channels=2,
                layer_attns=False, layer_cross_attns=False, attn_pool_text=False)
    x, time, text, mask = make_inputs()
    cond_images = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 2))
    variables = unet.init(
        {'params': KEY}, x, time, text_embeds=text, text_mask=mask,
        cond_images=cond_images)
    out = unet.apply(variables, x, time, text_embeds=text, text_mask=mask,
                     cond_images=cond_images,
                     self_cond=jnp.zeros_like(x))
    assert out.shape == x.shape


def test_unet_no_text():
    unet = Unet(**TINY, cond_on_text=False, layer_attns=False,
                layer_cross_attns=False)
    x, time, _, _ = make_inputs()
    variables = unet.init({'params': KEY}, x, time)
    out = unet.apply(variables, x, time)
    assert out.shape == x.shape


def test_unet_cfg_drop_all():
    """cond_drop_prob=1 uses null embeddings; static branch requires no rng."""
    unet = Unet(**TINY, layer_attns=False, layer_cross_attns=(False, False, False, True))
    x, time, text, mask = make_inputs()
    variables = unet.init({'params': KEY}, x, time, text_embeds=text, text_mask=mask)
    out = unet.apply(variables, x, time, text_embeds=text, text_mask=mask,
                     cond_drop_prob=1.)
    assert out.shape == x.shape


def test_unet_extra_features():
    unet = Unet(**TINY, combine_upsample_fmaps=True,
                init_conv_to_final_conv_residual=True,
                pixel_shuffle_upsample=False, cross_embed_downsample=True,
                layer_attns=False, layer_cross_attns=False, attn_pool_text=False,
                scale_skip_connection=False, final_resnet_block=False,
                init_cross_embed=False)
    x, time, text, mask = make_inputs()
    variables = unet.init({'params': KEY}, x, time, text_embeds=text, text_mask=mask)
    out = unet.apply(variables, x, time, text_embeds=text, text_mask=mask)
    assert out.shape == x.shape


def test_cast_model_parameters():
    unet = Unet(**TINY)
    same = unet.cast_model_parameters(
        lowres_cond=False, text_embed_dim=16, channels=3, channels_out=None,
        cond_on_text=True)
    assert same is unet
    changed = unet.cast_model_parameters(
        lowres_cond=True, text_embed_dim=16, channels=3, channels_out=3,
        cond_on_text=True)
    assert changed is not unet and changed.lowres_cond


def test_null_unet():
    x = jax.random.normal(KEY, (2, 8, 8, 3))
    nu = NullUnet()
    variables = nu.init({'params': KEY}, x)
    out = nu.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_remat_modes_grad_equivalence():
    """remat=True (full) and remat='save_convs' (selective policy: conv/attn/FF
    outputs saved, cheap elementwise recomputed) must produce identical
    forwards AND gradients to the non-remat unet — remat changes scheduling,
    never math."""
    x, time, text, mask = make_inputs()
    cfg = dict(TINY, layer_attns=(False, False, False, True),
               layer_cross_attns=(False, False, False, True))

    unet0 = Unet(**cfg)
    variables = unet0.init({'params': KEY}, x, time, text_embeds=text,
                           text_mask=mask)

    def loss(unet, v):
        out = unet.apply(v, x, time, text_embeds=text, text_mask=mask)
        return jnp.sum(out ** 2)

    ref_l, ref_g = jax.value_and_grad(lambda v: loss(unet0, v))(variables)
    for mode in (True, 'save_convs'):
        unet = Unet(**cfg, remat=mode)
        l, g = jax.jit(jax.value_and_grad(lambda v: loss(unet, v)))(variables)
        np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(ref_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
