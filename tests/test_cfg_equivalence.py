"""Batched CFG (one doubled-batch forward) must match the reference's two sequential
forwards exactly (reference imagen_pytorch.py:1510-1522 semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from imagen_tpu.diffusion.imagen import unet_forward_with_cond_scale
from imagen_tpu.models.unet2d import Unet

TINY = dict(
    dim=8, dim_mults=(1, 2), text_embed_dim=16, cond_dim=8, attn_dim_head=4,
    attn_heads=2, attn_pool_num_latents=2, max_text_len=8,
    layer_attns=(False, True), layer_cross_attns=(False, True),
)


def test_batched_cfg_matches_sequential():
    unet = Unet(**TINY)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.full((2,), 0.3)
    te = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    tm = jnp.ones((2, 6), bool)
    variables = unet.init({'params': key}, x, t, text_embeds=te, text_mask=tm)

    cond_scale = 3.0
    batched = unet_forward_with_cond_scale(
        unet, variables, x, t, cond_scale=cond_scale,
        text_embeds=te, text_mask=tm)

    # reference semantics: two separate static forwards
    logits = unet.apply(variables, x, t, cond_drop_prob=0.,
                        text_embeds=te, text_mask=tm)
    null_logits = unet.apply(variables, x, t, cond_drop_prob=1.,
                             text_embeds=te, text_mask=tm)
    sequential = null_logits + (logits - null_logits) * cond_scale

    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(sequential), atol=1e-5, rtol=1e-5)


def test_cfg_scale_one_single_forward():
    unet = Unet(**TINY)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.full((2,), 0.3)
    te = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    tm = jnp.ones((2, 6), bool)
    variables = unet.init({'params': key}, x, t, text_embeds=te, text_mask=tm)

    out = unet_forward_with_cond_scale(
        unet, variables, x, t, cond_scale=1., text_embeds=te, text_mask=tm)
    plain = unet.apply(variables, x, t, cond_drop_prob=0.,
                       text_embeds=te, text_mask=tm)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(plain))
