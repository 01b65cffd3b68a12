"""Pallas fused-norm kernels vs their XLA reference chains (interpret mode on CPU).

Covers ops/fused_norm.py: fused_feedforward (the wired TransformerBlock FF path),
fused_layernorm, and the erf polynomial. The film kernel has its own coverage via
its module-level reference; these kernels are gated off on CPU in production
(jax.default_backend() != 'tpu'), so interpret=True drives the actual kernel body.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagen_tpu.ops import fused_norm as fn


def _rand(key, shape, scale=1.0):
    return scale * jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


class TestErfPoly:
    def test_matches_lax_erf(self):
        x = jnp.linspace(-4.0, 4.0, 4097)
        got = fn._erf_f32(x)
        ref = jax.lax.erf(x)
        # A&S 7.1.26 is 1.5e-7 in exact arithmetic; fp32 eval adds ~2e-6 —
        # both far below the bf16 ulp (~4e-3) of the activations it feeds
        assert float(jnp.max(jnp.abs(got - ref))) < 5e-6


class TestFusedLayerNorm:
    @pytest.mark.parametrize('stable', [False, True])
    def test_forward_matches_xla(self, stable):
        x = _rand(0, (4, 64, 256), 3.0)
        g = 1.0 + 0.1 * _rand(1, (256,))
        got = fn._ln_forward(x, g, stable, 1e-5, interpret=True)
        ref = fn._ln_xla(x, g, stable, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_fallback_on_unaligned_channels(self):
        x = _rand(0, (4, 8, 96))  # 96 % 128 != 0 -> XLA fallback, still correct
        g = jnp.ones((96,))
        got = fn.fused_layernorm(x, g, False, 1e-5)
        ref = fn._ln_xla(x, g, False, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


class TestFusedFeedForward:
    def _inputs(self):
        x = _rand(0, (2, 64, 256))
        g0 = 1.0 + 0.1 * _rand(1, (256,))
        w0 = _rand(2, (256, 512), 0.05)
        g1 = 1.0 + 0.1 * _rand(3, (512,))
        w1 = _rand(4, (512, 256), 0.05)
        return x, g0, w0, g1, w1

    def test_forward_matches_module_chain(self):
        x, g0, w0, g1, w1 = self._inputs()
        got = fn._ff_forward(x, g0, w0, g1, w1, 1e-5, interpret=True)
        ref = fn._ff_xla(x, g0, w0, g1, w1, 1e-5)
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(got - ref))) < 2e-3 * max(scale, 1.0)

    def test_gradients_match_reference(self):
        x, g0, w0, g1, w1 = self._inputs()

        def loss_fused(*a):
            return jnp.sum(fn.fused_feedforward(*a, 1e-5) ** 2)

        def loss_ref(*a):
            return jnp.sum(fn._ff_xla(*a, 1e-5) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, g0, w0, g1, w1)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, g0, w0, g1, w1)
        for a, b in zip(gf, gr):
            rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
            assert rel < 5e-3

    def test_lnmm_forward_and_grads(self):
        x = _rand(0, (2, 64, 256))
        g = 1.0 + 0.1 * _rand(1, (256,))
        w = _rand(2, (256, 640), 0.05)
        got = fn._lnmm_forward(x, g, w, 1e-5, interpret=True)
        ref = fn._lnmm_xla(x, g, w, 1e-5)
        assert float(jnp.max(jnp.abs(got - ref))) < 2e-3

        gf = jax.grad(lambda *a: jnp.sum(fn.fused_ln_matmul(*a, 1e-5) ** 2),
                      argnums=(0, 1, 2))(x, g, w)
        gr = jax.grad(lambda *a: jnp.sum(fn._lnmm_xla(*a, 1e-5) ** 2),
                      argnums=(0, 1, 2))(x, g, w)
        for a, b in zip(gf, gr):
            rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
            assert rel < 5e-3

    def test_mmln_forward_and_grads(self):
        x = _rand(0, (2, 64, 512))
        w = _rand(1, (512, 256), 0.05)
        g = 1.0 + 0.1 * _rand(2, (256,))
        got = fn._mmln_forward(x, w, g, 1e-5, interpret=True)
        ref = fn._mmln_xla(x, w, g, 1e-5)
        assert float(jnp.max(jnp.abs(got - ref))) < 2e-3

        gf = jax.grad(lambda *a: jnp.sum(fn.fused_matmul_ln(*a, 1e-5) ** 2),
                      argnums=(0, 1, 2))(x, w, g)
        gr = jax.grad(lambda *a: jnp.sum(fn._mmln_xla(*a, 1e-5) ** 2),
                      argnums=(0, 1, 2))(x, w, g)
        for a, b in zip(gf, gr):
            rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
            assert rel < 5e-3

    def test_attention_param_tree_unchanged(self):
        # Attention exposes identical params on fused and module routes
        from imagen_tpu.models.blocks import Attention
        attn = Attention(dim_head=16, heads=4, dtype=jnp.float32)
        params = attn.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 128)))
        leaves = params['params']
        assert {'LayerNorm_0', 'to_q', 'to_kv', 'to_out', 'out_norm',
                'null_kv', 'q_scale', 'k_scale'} <= set(leaves)
        assert leaves['to_q']['kernel'].shape == (128, 64)
        assert leaves['to_kv']['kernel'].shape == (128, 32)
        assert leaves['out_norm']['g'].shape == (128,)

    def test_module_param_tree_unchanged(self):
        # FeedForward exposes the same LayerNorm_0/Dense_0/LayerNorm_1/Dense_1
        # tree on both the fused and module routes
        from imagen_tpu.models.blocks import FeedForward
        ff = FeedForward(mult=2., dtype=jnp.float32)
        params = ff.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 128)))
        leaves = params['params']
        assert set(leaves) == {'LayerNorm_0', 'Dense_0', 'LayerNorm_1', 'Dense_1'}
        assert leaves['Dense_0']['kernel'].shape == (128, 256)
        assert leaves['LayerNorm_1']['g'].shape == (256,)


class TestFusedFilmWiring:
    def test_block_fused_film_flag_matches_default(self, monkeypatch):
        """IMAGEN_TPU_FUSED_FILM=1 routes Block's norm->FiLM->SiLU through
        fused_film_norm; outputs must match the default chain within bf16
        tolerance, with and without a scale_shift."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from imagen_tpu.models.blocks import Block

        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 128),
                              jnp.bfloat16)
        ss = (jax.random.normal(jax.random.PRNGKey(2), (2, 1, 1, 128),
                                jnp.bfloat16),
              jax.random.normal(jax.random.PRNGKey(3), (2, 1, 1, 128),
                                jnp.bfloat16))
        m = Block(dim_out=128, dtype=jnp.bfloat16)
        p = m.init(jax.random.PRNGKey(0), x, ss)

        for args in ((x, ss), (x,)):
            monkeypatch.setenv('IMAGEN_TPU_FUSED_FILM', '0')
            y0 = np.asarray(m.apply(p, *args), np.float32)
            monkeypatch.setenv('IMAGEN_TPU_FUSED_FILM', '1')
            y1 = np.asarray(m.apply(p, *args), np.float32)
            np.testing.assert_allclose(y1, y0, atol=0.06, rtol=0.06)
