"""Flash attention kernel correctness vs the naive XLA path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagen_tpu.ops.flash_attention import (
    _flash_mqa_forward,
    _naive_mqa,
    flash_attention_available,
)


@pytest.mark.parametrize('n,nk', [(256, 256), (256, 291), (512, 300)])
@pytest.mark.parametrize('tier', ['loop', 'stream'])
def test_flash_matches_naive(n, nk, tier):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    b, h, d = 2, 3, 64
    q = jax.random.normal(kq, (b, h, n, d))
    k = jax.random.normal(kk, (b, nk, d))
    v = jax.random.normal(kv, (b, nk, d))

    out_naive = _naive_mqa(q, k, v, scale=8.)
    out_flash = _flash_mqa_forward(q, k, v, scale=8., block_q=128, block_k=128,
                                   interpret=True, _force_tier=tier)
    # online-softmax accumulation order differs from the single-pass reference
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_naive), atol=5e-4, rtol=1e-3)


@pytest.fixture
def interpret_mode():
    """Route the public custom_vjp entry points through interpret-mode kernels."""
    import imagen_tpu.ops.flash_attention as fa
    fa._INTERPRET = True
    yield fa
    fa._INTERPRET = False


@pytest.mark.parametrize('bwd_tier', ['oneshot', 'stream'])
def test_flash_gradient_matches_naive(interpret_mode, bwd_tier, monkeypatch):
    """The Pallas backward kernels vs XLA autodiff of the naive attention —
    exact up to fp32 accumulation-order noise. Covers BOTH backward tiers: the
    fused one-shot kernel (bounded nk, all five matmuls in one pass) and the
    two grid-streamed kernels (unbounded nk)."""
    fa = interpret_mode
    if bwd_tier == 'stream':
        monkeypatch.setattr(fa, '_ONESHOT_MAX_NK', 0)
    key = jax.random.PRNGKey(1)
    kq, kk, kv, kg = jax.random.split(key, 4)
    b, h, n, nk, d = 2, 3, 256, 300, 32
    q = jax.random.normal(kq, (b, h, n, d))
    k = jax.random.normal(kk, (b, nk, d))
    v = jax.random.normal(kv, (b, nk, d))
    g = jax.random.normal(kg, (b, h, n, d))

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_multiquery_attention(q, k, v, 8.) * g)

    def loss_naive(q, k, v):
        return jnp.sum(fa._naive_mqa(q, k, v, 8.) * g)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-2, rtol=1e-4)


def test_flash_cosine_gradient_matches_naive(interpret_mode):
    """Fused cosine variant: grads for q/k/v AND the learned per-dim gains, with the
    l2norm VJP chained outside the kernels."""
    fa = interpret_mode
    key = jax.random.PRNGKey(2)
    kq, kk, kv, kg = jax.random.split(key, 4)
    b, h, n, nk, d = 2, 2, 256, 290, 32
    q = jax.random.normal(kq, (b, h, n, d))
    k = jax.random.normal(kk, (b, nk, d))
    v = jax.random.normal(kv, (b, nk, d))
    g = jax.random.normal(kg, (b, h, n, d))
    qs = jax.random.uniform(jax.random.PRNGKey(5), (d,), minval=0.5, maxval=1.5)
    ks = jax.random.uniform(jax.random.PRNGKey(6), (d,), minval=0.5, maxval=1.5)

    def loss_flash(q, k, v, qs, ks):
        return jnp.sum(fa.flash_cosine_mqa(q, k, v, qs, ks, 8.) * g)

    def loss_naive(q, k, v, qs, ks):
        return jnp.sum(fa._naive_cosine_mqa(q, k, v, qs, ks, 8.) * g)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, qs, ks)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2, 3, 4))(q, k, v, qs, ks)
    for a, b_ in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_flash_gate():
    assert not flash_attention_available(256, 64, False, False)   # too short
    assert not flash_attention_available(4096, 64, True, False)   # masked
    assert not flash_attention_available(4096, 64, False, True)   # biased
    # 40x40 fmap = 1600 tokens: no aligned block tiles it -> XLA fallback, no crash
    assert not flash_attention_available(1600, 64, False, False)
    # long unmasked: gated only by backend (cpu in tests)
    expected = jax.default_backend() == 'tpu'
    assert flash_attention_available(4096, 64, False, False) == expected


def test_fused_cosine_flash_matches_xla():
    from imagen_tpu.ops.flash_attention import (
        _flash_mqa_forward, _naive_cosine_mqa)
    key = jax.random.PRNGKey(3)
    kq, kk, kv, ks = jax.random.split(key, 4)
    b, h, n, nk, d = 2, 2, 256, 270, 32
    q = jax.random.normal(kq, (b, h, n, d))
    k = jax.random.normal(kk, (b, nk, d))
    v = jax.random.normal(kv, (b, nk, d))
    q_scale = jax.random.uniform(ks, (d,), minval=0.5, maxval=1.5)
    k_scale = jax.random.uniform(jax.random.PRNGKey(4), (d,),
                                 minval=0.5, maxval=1.5)

    out_ref = _naive_cosine_mqa(q, k, v, q_scale, k_scale, 8.)
    out_fused = _flash_mqa_forward(q, k, v, 8., block_q=128, block_k=128,
                                   interpret=True, q_scale=q_scale,
                                   k_scale=k_scale)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), atol=5e-4, rtol=1e-3)


def test_fused_film_norm_matches_reference():
    from imagen_tpu.ops.fused_norm import _forward, _xla_reference
    key = jax.random.PRNGKey(0)
    kx, kg, ks, kh = jax.random.split(key, 4)
    b, h, w, c = 2, 8, 8, 32
    x = jax.random.normal(kx, (b, h, w, c))
    gamma = jax.random.uniform(kg, (c,), minval=0.5, maxval=1.5)
    scale = jax.random.normal(ks, (b, c)) * 0.1
    shift = jax.random.normal(kh, (b, c)) * 0.1

    ref = _xla_reference(x, gamma, scale[:, None, None, :],
                         shift[:, None, None, :])
    out = _forward(x, gamma, scale, shift, block_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_film_norm_grads():
    from imagen_tpu.ops.fused_norm import fused_film_norm, _xla_reference
    key = jax.random.PRNGKey(1)
    kx, kg, ks, kh = jax.random.split(key, 4)
    b, h, w, c = 1, 4, 4, 16
    x = jax.random.normal(kx, (b, h, w, c))
    gamma = jnp.ones((c,))
    scale = jax.random.normal(ks, (b, c)) * 0.1
    shift = jax.random.normal(kh, (b, c)) * 0.1

    # interpret-mode on CPU: forward falls back to XLA when rows % block != 0;
    # force comparison via the vjp (backward is XLA either way)
    def loss_ref(x, gamma, scale, shift):
        return jnp.sum(_xla_reference(
            x, gamma, scale[:, None, None, :], shift[:, None, None, :]) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, gamma, scale, shift)
    g_fused = jax.grad(
        lambda *a: jnp.sum(fused_film_norm(*a) ** 2),
        argnums=(0, 1, 2, 3))(x, gamma, scale, shift)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_grouped_temporal_matches_xla(interpret_mode):
    """The grouped temporal-attention fast path (G pixels per program,
    block-diagonal bias tile) == the VideoAttention XLA path."""
    fa = interpret_mode
    import imagen_tpu.models.video_blocks as vb

    b, f, heads, d, c = 16, 8, 4, 32, 64   # rows_pp = 32, nk_local = 9
    x = jax.random.normal(jax.random.PRNGKey(0), (b, f, c))

    mod = vb.VideoAttention(dim_head=d, heads=heads, causal=True,
                            rel_pos_bias=True, init_zero=False)
    variables = mod.init(jax.random.PRNGKey(1), x)

    G = fa.grouped_temporal_available(b, f, heads, f + 1, interpret=True)
    assert G is not None and G > 1, 'grouped path must engage for this shape'
    out_grouped = mod.apply(variables, x)

    orig = fa.grouped_temporal_available
    fa.grouped_temporal_available = lambda *a, **kw: None
    try:
        out_xla = mod.apply(variables, x)
    finally:
        fa.grouped_temporal_available = orig

    np.testing.assert_allclose(np.asarray(out_grouped), np.asarray(out_xla),
                               atol=2e-3, rtol=2e-3)


def test_grouped_temporal_grads(interpret_mode):
    """Grouped path gradients (XLA-recompute backward) vs the XLA path."""
    fa = interpret_mode
    import imagen_tpu.models.video_blocks as vb

    b, f, heads, d, c = 16, 8, 4, 32, 64
    x = jax.random.normal(jax.random.PRNGKey(2), (b, f, c))
    mod = vb.VideoAttention(dim_head=d, heads=heads, causal=True,
                            rel_pos_bias=True, init_zero=False)
    variables = mod.init(jax.random.PRNGKey(3), x)

    def loss(v_, use_grouped):
        orig = fa.grouped_temporal_available
        if not use_grouped:
            fa.grouped_temporal_available = lambda *a, **kw: None
        try:
            return jnp.sum(mod.apply(v_, x).astype(jnp.float32) ** 2)
        finally:
            fa.grouped_temporal_available = orig

    g1 = jax.grad(lambda v_: loss(v_, True))(variables)
    g2 = jax.grad(lambda v_: loss(v_, False))(variables)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b_ in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-2, rtol=3e-2)

def test_temporal_rows_kernel_matches_naive(interpret_mode, monkeypatch):
    """flash_temporal_rows == its XLA reference semantics, direct call."""
    fa = interpret_mode
    monkeypatch.setenv('IMAGEN_TPU_TEMPORAL_ROWS', '1')   # opt-in path
    B, F, H, D, NKL = 16, 4, 2, 8, 5
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    q = jax.random.normal(ks[0], (B, F, H * D))
    k = jax.random.normal(ks[1], (B, NKL, D))
    v = jax.random.normal(ks[2], (B, NKL, D))
    qs = jnp.abs(jax.random.normal(ks[3], (D,))) + 0.5
    ksc = jnp.abs(jax.random.normal(ks[4], (D,))) + 0.5
    bias = jax.random.normal(ks[5], (H, F, NKL))

    G = fa.temporal_rows_available(B, F, H, NKL, interpret=True)
    assert G is not None and G > 1
    assert G * NKL <= 128, 'all keys must share one lane tile'
    cm = jnp.triu(jnp.ones((F, NKL), bool), NKL - F + 1)
    tile = fa.build_rows_bias(bias, cm, G)
    args = (q.reshape(B // G, G * F, H * D), k.reshape(B // G, G * NKL, D),
            v.reshape(B // G, G * NKL, D), qs, ksc, tile)

    out = fa.flash_temporal_rows(*args, 8.0, H)
    ref = fa._temporal_rows_naive(*args, 8.0, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # grads flow through the custom_vjp (XLA-recompute backward)
    g1 = jax.grad(lambda q_: jnp.sum(
        fa.flash_temporal_rows(q_, *args[1:], 8.0, H) ** 2))(args[0])
    g2 = jax.grad(lambda q_: jnp.sum(
        fa._temporal_rows_naive(q_, *args[1:], 8.0, H) ** 2))(args[0])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4, rtol=1e-4)


def test_temporal_rows_in_video_attention(interpret_mode, monkeypatch):
    """VideoAttention dispatches to the rows-packed path when opted in and
    matches the XLA path (the path is opt-in: measured slower than grouped,
    see BENCH.md)."""
    fa = interpret_mode
    monkeypatch.setenv('IMAGEN_TPU_TEMPORAL_ROWS', '1')
    import imagen_tpu.models.video_blocks as vb

    b, f, heads, d, c = 16, 8, 4, 32, 64   # nk_local = 9 -> Gr = 8
    x = jax.random.normal(jax.random.PRNGKey(0), (b, f, c))
    mod = vb.VideoAttention(dim_head=d, heads=heads, causal=True,
                            rel_pos_bias=True, init_zero=False)
    variables = mod.init(jax.random.PRNGKey(1), x)

    Gr = fa.temporal_rows_available(b, f, heads, f + 1, interpret=True)
    assert Gr is not None and Gr > 1, 'rows path must engage for this shape'
    out_rows = mod.apply(variables, x)

    orig_r, orig_g = fa.temporal_rows_available, fa.grouped_temporal_available
    fa.temporal_rows_available = lambda *a, **kw: None
    fa.grouped_temporal_available = lambda *a, **kw: None
    try:
        out_xla = mod.apply(variables, x)
    finally:
        fa.temporal_rows_available = orig_r
        fa.grouped_temporal_available = orig_g

    np.testing.assert_allclose(np.asarray(out_rows), np.asarray(out_xla),
                               atol=2e-3, rtol=2e-3)
