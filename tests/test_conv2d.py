"""Pallas halo-DMA conv kernels (ops/conv2d.py) vs the XLA reference.

The NHWC kernel is WIRED on its measured win surface (blocks.SameConv3x3
gate: mid-res big-channel, full-res 1024^2, and deep 64^2 big-cin classes —
BENCH.md); the cf tiny-Cout variant stays a tested negative. Exactness
covers forward, grads, the availability envelope, and the cin-split path.
"""
import jax
import jax.numpy as jnp
import pytest

import imagen_tpu.ops.conv2d as c2d


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(c2d, '_INTERPRET', True)


def _rand(shape, key, scale=0.05):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale


@pytest.mark.parametrize('shape,cout', [
    ((1, 16, 128, 128), 3),     # tiny cout
    ((2, 8, 128, 128), 128),
    ((1, 32, 128, 256), 256),   # multiple h blocks
    ((2, 16, 128, 128), 384),
    ((1, 8, 128, 512), 1024),   # cb < cout: real multi-block cout grid (cb=128)
])
def test_conv2d_same_matches_xla(shape, cout):
    b, H, W, cin = shape
    x = _rand(shape, 0, 1.0)
    w = _rand((3, 3, cin, cout), 1)
    bias = _rand((cout,), 2, 1.0)
    ref = c2d._xla_reference(x, w, bias)
    out = c2d.conv2d_same(x, w, bias)
    assert jnp.max(jnp.abs(ref - out)) < 1e-3


@pytest.mark.parametrize('shape,cout', [
    ((1, 16, 128, 128), 3),
    ((2, 8, 256, 128), 3),
    ((1, 24, 128, 128), 8),
])
def test_conv2d_same_cf_matches_xla(shape, cout):
    b, H, W, cin = shape
    x = _rand(shape, 0, 1.0)
    w = _rand((3, 3, cin, cout), 1)
    bias = _rand((cout,), 2, 1.0)
    ref = c2d._xla_reference_cf(x, w, bias)
    out = c2d.conv2d_same_cf(x, w, bias)
    assert jnp.max(jnp.abs(ref - out)) < 1e-3


def test_conv2d_same_narrow_width_matches_xla():
    """W=64 (below one 128-lane tile): the deep SRUnet1024 64^2 classes the
    round-5 gate extension routes (cin >= 1024). Kernel exactness at the
    narrow width plus the cin-SPLIT path (cin too big for one VMEM tiling
    runs as two half-cin kernel calls summed)."""
    # small-cin stand-in for the narrow-width geometry
    x = _rand((2, 16, 64, 128), 0, 1.0)
    w = _rand((3, 3, 128, 128), 1)
    bias = _rand((128,), 2, 1.0)
    ref = c2d._xla_reference(x, w, bias)
    out = c2d.conv2d_same(x, w, bias)
    assert jnp.max(jnp.abs(ref - out)) < 1e-3


def test_conv2d_same_cin_split_matches_xla():
    """A shape whose FULL cin has no tiling but whose halves do (the
    2048-cin skip-concat class, scaled down via fp32 itemsize): forward and
    grads must match XLA through the split+sum path."""
    H, W, cin, cout = 8, 128, 1024, 512
    assert c2d._pick_blocks(H, W, cin, cout, 3, 4) is None
    assert c2d._tiles_with_split(H, W, cin, cout, 3, 4)
    x = _rand((1, H, W, cin), 0, 1.0)
    w = _rand((3, 3, cin, cout), 1)
    bias = _rand((cout,), 2, 1.0)
    ref = c2d._xla_reference(x, w, bias)
    out = c2d.conv2d_same(x, w, bias)
    assert jnp.max(jnp.abs(ref - out)) < 1e-3

    def loss_k(x_, w_, b_):
        return jnp.sum(c2d.conv2d_same(x_, w_, b_) ** 2)

    def loss_r(x_, w_, b_):
        return jnp.sum(c2d._xla_reference(x_, w_, b_) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, w, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, bias)
    for a, b in zip(gk, gr):
        assert jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9) < 1e-3


def test_conv2d_same_grads_route_through_xla():
    x = _rand((1, 8, 128, 128), 0, 1.0)
    w = _rand((3, 3, 128, 128), 1)
    bias = _rand((128,), 2, 1.0)

    def loss_pallas(x, w, b):
        return jnp.sum(c2d.conv2d_same(x, w, b) ** 2)

    def loss_xla(x, w, b):
        return jnp.sum(c2d._xla_reference(x, w, b) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, bias)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, bias)
    for a, b_ in zip(g_p, g_x):
        assert jnp.max(jnp.abs(a - b_)) < 1e-2


def test_availability_gates():
    # unwired, but the envelope must stay consistent with the kernel's limits
    assert not c2d.conv2d_same_available((2, 64, 64, 96), (3, 3, 96, 128),
                                         jnp.bfloat16)  # cin not 128-aligned
    assert not c2d.conv2d_same_available((2, 64, 100, 128), (3, 3, 128, 128),
                                         jnp.bfloat16)  # W not lane-aligned
    assert not c2d.conv2d_same_cf_available((2, 64, 64, 128), (3, 3, 128, 64),
                                            jnp.bfloat16)  # cout too big


def test_availability_honors_dtype_budget():
    """The gate must size VMEM blocks at the REAL itemsize: at fp32 this shape
    has no valid tiling, so availability must be False — approving it and then
    crashing in _forward (the round-4 review repro) is the bug being pinned."""
    shape, wshape = (2, 8, 128, 1024), (3, 3, 1024, 512)
    assert c2d._pick_blocks(8, 128, 1024, 512, 3, 4) is None
    assert not c2d.conv2d_same_available(shape, wshape, jnp.float32)


def test_gate_true_implies_forward_works():
    """Every shape the gate approves must actually run through the kernel."""
    cases = [((1, 128, 128, 128), 128, jnp.float32),
             ((2, 256, 128, 256), 256, jnp.float32)]
    for shape, cout, dt in cases:
        b, H, W, cin = shape
        assert c2d.conv2d_same_available(shape, (3, 3, cin, cout), dt)
        x = _rand(shape, 0, 1.0).astype(dt)
        w = _rand((3, 3, cin, cout), 1).astype(dt)
        out = c2d.conv2d_same(x, w, None)
        assert out.shape == (b, H, W, cout)

# --- SameConv3x3: the models' wired dispatch point --------------------------------------

def test_sameconv3x3_param_tree_matches_nn_conv():
    """Drop-in guarantee: identical param names/shapes/init values to nn.Conv,
    so checkpoints and the torch weight-port see no difference."""
    import flax.linen as nn
    from imagen_tpu.models.blocks import SameConv3x3

    x = _rand((1, 8, 16, 32), 0, 1.0)
    key = jax.random.PRNGKey(7)
    ours = SameConv3x3(64).init(key, x)
    ref = nn.Conv(64, (3, 3), padding='SAME').init(key, x)
    assert jax.tree_util.tree_structure(ours) == jax.tree_util.tree_structure(ref)
    for a, b in zip(jax.tree_util.tree_leaves(ours),
                    jax.tree_util.tree_leaves(ref)):
        assert a.shape == b.shape and jnp.array_equal(a, b)


def test_sameconv3x3_fallback_equals_nn_conv():
    """Off the gate surface (tiny shape) the module must be numerically
    IDENTICAL to nn.Conv — it's the same XLA conv + bias add."""
    import flax.linen as nn
    from imagen_tpu.models.blocks import SameConv3x3

    x = _rand((2, 8, 16, 32), 0, 1.0)
    params = SameConv3x3(48).init(jax.random.PRNGKey(1), x)
    ref = nn.Conv(48, (3, 3), padding='SAME').apply(params, x)
    out = SameConv3x3(48).apply(params, x)
    assert jnp.array_equal(out, ref)


def test_sameconv3x3_pallas_dispatch_and_grads(monkeypatch):
    """On the gate surface the module must route through conv2d_same and keep
    value/grad agreement with nn.Conv."""
    import flax.linen as nn
    from imagen_tpu.models import blocks
    from imagen_tpu.models.blocks import SameConv3x3

    called = {}
    real = c2d.conv2d_same

    def spy(x, w, b):
        called['hit'] = True
        return real(x, w, b)

    monkeypatch.setattr(c2d, 'conv2d_same', spy)

    shape = (1, 128, 128, 128)
    x = _rand(shape, 0, 1.0)
    assert c2d.conv2d_same_available(shape, (3, 3, 128, 128), x.dtype)
    params = SameConv3x3(128).init(jax.random.PRNGKey(2), x)

    def loss_ours(p, x):
        return jnp.sum(SameConv3x3(128).apply(p, x) ** 2)

    def loss_ref(p, x):
        return jnp.sum(nn.Conv(128, (3, 3), padding='SAME').apply(p, x) ** 2)

    (v_o, g_o), (v_r, g_r) = (jax.value_and_grad(f, argnums=(0, 1))(params, x)
                              for f in (loss_ours, loss_ref))
    assert called.get('hit'), 'gate shape did not dispatch to the Pallas kernel'
    assert jnp.abs(v_o - v_r) / jnp.abs(v_r) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(g_o), jax.tree_util.tree_leaves(g_r)):
        assert jnp.max(jnp.abs(a - b)) < 1e-2
