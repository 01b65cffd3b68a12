"""Pallas halo-DMA conv kernels (ops/conv2d.py) vs the XLA reference.

The kernels are measured negatives (unwired — see the module docstring), but
they stay exactness-tested so the halo-DMA pattern remains a trustworthy
reference for future tuning.
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
