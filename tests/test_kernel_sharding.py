"""Pallas kernels under GSPMD sharding (round-4 verdict Weak #3 / order #2).

A pallas_call is an opaque custom call; without wrapping, GSPMD replicates its
operands (a full-batch all-gather in front of every kernel) on a multi-chip
mesh. `parallel.kernel_sharding` wraps every batch-parallel kernel in
`jax.shard_map` over the data axis when a kernel mesh is active. These tests
run the REAL kernel wrappers (interpret mode) on the 8-virtual-device CPU
mesh and assert: sharded == single-device numerics for forward AND gradients,
and the compiled sharded HLO contains no all-gather around the kernels.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import imagen_tpu.ops.flash_attention as fa
from imagen_tpu.parallel.kernel_sharding import (
    active_kernel_mesh, kernel_batch_sharding, shard_over_batch)
from imagen_tpu.parallel.mesh import create_mesh


@pytest.fixture()
def interpret_kernels(monkeypatch):
    monkeypatch.setattr(fa, '_INTERPRET', True)
    import imagen_tpu.ops.conv2d as c2d
    monkeypatch.setattr(c2d, '_INTERPRET', True)
    yield


def _mesh():
    return create_mesh()  # 8-device 'data' mesh from conftest's virtual devices


def _shard(mesh, *arrays):
    return tuple(jax.device_put(a, NamedSharding(mesh, P('data')))
                 for a in arrays)


def test_context_nesting_and_default():
    assert active_kernel_mesh()[0] is None
    mesh = _mesh()
    with kernel_batch_sharding(mesh):
        assert active_kernel_mesh() == (mesh, 'data')
        with kernel_batch_sharding(None):
            assert active_kernel_mesh()[0] is None
        assert active_kernel_mesh() == (mesh, 'data')
    assert active_kernel_mesh()[0] is None


def test_flash_rows_sharded_matches_single(interpret_kernels):
    b, rows, nk, d = 16, 256, 192, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, rows, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, nk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, nk, d), jnp.float32)

    def loss(q, k, v):
        return (fa.flash_mqa_rows(q, k, v, 8.0) ** 2).mean()

    ref_l, ref_g = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)

    mesh = _mesh()
    qd, kd, vd = _shard(mesh, q, k, v)
    with kernel_batch_sharding(mesh):
        got_l, got_g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))(
            qd, kd, vd)
    np.testing.assert_allclose(float(ref_l), float(got_l), rtol=1e-5)
    for r, g in zip(ref_g, got_g):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=2e-5, atol=2e-6)


def test_flash_cosine_rows_sharded_grads_and_no_allgather(interpret_kernels):
    """Cosine variant: batch-sharded q/k/v plus REPLICATED learned gains —
    the gain cotangents must be psum'd across shards (shard_map transpose).
    Also the headline structural claim: the compiled sharded program contains
    NO all-gather (GSPMD never sees the kernel)."""
    b, rows, nk, d = 16, 128, 128, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    q = jax.random.normal(ks[0], (b, rows, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, nk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, nk, d), jnp.float32)
    qs = 1. + 0.1 * jax.random.normal(ks[3], (d,), jnp.float32)
    kscale = 1. + 0.1 * jax.random.normal(ks[4], (d,), jnp.float32)

    def loss(q, k, v, qs, kscale):
        return (fa.flash_cosine_mqa_rows(q, k, v, qs, kscale, 8.0) ** 2).mean()

    ref = jax.value_and_grad(loss, argnums=(0, 3, 4))(q, k, v, qs, kscale)

    mesh = _mesh()
    qd, kd, vd = _shard(mesh, q, k, v)
    qs_d = jax.device_put(qs, NamedSharding(mesh, P()))
    ks_d = jax.device_put(kscale, NamedSharding(mesh, P()))
    gfn = jax.jit(jax.value_and_grad(loss, argnums=(0, 3, 4)))
    with kernel_batch_sharding(mesh):
        got = gfn(qd, kd, vd, qs_d, ks_d)
        hlo = jax.jit(loss).lower(qd, kd, vd, qs_d, ks_d).compile().as_text()

    np.testing.assert_allclose(float(ref[0]), float(got[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ref[1][0]), np.asarray(got[1][0]),
                               rtol=2e-5, atol=2e-6)   # dq (sharded)
    np.testing.assert_allclose(np.asarray(ref[1][1]), np.asarray(got[1][1]),
                               rtol=2e-5, atol=2e-6)   # d q_scale (psum'd)
    np.testing.assert_allclose(np.asarray(ref[1][2]), np.asarray(got[1][2]),
                               rtol=2e-5, atol=2e-6)   # d k_scale (psum'd)
    assert 'all-gather' not in hlo, \
        'GSPMD inserted an all-gather around the sharded kernel'


def test_grouped_temporal_sharded_matches_single(interpret_kernels):
    B, G, f, heads, d = 16, 4, 8, 2, 32
    nk = f
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    q = jax.random.normal(ks[0], (B, G * f, heads * d), jnp.float32)
    k = jax.random.normal(ks[1], (B, G * nk, d), jnp.float32)
    v = jax.random.normal(ks[2], (B, G * nk, d), jnp.float32)
    qs = 1. + 0.1 * jax.random.normal(ks[3], (d,), jnp.float32)
    kscale = 1. + 0.1 * jax.random.normal(ks[4], (d,), jnp.float32)
    bias_hfj = jnp.zeros((heads, f, nk), jnp.float32)
    causal = jnp.triu(jnp.ones((f, nk), bool), nk - f + 1)
    tile = fa.build_grouped_bias(bias_hfj, causal, G)

    def run(q, k, v):
        return fa.flash_grouped_cosine(q, k, v, qs, kscale, tile, 8.0, heads)

    ref = run(q, k, v)
    mesh = _mesh()
    qd, kd, vd = _shard(mesh, q, k, v)
    with kernel_batch_sharding(mesh):
        got = jax.jit(run)(qd, kd, vd)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-5, atol=2e-6)


def test_conv2d_same_sharded_matches_single(interpret_kernels):
    import imagen_tpu.ops.conv2d as c2d
    b, H, W, cin, cout = 8, 8, 128, 128, 128   # shape the halo kernel tiles
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(ks[0], (b, H, W, cin), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, cin, cout), jnp.float32) * 0.05
    bias = jax.random.normal(ks[2], (cout,), jnp.float32)

    def loss(x, w, bias):
        return (c2d.conv2d_same(x, w, bias) ** 2).mean()

    ref = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, w, bias)
    mesh = _mesh()
    (xd,) = _shard(mesh, x)
    wd = jax.device_put(w, NamedSharding(mesh, P()))
    bd = jax.device_put(bias, NamedSharding(mesh, P()))
    with kernel_batch_sharding(mesh):
        got = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))(xd, wd, bd)
    np.testing.assert_allclose(float(ref[0]), float(got[0]), rtol=1e-5)
    for r, g in zip(ref[1], got[1]):   # dx sharded; dw/db psum'd
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=2e-5, atol=2e-6)


def test_fused_feedforward_sharded_matches_single():
    from imagen_tpu.ops import fused_norm as fn
    rows_b, n, dim, hid = 8, 32, 128, 256
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    x = jax.random.normal(ks[0], (rows_b, n, dim), jnp.float32)
    g0 = jnp.ones((dim,))
    w0 = jax.random.normal(ks[1], (dim, hid), jnp.float32) * 0.05
    g1 = jnp.ones((hid,))
    w1 = jax.random.normal(ks[2], (hid, dim), jnp.float32) * 0.05

    def loss(x, g0, w0, g1, w1):
        # interpret path: _ff_forward falls back to XLA off-TPU, which is the
        # same numerics; what this tests is the shard_map wrapping + grads
        return (fn.fused_feedforward(x, g0, w0, g1, w1, 1e-5) ** 2).mean()

    ref = jax.value_and_grad(loss, argnums=(0, 2))(x, g0, w0, g1, w1)
    mesh = _mesh()
    (xd,) = _shard(mesh, x)
    repl = lambda t: jax.device_put(t, NamedSharding(mesh, P()))
    with kernel_batch_sharding(mesh):
        got = jax.jit(jax.value_and_grad(loss, argnums=(0, 2)))(
            xd, repl(g0), repl(w0), repl(g1), repl(w1))
    np.testing.assert_allclose(float(ref[0]), float(got[0]), rtol=1e-5)
    for r, g in zip(ref[1], got[1]):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=2e-5, atol=2e-6)


def test_indivisible_batch_falls_back(interpret_kernels):
    """Batch not divisible by the axis: shard_over_batch must call the kernel
    directly (replicated semantics) and stay correct."""
    b, rows, nk, d = 6, 128, 128, 64   # 6 % 8 != 0
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (b, rows, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, nk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, nk, d), jnp.float32)
    ref = fa.flash_mqa_rows(q, k, v, 8.0)
    with kernel_batch_sharding(_mesh()):
        got = jax.jit(lambda q, k, v: fa.flash_mqa_rows(q, k, v, 8.0))(q, k, v)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-5, atol=2e-6)


def test_no_double_wrap_inside_shard_map(interpret_kernels):
    """A kernel already under manual sharding (user shard_map) must not be
    re-wrapped — _in_manual_context detects the bound axis env."""
    mesh = _mesh()
    b, rows, nk, d = 16, 128, 128, 64
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    q = jax.random.normal(ks[0], (b, rows, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, nk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, nk, d), jnp.float32)
    ref = fa.flash_mqa_rows(q, k, v, 8.0)

    def inner(q, k, v):
        return fa.flash_mqa_rows(q, k, v, 8.0)

    with kernel_batch_sharding(mesh):
        got = jax.jit(jax.shard_map(
            inner, mesh=mesh, in_specs=P('data'), out_specs=P('data'),
            check_vma=False))(*_shard(mesh, q, k, v))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-5, atol=2e-6)


def test_trainer_step_kernel_route_sharded_matches_single(
        interpret_kernels, monkeypatch):
    """End-to-end: a full trainer step on the 8-device mesh with the Pallas
    kernel route FORCED ON (interpret) matches the identical single-device
    step — the kernels run inside shard_map under the real jitted train
    program, grads and optimizer included."""
    monkeypatch.setattr(fa, 'flash_attention_available',
                        lambda *a, **k: True)
    from imagen_tpu.diffusion.imagen import Imagen
    from imagen_tpu.models.unet2d import Unet
    from imagen_tpu.trainer import ImagenTrainer

    def build(mesh):
        unet = Unet(dim=32, dim_mults=(1, 2), text_embed_dim=16, cond_dim=16,
                    attn_dim_head=16, attn_heads=2, attn_pool_num_latents=2,
                    max_text_len=8, layer_attns=(False, True),
                    layer_cross_attns=(False, True))
        imagen = Imagen(unets=(unet,), image_sizes=(16,), text_embed_dim=16,
                        timesteps=4, cond_drop_prob=0.)
        return ImagenTrainer(imagen=imagen, mesh=mesh, use_ema=False,
                             verbose=False, lr=1e-3)

    images = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(7), (8, 16, 16, 3)))
    embeds = np.asarray(jax.random.normal(jax.random.PRNGKey(8), (8, 8, 16)))
    batch = dict(images=images, text_embeds=embeds,
                 text_masks=np.ones((8, 8), bool))

    single = build(None)
    sharded = build(_mesh())
    single.rng = jax.random.PRNGKey(11)
    sharded.rng = jax.random.PRNGKey(11)
    losses = []
    for t in (single, sharded):
        l = [t.step_with_batch(dict(batch)) for _ in range(2)]
        losses.append(l)
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
