"""Gradient-accumulation semantics: multi-forward accumulation before update()
(reference trainer.py:963-989 accumulates into .grad across forward calls) and
ragged max_batch_size chunking (reference trainer.py:137-160).
"""
import jax
import jax.numpy as jnp
import numpy as np

from imagen_tpu.diffusion.imagen import Imagen
from imagen_tpu.models.unet2d import Unet
from imagen_tpu.trainer import ImagenTrainer, split_batch_ragged

TINY_UNET = dict(
    dim=8, dim_mults=(1, 2), text_embed_dim=16, cond_dim=8,
    attn_dim_head=4, attn_heads=2, attn_pool_num_latents=2, max_text_len=8,
    layer_attns=False, layer_cross_attns=(False, True),
)


def tiny_trainer(**kwargs):
    imagen = Imagen(
        unets=(Unet(**TINY_UNET),), image_sizes=(16,), text_embed_dim=16,
        timesteps=4, cond_drop_prob=0.1)
    return ImagenTrainer(imagen=imagen, use_ema=False, verbose=False, **kwargs)


def make_batch(b, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        images=jnp.asarray(rng.rand(b, 16, 16, 3).astype(np.float32)),
        text_embeds=jnp.asarray(rng.randn(b, 6, 16).astype(np.float32)),
        text_masks=jnp.ones((b, 6), bool),
    )


def tree_allclose(a, b, **kw):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


def test_multi_forward_accumulates():
    """Two forward() calls accumulate a batch-size-weighted grad sum; update()
    normalizes — so N x forward + update averages over every sample seen (a user
    following the reference's multi-forward pattern trains on ALL batches, not
    just the last one)."""
    trainer = tiny_trainer()
    trainer._ensure_state(0)
    params_before = trainer.params[0]
    # snapshot to host before update() donates the device buffers
    params_before_np = jax.tree_util.tree_map(np.asarray, params_before)

    b1, b2 = 4, 2
    batch1, batch2 = make_batch(b1, seed=1), make_batch(b2, seed=2)

    # replicate the trainer's rng threading to recompute each forward's grads
    rng = trainer.rng
    rng, key1 = jax.random.split(rng)
    rng, key2 = jax.random.split(rng)
    grad_fn = trainer._get_step_fn('grad', 0, 1)
    _, g1 = grad_fn(params_before, batch1, key1)
    _, g2 = grad_fn(params_before, batch2, key2)

    trainer.forward(**batch1)
    trainer.forward(**batch2)

    index, pending, weight = trainer._pending_grads
    assert index == 0 and weight == b1 + b2
    expected = jax.tree_util.tree_map(
        lambda a, b: a * float(b1) + b * float(b2), g1, g2)
    tree_allclose(pending['params'], expected['params'], atol=1e-6, rtol=1e-5)

    trainer.update()
    assert trainer._pending_grads is None
    assert trainer.num_steps_taken(1) == 1
    # params actually moved
    moved = any(
        not np.allclose(x, np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(params_before_np),
                        jax.tree_util.tree_leaves(trainer.params[0])))
    assert moved


def test_forward_different_unet_asserts():
    import pytest
    trainer = ImagenTrainer(
        imagen=Imagen(
            unets=(Unet(**TINY_UNET), Unet(**TINY_UNET)),
            image_sizes=(16, 16), text_embed_dim=16, timesteps=4,
            cond_drop_prob=0.1),
        use_ema=False, verbose=False, only_train_unet_number=None)
    trainer.forward(unet_number=1, **make_batch(2))
    with pytest.raises(AssertionError):
        trainer.forward(unet_number=2, **make_batch(2))


def test_ragged_max_batch_size_weighted():
    """b=6, max_batch_size=4: runs as chunks [4, 2]; loss equals the 4:2-weighted
    mean of the chunk losses (computed independently with the same keys), and no
    program ever sees more than 4 rows."""
    trainer = tiny_trainer()
    trainer._ensure_state(0)
    params = trainer.params[0]
    batch = make_batch(6, seed=3)

    chunks, sizes = split_batch_ragged(batch, 4)
    assert sizes == [4, 2]
    assert jax.tree_util.tree_leaves(chunks[0])[0].shape[0] == 4
    assert jax.tree_util.tree_leaves(chunks[1])[0].shape[0] == 2

    rng = trainer.rng
    rng, key1 = jax.random.split(rng)
    rng, key2 = jax.random.split(rng)
    grad_fn = trainer._get_step_fn('grad', 0, 1)
    l1, g1 = grad_fn(params, chunks[0], key1)
    l2, g2 = grad_fn(params, chunks[1], key2)
    expected_loss = float(l1) * (4 / 6) + float(l2) * (2 / 6)
    expected_grads = jax.tree_util.tree_map(
        lambda a, b: a * (4 / 6) + b * (2 / 6), g1, g2)

    loss, grads = trainer._grads_for_batch(0, dict(batch), 4)
    assert abs(float(loss) - expected_loss) < 1e-6
    tree_allclose(grads['params'], expected_grads['params'],
                  atol=1e-6, rtol=1e-5)


def test_ragged_train_step_runs():
    """End-to-end: a ragged train step takes one optimizer step and returns the
    weighted loss."""
    trainer = tiny_trainer()
    loss = trainer.step_with_batch(make_batch(6, seed=4), max_batch_size=4)
    assert np.isfinite(loss)
    assert trainer.num_steps_taken(1) == 1


def test_ragged_valid_step_weighted():
    trainer = tiny_trainer(split_valid_from_train=True)

    class DS:
        def __len__(self):
            return 48

        def __getitem__(self, idx):
            return (np.zeros((16, 16, 3), dtype=np.float32),
                    np.zeros((6, 16), dtype=np.float32))

    trainer.add_train_dataset(DS(), batch_size=6)
    loss = trainer.valid_step(max_batch_size=4)
    assert np.isfinite(loss)


def test_mesh_grad_accum_shards_microbatch_axis():
    """mesh + max_batch_size: the accumulation reshape puts chunks on axis 0 and
    the microbatch on axis 1 — axis 1 must shard over 'data' (sharding the scan
    axis would split sequential chunks across devices), and the sharded-accum
    loss must equal the unsharded-accum loss."""
    from imagen_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()  # 8 virtual devices on 'data'
    t_mesh = tiny_trainer(mesh=mesh, seed=7)
    t_single = tiny_trainer(seed=7)

    batch = make_batch(16, seed=5)
    b_prepped, n_chunks = t_mesh._prep_batch(dict(batch), 8)
    assert n_chunks == 2
    imgs = b_prepped['images']
    assert imgs.shape == (2, 8, 16, 16, 3)
    # microbatch axis (1) sharded over 'data'; chunk axis (0) NOT sharded
    spec = imgs.sharding.spec
    assert tuple(spec)[:2] == (None, 'data'), spec

    loss_mesh = t_mesh.step_with_batch(dict(batch), max_batch_size=8)
    loss_single = t_single.step_with_batch(dict(batch), max_batch_size=8)
    np.testing.assert_allclose(loss_mesh, loss_single, rtol=1e-5, atol=1e-6)


def test_mesh_nondivisible_batch_replicates():
    """A batch not divisible by the data axis must not silently stay on one
    device — it replicates across the mesh and still trains."""
    from imagen_tpu.parallel.mesh import create_mesh

    trainer = tiny_trainer(mesh=create_mesh())
    batch = make_batch(6, seed=6)  # 6 % 8 != 0
    prepped, n_chunks = trainer._prep_batch(dict(batch), None)
    assert n_chunks == 1
    assert len(prepped['images'].sharding.device_set) == 8
    loss = trainer.step_with_batch(dict(batch))
    assert np.isfinite(loss)
