"""Trainer tests following the reference's idiom (test_trainer.py:7-53): tiny dims,
mock T5 embeddings, step-count assertions — plus checkpoint roundtrip and EMA."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagen_tpu.configs import ImagenConfig
from imagen_tpu.diffusion.imagen import Imagen
from imagen_tpu.models.unet2d import Unet
from imagen_tpu.trainer import ImagenTrainer

KEY = jax.random.PRNGKey(0)

TINY_UNET = dict(
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


class MockDataset:
    """(image, text_embed) tuples like the reference test (test_trainer.py:28-40)."""

    def __len__(self):
        return 16

    def __getitem__(self, idx):
        return (np.zeros((16, 16, 3), dtype=np.float32),
                np.zeros((6, 16), dtype=np.float32))


def tiny_imagen(**kwargs):
    return Imagen(
        unets=(Unet(**TINY_UNET),),
        image_sizes=(16,),
        text_embed_dim=16,
        timesteps=4,
        cond_drop_prob=0.1,
        **kwargs,
    )


def test_trainer_instantiation():
    trainer = ImagenTrainer(imagen=tiny_imagen())
    assert trainer.num_unets == 1


def test_trainer_step():
    trainer = ImagenTrainer(imagen=tiny_imagen())
    trainer.add_train_dataset(MockDataset(), batch_size=8)
    loss = trainer.train_step(unet_number=1)
    assert isinstance(loss, float) and np.isfinite(loss)
    assert trainer.num_steps_taken(unet_number=1) == 1


def test_trainer_grad_accumulation():
    trainer = ImagenTrainer(imagen=tiny_imagen())
    trainer.add_train_dataset(MockDataset(), batch_size=8)
    loss = trainer.train_step(unet_number=1, max_batch_size=4)
    assert np.isfinite(loss)
    assert trainer.num_steps_taken(1) == 1


def test_trainer_forward_update_two_phase():
    trainer = ImagenTrainer(imagen=tiny_imagen())
    images = np.zeros((4, 16, 16, 3), dtype=np.float32)
    embeds = np.zeros((4, 6, 16), dtype=np.float32)
    loss = trainer.forward(images=images, text_embeds=embeds, unet_number=1)
    assert np.isfinite(loss)
    trainer.update(unet_number=1)
    assert trainer.num_steps_taken(1) == 1


def test_trainer_valid_step_and_split():
    trainer = ImagenTrainer(imagen=tiny_imagen(), split_valid_from_train=True,
                            split_valid_fraction=0.25)
    trainer.add_train_dataset(MockDataset(), batch_size=4)
    loss = trainer.train_step(unet_number=1)
    vloss = trainer.valid_step(unet_number=1)
    assert np.isfinite(loss) and np.isfinite(vloss)


def test_trainer_ema_and_sample():
    trainer = ImagenTrainer(imagen=tiny_imagen(), ema_update_after_step=0,
                            ema_update_every=1)
    trainer.add_train_dataset(MockDataset(), batch_size=8)
    for _ in range(3):
        trainer.train_step(unet_number=1)

    embeds = jnp.zeros((2, 6, 16))
    out = trainer.sample(text_embeds=embeds, use_tqdm=False)
    assert out.shape == (2, 16, 16, 3)


def test_trainer_checkpoint_roundtrip(tmp_path):
    config = ImagenConfig(
        unets=[dict(**TINY_UNET)],
        image_sizes=[16],
        timesteps=4,
        cond_drop_prob=0.1,
        text_embed_dim=16,
    )
    trainer = ImagenTrainer(imagen=config.create())
    trainer.add_train_dataset(MockDataset(), batch_size=8)
    trainer.train_step(unet_number=1)

    path = str(tmp_path / 'ckpt.ckpt')
    trainer.save(path)
    assert os.path.exists(path)

    trainer2 = ImagenTrainer(imagen=config.create())
    trainer2.load(path)
    assert trainer2.num_steps_taken(1) == 1
    # params should match bit-exactly
    a = jax.tree_util.tree_leaves(trainer.params[0])
    b = jax.tree_util.tree_leaves(trainer2.params[0])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # self-describing rehydration (reference utils.py:15-61)
    from imagen_tpu.utils.load import load_imagen_from_checkpoint
    imagen2, params2 = load_imagen_from_checkpoint(path)
    assert imagen2.num_unets == 1


def test_trainer_checkpoint_folder_rotation(tmp_path):
    trainer = ImagenTrainer(
        imagen=tiny_imagen(),
        checkpoint_path=str(tmp_path / 'ckpts'),
        checkpoint_every=1,
        max_checkpoints_keep=2,
    )
    trainer.add_train_dataset(MockDataset(), batch_size=8)
    for _ in range(4):
        trainer.train_step(unet_number=1)
    ckpts = trainer.all_checkpoints_sorted
    assert len(ckpts) == 2
    assert int(str(ckpts[0]).split('.')[-2]) == 4


def test_trainer_lr_schedule():
    trainer = ImagenTrainer(imagen=tiny_imagen(), lr=1e-3, warmup_steps=10,
                            cosine_decay_max_steps=100)
    lr0 = trainer.get_lr(1)
    assert lr0 < 1e-3  # warming up


def test_trainer_valid_step_chunked():
    trainer = ImagenTrainer(imagen=tiny_imagen(), split_valid_from_train=True,
                            split_valid_fraction=0.5)
    trainer.add_train_dataset(MockDataset(), batch_size=8)
    trainer.train_step(unet_number=1)
    vloss = trainer.valid_step(unet_number=1, max_batch_size=4)
    assert np.isfinite(vloss)


def test_use_ema_unets_context_manager():
    """reference trainer.py:846-869: inside the context, the trainer's online
    params ARE the EMA params (so arbitrary user eval code sees EMA weights);
    on exit the online params are restored untouched."""
    trainer = ImagenTrainer(imagen=tiny_imagen(), ema_update_after_step=0,
                            ema_update_every=1)
    trainer.add_train_dataset(MockDataset(), batch_size=8)
    for _ in range(2):
        trainer.train_step(unet_number=1)

    online_before = jax.tree_util.tree_map(np.asarray, trainer.params[0])
    ema = jax.tree_util.tree_map(np.asarray, trainer.ema_params[0])

    with trainer.use_ema_unets() as ema_params:
        inside = jax.tree_util.tree_leaves(trainer.params[0])
        for x, y in zip(inside, jax.tree_util.tree_leaves(ema)):
            np.testing.assert_array_equal(np.asarray(x), y)
        assert ema_params[0] is trainer.params[0]

    for x, y in zip(jax.tree_util.tree_leaves(trainer.params[0]),
                    jax.tree_util.tree_leaves(online_before)):
        np.testing.assert_array_equal(np.asarray(x), y)

    # training inside the block is blocked (it would step the EMA copies)
    import pytest
    with trainer.use_ema_unets():
        with pytest.raises(AssertionError):
            trainer.train_step(unet_number=1)

    # no-EMA trainer: yields online params, no swap
    t2 = ImagenTrainer(imagen=tiny_imagen(), use_ema=False, verbose=False)
    with t2.use_ema_unets() as params:
        assert params[0] is t2.params[0]


def test_trainer_sample_chunks_pil_and_all_outputs():
    """max_batch_size chunking merges PIL-list outputs and per-stage outputs
    (reference imagen_sample_in_chunks, trainer.py:188-206)."""
    trainer = ImagenTrainer(imagen=tiny_imagen(), use_ema=False, verbose=False)
    embeds = jnp.zeros((5, 6, 16))

    pil = trainer.sample(text_embeds=embeds, max_batch_size=2,
                         return_pil_images=True, use_tqdm=False)
    assert isinstance(pil, list) and len(pil) == 5
    from PIL import Image
    assert all(isinstance(im, Image.Image) for im in pil)

    outs = trainer.sample(text_embeds=embeds, max_batch_size=2,
                          return_all_unet_outputs=True, use_tqdm=False)
    assert isinstance(outs, list) and len(outs) == 1
    assert outs[0].shape == (5, 16, 16, 3)

    arr = trainer.sample(text_embeds=embeds, max_batch_size=2, use_tqdm=False)
    assert arr.shape == (5, 16, 16, 3)


def test_adafactor_optimizer():
    """optimizer='adafactor' (the Imagen paper's base-unet optimizer): factored
    second moment means the optimizer state stores NO full-size fp32 m/v copies
    of the big kernels, and training still converges."""
    trainer = ImagenTrainer(imagen=tiny_imagen(), optimizer='adafactor',
                            beta1=None, use_ema=False, verbose=False)
    trainer.add_train_dataset(MockDataset(), batch_size=8)
    trainer.train_step(unet_number=1)
    before = jax.tree_util.tree_map(np.asarray, trainer.params[0])
    losses = [float(trainer.train_step(unet_number=1)) for _ in range(2)]
    assert np.isfinite(losses).all()
    changed = any(
        not np.array_equal(np.asarray(a), b)
        for a, b in zip(jax.tree_util.tree_leaves(trainer.params[0]),
                        jax.tree_util.tree_leaves(before)))
    assert changed, 'adafactor update did not move the params'

    # state-size check: zero-momentum adafactor carries no first moment, so its
    # state is well under adam's two full copies even at tiny dims (the factored
    # second moment only kicks in for dims >= 128 — the real models' kernels)
    def opt_size(t):
        t._ensure_state(0)
        return sum(x.size for x in jax.tree_util.tree_leaves(t.opt_states[0])
                   if hasattr(x, 'size'))

    adam = ImagenTrainer(imagen=tiny_imagen(), use_ema=False, verbose=False)
    assert opt_size(trainer) < 0.75 * opt_size(adam)

    # per-unet mixing: adafactor for the base, adam for the SR stage
    t2 = ImagenTrainer(imagen=tiny_imagen(), optimizer=('adafactor',),
                       use_ema=False, verbose=False)
    assert t2.optimizer_kinds == ('adafactor',)


def test_reference_api_corners(capsys):
    """The reference-named trainer surface: step_with_dl_iter, get_ema_unet,
    reset_ema_unets_all_one_device, print_unet_devices, state_dict /
    load_state_dict (reference trainer.py:625-629,817-880,887-895)."""
    trainer = ImagenTrainer(imagen=tiny_imagen(), use_ema=True,
                            ema_update_every=1, ema_update_after_step=0)
    trainer.add_train_dataset(MockDataset(), batch_size=8)
    trainer.prepare()
    trainer.create_train_iter()

    loss = trainer.step_with_dl_iter(trainer.train_dl_iter, unet_number=1)
    assert np.isfinite(float(loss)) and trainer.num_steps_taken(1) == 1

    ema = trainer.get_ema_unet(1)
    assert ema is not None
    assert jax.tree_util.tree_structure(ema) == \
        jax.tree_util.tree_structure(trainer.params[0])

    trainer.reset_ema_unets_all_one_device()
    trainer.print_unet_devices()
    printed = capsys.readouterr().out
    assert 'unet 0' in printed and 'ema unet 0' in printed

    # state_dict -> mutate -> load_state_dict restores params AND step count
    bundle = trainer.state_dict()
    leaf0 = jax.tree_util.tree_leaves(trainer.params[0])[0]
    trainer.step_with_dl_iter(trainer.train_dl_iter, unet_number=1)
    assert trainer.num_steps_taken(1) == 2
    trainer.load_state_dict(bundle)
    assert trainer.num_steps_taken(1) == 1
    restored0 = jax.tree_util.tree_leaves(trainer.params[0])[0]
    assert jnp.allclose(jnp.asarray(leaf0), jnp.asarray(restored0))

    ema_off = ImagenTrainer(imagen=tiny_imagen(), use_ema=False)
    assert ema_off.get_ema_unet(1) is None


def test_unknown_kwarg_raises():
    """The reference forwards stray kwargs into torch Adam, which raises on a
    typo; silently swallowing them made `weight_decay=`-style typos no-ops
    (round-4 verdict). Reference trainer.py:335-341."""
    with pytest.raises(TypeError, match='wieght_decay'):
        ImagenTrainer(imagen=tiny_imagen(), wieght_decay=1e-2)


def test_weight_decay_changes_update():
    """`weight_decay` must actually reach the optimizer (torch-Adam L2
    semantics via optax.add_decayed_weights); per-unet tuple accepted."""
    imgs = np.random.RandomState(0).rand(2, 16, 16, 3).astype('float32')
    te = np.random.RandomState(1).rand(2, 6, 16).astype('float32')
    sums = []
    for wd in (0.0, 1e-1):
        t = ImagenTrainer(imagen=tiny_imagen(), use_ema=False, verbose=False,
                          weight_decay=wd, seed=0)
        for _ in range(2):
            t.forward(images=imgs, text_embeds=te, unet_number=1)
            t.update(1)
        # a conv kernel (ndim 4) is wd-eligible under group_wd_params
        leaves = [l for l in jax.tree_util.tree_leaves(t.params[0]) if l.ndim >= 2]
        sums.append(float(np.asarray(leaves[0], np.float64).sum()))
    assert abs(sums[0] - sums[1]) > 1e-9, sums

    # per-unet tuple form constructs fine
    ImagenTrainer(imagen=tiny_imagen(), use_ema=False, verbose=False,
                  weight_decay=(1e-2,))


def test_group_wd_params_mask():
    """group_wd_params=True exempts ndim<2 leaves (norm gains / biases) from
    decay: after steps with a huge wd, 1-d leaves must match the wd=0 run."""
    imgs = np.random.RandomState(0).rand(2, 16, 16, 3).astype('float32')
    te = np.random.RandomState(1).rand(2, 6, 16).astype('float32')

    def onedim_sum(trainer):
        leaves = [l for l in jax.tree_util.tree_leaves(trainer.params[0])
                  if l.ndim < 2]
        return sum(float(np.asarray(l, np.float64).sum()) for l in leaves)

    runs = []
    for wd in (0.0, 10.0):
        t = ImagenTrainer(imagen=tiny_imagen(), use_ema=False, verbose=False,
                          weight_decay=wd, group_wd_params=True, seed=0)
        t.forward(images=imgs, text_embeds=te, unet_number=1)
        t.update(1)
        runs.append(onedim_sum(t))
    # one step from identical init: 1-d params saw identical (undecayed) grads
    assert abs(runs[0] - runs[1]) < 1e-6, runs
