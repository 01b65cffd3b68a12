"""Cross-framework numerical parity for the VIDEO unet vs the PyTorch reference.

Same harness pattern as tests/test_reference_parity.py, for `Unet3D`
(reference imagen_video.py:1225-1941): identical randomly-initialized torch
weights are ported with tools/port_weights_video.py and the forward outputs
must agree in fp32. Exercises the pseudo-3D convs, temporal PEG, causal
temporal attention with DynamicPositionBias, TimeTokenShift feedforwards,
spatial/cross attention and the conditioning heads.

The port intentionally covers the plain forward path (no prompt-frame
conditioning: the repo fixes the reference's post-cond frame misalignment, a
documented behavioral divergence — PARITY.md).
"""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from tools.port_weights_video import port_unet3d_params
from tools.ref_compat import load_reference

ip = load_reference()

from imagen_tpu.models.unet3d import Unet3D

CFG = dict(
    dim=8, dim_mults=(1, 2), num_resnet_blocks=1,
    layer_attns=(False, True), layer_cross_attns=(False, True),
    attn_heads=2, attn_dim_head=4, text_embed_dim=16, cond_dim=8,
    max_text_len=8, temporal_strides=1,
)


def _randomize_final_conv(ref_unet):
    with torch.no_grad():
        torch.nn.init.normal_(ref_unet.final_conv.weight, std=0.2)
        torch.nn.init.normal_(ref_unet.final_conv.bias, std=0.2)
    return ref_unet


def _ncfhw(x_nfhwc):
    return np.ascontiguousarray(np.transpose(np.asarray(x_nfhwc), (0, 4, 1, 2, 3)))


def _nfhwc(x_ncfhw):
    return np.ascontiguousarray(np.transpose(np.asarray(x_ncfhw), (0, 2, 3, 4, 1)))


def test_unet3d_forward_parity():
    torch.manual_seed(0)
    ref = _randomize_final_conv(ip.imagen_video.Unet3D(**CFG)).eval()

    mine = Unet3D(**CFG)
    b, f, hw = 2, 4, 16
    rng = np.random.RandomState(0)
    x = rng.randn(b, f, hw, hw, 3).astype(np.float32)
    t = rng.rand(b).astype(np.float32)
    te = rng.randn(b, 8, 16).astype(np.float32)
    tm = np.ones((b, 8), bool)

    variables = jax.jit(
        lambda: mine.init(jax.random.PRNGKey(0), jnp.zeros((1, f, hw, hw, 3)),
                          jnp.zeros((1,)), text_embeds=jnp.zeros((1, 8, 16)),
                          text_mask=jnp.ones((1, 8), bool)))()
    params = port_unet3d_params(ref.state_dict(), variables['params'])
    variables = {'params': jax.tree_util.tree_map(jnp.asarray, params)}

    out_mine = mine.apply(variables, jnp.asarray(x), jnp.asarray(t),
                          text_embeds=jnp.asarray(te),
                          text_mask=jnp.asarray(tm))

    with torch.no_grad():
        out_ref = ref(
            torch.tensor(_ncfhw(x)), torch.tensor(t),
            text_embeds=torch.tensor(te), text_mask=torch.tensor(tm),
            cond_drop_prob=0.)

    out_ref = _nfhwc(out_ref.numpy())
    diff = float(np.abs(np.asarray(out_mine, np.float32) - out_ref).max())
    assert diff <= 1e-4, f'Unet3D forward max-abs-diff {diff:.3e}'


def test_unet3d_forward_parity_ignore_time():
    """ignore_time=True trains the 3D net on stills (reference :1664,1743):
    temporal convs/attention collapse to identity on the frame axis."""
    torch.manual_seed(1)
    ref = _randomize_final_conv(ip.imagen_video.Unet3D(**CFG)).eval()
    mine = Unet3D(**CFG)

    b, f, hw = 2, 4, 16
    rng = np.random.RandomState(1)
    x = rng.randn(b, f, hw, hw, 3).astype(np.float32)
    t = rng.rand(b).astype(np.float32)
    te = rng.randn(b, 8, 16).astype(np.float32)
    tm = np.ones((b, 8), bool)

    variables = jax.jit(
        lambda: mine.init(jax.random.PRNGKey(0), jnp.zeros((1, f, hw, hw, 3)),
                          jnp.zeros((1,)), text_embeds=jnp.zeros((1, 8, 16)),
                          text_mask=jnp.ones((1, 8), bool)))()
    params = port_unet3d_params(ref.state_dict(), variables['params'])
    variables = {'params': jax.tree_util.tree_map(jnp.asarray, params)}

    out_mine = mine.apply(variables, jnp.asarray(x), jnp.asarray(t),
                          text_embeds=jnp.asarray(te),
                          text_mask=jnp.asarray(tm), ignore_time=True)
    with torch.no_grad():
        out_ref = ref(
            torch.tensor(_ncfhw(x)), torch.tensor(t),
            text_embeds=torch.tensor(te), text_mask=torch.tensor(tm),
            cond_drop_prob=0., ignore_time=True)
    out_ref = _nfhwc(out_ref.numpy())
    diff = float(np.abs(np.asarray(out_mine, np.float32) - out_ref).max())
    assert diff <= 1e-4, f'Unet3D ignore_time forward max-abs-diff {diff:.3e}'


class _NoiseQueue:
    """torch.randn/randn_like patch feeding pre-drawn host noise (video shapes)."""

    def __init__(self, arrays):
        self.arrays = list(arrays)
        self._randn, self._randn_like = torch.randn, torch.randn_like

    def __enter__(self):
        def fake_randn(*shape, **kwargs):
            if len(shape) == 1 and isinstance(shape[0], (tuple, torch.Size)):
                shape = tuple(shape[0])
            a = self.arrays.pop(0)
            assert tuple(a.shape) == tuple(shape), (a.shape, shape)
            return torch.tensor(a)

        torch.randn = fake_randn
        torch.randn_like = lambda t, **kw: fake_randn(*t.shape)
        return self

    def __exit__(self, *exc):
        torch.randn, torch.randn_like = self._randn, self._randn_like
        return False


def test_video_ddpm_sample_parity():
    """Fixed-noise DDPM VIDEO sampling with CFG + dynamic thresholding: the full
    reference video cascade loop vs our compiled stage scan, identical weights
    and identical noise (reference Imagen.sample video path,
    imagen_pytorch.py:2294-2498 with video_frames)."""
    from imagen_tpu.diffusion.imagen import Imagen

    timesteps = 4
    b, f, hw = 2, 4, 16

    torch.manual_seed(5)
    ref_unet = _randomize_final_conv(ip.imagen_video.Unet3D(**CFG)).float()
    ref_imagen = ip.Imagen(
        unets=ref_unet, image_sizes=(hw,), timesteps=timesteps,
        text_embed_dim=16, cond_drop_prob=0.1).eval()

    mine_unet = Unet3D(**CFG)
    mine = Imagen(unets=(mine_unet,), image_sizes=(hw,), timesteps=timesteps,
                  text_embed_dim=16, cond_drop_prob=0.1)

    variables = jax.jit(
        lambda: mine_unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, f, hw, hw, 3)),
            jnp.zeros((1,)), text_embeds=jnp.zeros((1, 8, 16)),
            text_mask=jnp.ones((1, 8), bool)))()
    params = port_unet3d_params(
        ref_imagen.unets[0].state_dict(), variables['params'])
    variables = {'params': jax.tree_util.tree_map(jnp.asarray, params)}

    rng = np.random.RandomState(6)
    emb = rng.randn(b, 8, 16).astype(np.float32)
    init_noise = rng.randn(b, 3, f, hw, hw).astype(np.float32)
    step_noises = rng.randn(timesteps, b, 3, f, hw, hw).astype(np.float32)

    with torch.no_grad(), _NoiseQueue([init_noise, *step_noises]):
        out_ref = ref_imagen.sample(
            text_embeds=torch.tensor(emb), video_frames=f, cond_scale=2.,
            use_tqdm=False).numpy()

    out_mine = mine.sample(
        (variables,), jax.random.PRNGKey(0), text_embeds=jnp.asarray(emb),
        video_frames=f, cond_scale=2.,
        noise_override=[(jnp.asarray(_nfhwc(init_noise)),
                         jnp.asarray(np.stack([_nfhwc(s) for s in step_noises])))])

    diff = np.abs(out_ref - _ncfhw(out_mine)).max()
    assert diff <= 1e-2, f'video DDPM sample parity broke: max pixel diff {diff}'


def test_video_edm_sample_parity():
    """Fixed-noise EDM VIDEO sampling (S_churn=0, 2 bounded-sigma steps: Euler +
    Heun correction + per-step thresholding — see test_reference_parity.py's
    EDM note on why an untrained random unet caps the usable step count)."""
    from imagen_tpu.diffusion.elucidated import ElucidatedImagen

    b, f, hw = 2, 4, 16
    steps = 2
    edm_kwargs = dict(num_sample_steps=steps, S_churn=0, sigma_min=0.3,
                      sigma_max=20.)

    torch.manual_seed(7)
    ref_unet = _randomize_final_conv(ip.imagen_video.Unet3D(**CFG)).float()
    ref_imagen = ip.ElucidatedImagen(
        unets=ref_unet, image_sizes=(hw,), text_embed_dim=16,
        cond_drop_prob=0.1, **edm_kwargs).eval()

    mine_unet = Unet3D(**CFG)
    mine = ElucidatedImagen(
        unets=(mine_unet,), image_sizes=(hw,), text_embed_dim=16,
        cond_drop_prob=0.1, **edm_kwargs)

    variables = jax.jit(
        lambda: mine_unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, f, hw, hw, 3)),
            jnp.zeros((1,)), text_embeds=jnp.zeros((1, 8, 16)),
            text_mask=jnp.ones((1, 8), bool)))()
    params = port_unet3d_params(
        ref_imagen.unets[0].state_dict(), variables['params'])
    variables = {'params': jax.tree_util.tree_map(jnp.asarray, params)}

    rng = np.random.RandomState(8)
    emb = rng.randn(b, 8, 16).astype(np.float32)
    init_noise = rng.randn(b, 3, f, hw, hw).astype(np.float32)
    extra = [rng.randn(b, 3, f, hw, hw).astype(np.float32) for _ in range(steps)]

    with torch.no_grad(), _NoiseQueue([init_noise, *extra]):
        out_ref = ref_imagen.sample(
            text_embeds=torch.tensor(emb), video_frames=f, cond_scale=2.,
            use_tqdm=False).numpy()

    out_mine = mine.sample(
        (variables,), jax.random.PRNGKey(0), text_embeds=jnp.asarray(emb),
        video_frames=f, cond_scale=2.,
        noise_override=[jnp.asarray(_nfhwc(init_noise))])

    diff = np.abs(out_ref - _ncfhw(out_mine)).max()
    assert diff <= 1e-2, f'video EDM sample parity broke: max pixel diff {diff}'


def test_unet3d_forward_parity_lowres_cond():
    """Video SR-stage unet: lowres frame conditioning (channel concat) + the
    lowres aug-time conditioning head."""
    cfg = dict(CFG, lowres_cond=True)
    torch.manual_seed(9)
    ref = _randomize_final_conv(ip.imagen_video.Unet3D(**cfg)).eval()
    mine = Unet3D(**cfg)

    b, f, hw = 2, 4, 16
    rng = np.random.RandomState(9)
    x = rng.randn(b, f, hw, hw, 3).astype(np.float32)
    lr = rng.randn(b, f, hw, hw, 3).astype(np.float32)
    t = rng.rand(b).astype(np.float32)
    lt = rng.rand(b).astype(np.float32)
    te = rng.randn(b, 8, 16).astype(np.float32)
    tm = np.ones((b, 8), bool)

    variables = jax.jit(
        lambda: mine.init(
            jax.random.PRNGKey(0), jnp.zeros((1, f, hw, hw, 3)),
            jnp.zeros((1,)), lowres_cond_img=jnp.zeros((1, f, hw, hw, 3)),
            lowres_noise_times=jnp.zeros((1,)),
            text_embeds=jnp.zeros((1, 8, 16)),
            text_mask=jnp.ones((1, 8), bool)))()
    params = port_unet3d_params(ref.state_dict(), variables['params'])
    variables = {'params': jax.tree_util.tree_map(jnp.asarray, params)}

    out_mine = mine.apply(
        variables, jnp.asarray(x), jnp.asarray(t),
        lowres_cond_img=jnp.asarray(lr), lowres_noise_times=jnp.asarray(lt),
        text_embeds=jnp.asarray(te), text_mask=jnp.asarray(tm))
    with torch.no_grad():
        out_ref = ref(
            torch.tensor(_ncfhw(x)), torch.tensor(t),
            lowres_cond_img=torch.tensor(_ncfhw(lr)),
            lowres_noise_times=torch.tensor(lt),
            text_embeds=torch.tensor(te), text_mask=torch.tensor(tm),
            cond_drop_prob=0.)
    out_ref = _nfhwc(out_ref.numpy())
    diff = float(np.abs(np.asarray(out_mine, np.float32) - out_ref).max())
    assert diff <= 1e-4, f'Unet3D lowres forward max-abs-diff {diff:.3e}'
