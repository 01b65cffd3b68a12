"""Cross-framework numerical parity vs the actual PyTorch reference.

The north-star claim (BASELINE.md): with identical weights and identical noise,
imagen_tpu reproduces the reference's outputs —
  (a) Unet.forward      max-abs-diff <= 1e-4 fp32   (reference imagen_pytorch.py:1524-1725)
  (b) Imagen.sample     <= 1e-2 pixel deviation      (reference :2294-2498)
  (c) ElucidatedImagen.sample <= 1e-2 pixel deviation (reference elucidated_imagen.py:392-545)

The reference runs in-process on CPU (tools/ref_compat.py stubs its unused heavy
deps); weights are randomly torch-initialized and ported with tools/port_weights.py;
noise is drawn host-side and fed to both samplers (noise_override on ours, a
torch.randn patch on the reference).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tools.port_weights import port_unet_params
from tools.ref_compat import load_reference

ip = load_reference()

from imagen_tpu.diffusion.elucidated import ElucidatedImagen
from imagen_tpu.diffusion.imagen import Imagen
from imagen_tpu.models.unet2d import Unet

BASE_CFG = dict(
    dim=8, dim_mults=(1, 2), num_resnet_blocks=(1, 2),
    layer_attns=(False, True), layer_cross_attns=(False, True),
    attn_heads=2, attn_dim_head=4, text_embed_dim=16, cond_dim=8,
    max_text_len=8, attn_pool_text=True, attn_pool_num_latents=2,
    learned_sinu_pos_emb_dim=4, memory_efficient=False,
)

SR_CFG = dict(
    dim=8, dim_mults=(1, 2), num_resnet_blocks=1,
    layer_attns=False, layer_cross_attns=(False, True),
    use_linear_attn=(True, False),
    attn_heads=2, attn_dim_head=4, text_embed_dim=16, cond_dim=8,
    max_text_len=8, attn_pool_text=True, attn_pool_num_latents=2,
    learned_sinu_pos_emb_dim=4, memory_efficient=True,
    pixel_shuffle_upsample=False, lowres_cond=True,
)


def _randomize_final_conv(ref_unet):
    # both frameworks zero-init the final conv; randomize it (in torch, then port)
    # so outputs actually depend on the full network
    with torch.no_grad():
        torch.nn.init.normal_(ref_unet.final_conv.weight, std=0.2)
        torch.nn.init.normal_(ref_unet.final_conv.bias, std=0.2)
    return ref_unet


def _port(ref_unet, mine, x_shape, **init_kwargs):
    variables = jax.jit(
        lambda: mine.init(jax.random.PRNGKey(0), jnp.zeros(x_shape),
                          jnp.zeros((x_shape[0],)), **init_kwargs))()
    params = port_unet_params(ref_unet.state_dict(), variables['params'])
    return {'params': jax.tree_util.tree_map(jnp.asarray, params)}


class _NoiseQueue:
    """torch.randn/randn_like patch feeding pre-drawn host noise to the reference."""

    def __init__(self, arrays):
        self.arrays = list(arrays)
        self.consumed = []
        self._randn, self._randn_like = torch.randn, torch.randn_like

    def __enter__(self):
        def fake_randn(*shape, **kwargs):
            if len(shape) == 1 and isinstance(shape[0], (tuple, torch.Size)):
                shape = tuple(shape[0])
            a = self.arrays.pop(0)
            assert tuple(a.shape) == tuple(shape), (a.shape, shape)
            self.consumed.append(a)
            return torch.tensor(a)

        def fake_randn_like(t, **kwargs):
            return fake_randn(*t.shape)

        torch.randn, torch.randn_like = fake_randn, fake_randn_like
        return self

    def __exit__(self, *exc):
        torch.randn, torch.randn_like = self._randn, self._randn_like
        return False


def _nchw(x_nhwc):
    return np.ascontiguousarray(np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2)))


def _nhwc(x_nchw):
    return np.ascontiguousarray(np.transpose(np.asarray(x_nchw), (0, 2, 3, 1)))


def test_unet_forward_parity_base():
    torch.manual_seed(0)
    ref = _randomize_final_conv(ip.Unet(**BASE_CFG).eval().float())
    mine = Unet(**BASE_CFG)

    b = 2
    rng = np.random.RandomState(42)
    x = rng.randn(b, 16, 16, 3).astype(np.float32)
    t = rng.rand(b).astype(np.float32)
    emb = rng.randn(b, 8, 16).astype(np.float32)
    mask = np.ones((b, 8), bool)

    variables = _port(ref, mine, (1, 16, 16, 3),
                      text_embeds=jnp.zeros((1, 8, 16)),
                      text_mask=jnp.ones((1, 8), bool))

    with torch.no_grad():
        out_ref = ref(torch.tensor(_nchw(x)), torch.tensor(t),
                      text_embeds=torch.tensor(emb),
                      text_mask=torch.tensor(mask)).numpy()
    out_mine = mine.apply(variables, jnp.asarray(x), jnp.asarray(t),
                          text_embeds=jnp.asarray(emb),
                          text_mask=jnp.asarray(mask))
    diff = np.abs(out_ref - _nchw(out_mine)).max()
    assert diff <= 1e-4, f'forward parity broke: max abs diff {diff}'


def test_unet_forward_parity_sr():
    """SR-flavored config: memory_efficient, lowres conditioning, linear attention,
    plain (non-pixel-shuffle) upsample."""
    torch.manual_seed(1)
    ref = _randomize_final_conv(ip.Unet(**SR_CFG).eval().float())
    mine = Unet(**SR_CFG)

    b = 2
    rng = np.random.RandomState(7)
    x = rng.randn(b, 16, 16, 3).astype(np.float32)
    lowres = rng.randn(b, 16, 16, 3).astype(np.float32)
    t = rng.rand(b).astype(np.float32)
    lt = rng.rand(b).astype(np.float32)
    emb = rng.randn(b, 8, 16).astype(np.float32)
    mask = np.ones((b, 8), bool)

    variables = _port(ref, mine, (1, 16, 16, 3),
                      lowres_cond_img=jnp.zeros((1, 16, 16, 3)),
                      lowres_noise_times=jnp.zeros((1,)),
                      text_embeds=jnp.zeros((1, 8, 16)),
                      text_mask=jnp.ones((1, 8), bool))

    with torch.no_grad():
        out_ref = ref(torch.tensor(_nchw(x)), torch.tensor(t),
                      lowres_cond_img=torch.tensor(_nchw(lowres)),
                      lowres_noise_times=torch.tensor(lt),
                      text_embeds=torch.tensor(emb),
                      text_mask=torch.tensor(mask)).numpy()
    out_mine = mine.apply(variables, jnp.asarray(x), jnp.asarray(t),
                          lowres_cond_img=jnp.asarray(lowres),
                          lowres_noise_times=jnp.asarray(lt),
                          text_embeds=jnp.asarray(emb),
                          text_mask=jnp.asarray(mask))
    diff = np.abs(out_ref - _nchw(out_mine)).max()
    assert diff <= 1e-4, f'SR forward parity broke: max abs diff {diff}'


def test_ddpm_sample_parity():
    """Fixed-noise DDPM cascade sampling (base stage) with CFG + dynamic threshold."""
    timesteps = 6
    b = 2

    torch.manual_seed(2)
    ref_unet = _randomize_final_conv(ip.Unet(**BASE_CFG).float())
    ref_imagen = ip.Imagen(
        unets=ref_unet, image_sizes=(16,), timesteps=timesteps,
        text_embed_dim=16, cond_drop_prob=0.1).eval()

    mine_unet = Unet(**BASE_CFG)
    mine = Imagen(unets=(mine_unet,), image_sizes=(16,), timesteps=timesteps,
                  text_embed_dim=16, cond_drop_prob=0.1)

    variables = _port(ref_imagen.unets[0], mine.unets[0], (1, 16, 16, 3),
                      text_embeds=jnp.zeros((1, 8, 16)),
                      text_mask=jnp.ones((1, 8), bool))

    rng = np.random.RandomState(3)
    emb = rng.randn(b, 8, 16).astype(np.float32)
    init_noise = rng.randn(b, 3, 16, 16).astype(np.float32)
    step_noises = rng.randn(timesteps, b, 3, 16, 16).astype(np.float32)

    with torch.no_grad(), _NoiseQueue([init_noise, *step_noises]) as q:
        out_ref = ref_imagen.sample(
            text_embeds=torch.tensor(emb), cond_scale=2., use_tqdm=False).numpy()
    assert not q.arrays, 'reference consumed fewer noise draws than expected'

    out_mine = mine.sample(
        (variables,), jax.random.PRNGKey(0), text_embeds=jnp.asarray(emb),
        cond_scale=2.,
        noise_override=[(jnp.asarray(_nhwc(init_noise)),
                         jnp.asarray(np.stack([_nhwc(s) for s in step_noises])))])

    # measured 6.2e-3 on CPU at 6 steps: per-step fp32 drift is ~1e-6/step but the
    # log-SNR -> (1/alpha, expm1) schedule math amplifies it near the trajectory
    # endpoints; 1e-2 is the BASELINE.md north-star tolerance.
    diff = np.abs(out_ref - _nchw(out_mine)).max()
    assert diff <= 1e-2, f'DDPM sample parity broke: max abs pixel diff {diff}'


def test_edm_sample_parity():
    """Fixed-noise EDM sampling; S_churn=0 makes the trajectory deterministic given
    the init draw, so only that needs to be shared.

    Conditioning matters here: an UNTRAINED random unet is an expansive map
    (per-step Lipschitz ~20-40x measured), so iterating many sigma steps amplifies
    fp32 round-off chaotically — 5 default-schedule steps end 0.12 apart even when
    the exact same loop math runs on both sides. That is a property of random
    weights, not of the sampler (a trained denoiser contracts). Two steps with a
    bounded sigma range still execute every semantic branch (Euler step, Heun
    correction under sigma_next != 0, per-step dynamic thresholding, final clamp),
    and any formula-level divergence would be O(1), far past the 1e-2 gate. The
    6-step DDPM test above covers iterated-trajectory stability."""
    b = 2
    steps = 2
    edm_kwargs = dict(num_sample_steps=steps, S_churn=0, sigma_min=0.3,
                      sigma_max=20.)

    torch.manual_seed(4)
    ref_unet = _randomize_final_conv(ip.Unet(**BASE_CFG).float())
    ref_imagen = ip.ElucidatedImagen(
        unets=ref_unet, image_sizes=(16,), text_embed_dim=16,
        cond_drop_prob=0.1, **edm_kwargs).eval()

    mine_unet = Unet(**BASE_CFG)
    mine = ElucidatedImagen(
        unets=(mine_unet,), image_sizes=(16,), text_embed_dim=16,
        cond_drop_prob=0.1, **edm_kwargs)

    variables = _port(ref_imagen.unets[0], mine.unets[0], (1, 16, 16, 3),
                      text_embeds=jnp.zeros((1, 8, 16)),
                      text_mask=jnp.ones((1, 8), bool))

    rng = np.random.RandomState(5)
    emb = rng.randn(b, 8, 16).astype(np.float32)
    init_noise = rng.randn(b, 3, 16, 16).astype(np.float32)
    # the reference draws eps every step even at gamma=0 (multiplied away)
    extra = [rng.randn(b, 3, 16, 16).astype(np.float32) for _ in range(steps)]

    with torch.no_grad(), _NoiseQueue([init_noise, *extra]):
        out_ref = ref_imagen.sample(
            text_embeds=torch.tensor(emb), cond_scale=2., use_tqdm=False).numpy()

    out_mine = mine.sample(
        (variables,), jax.random.PRNGKey(0), text_embeds=jnp.asarray(emb),
        cond_scale=2.,
        noise_override=[jnp.asarray(_nhwc(init_noise))])

    diff = np.abs(out_ref - _nchw(out_mine)).max()
    assert diff <= 1e-2, f'EDM sample parity broke: max abs pixel diff {diff}'
