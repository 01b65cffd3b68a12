"""Cascading continuous-time DDPM orchestrator (the `Imagen` class), TPU-native.

Capability parity with the reference `Imagen`
(/root/reference/imagen_pytorch/imagen_pytorch.py:1787-2734), redesigned for XLA:

- `Imagen` is a *static config object* owning flax unet modules + schedule configs.
  Parameters live outside as pytrees (one per unet); every compute path is a pure
  function the caller jits (the trainer jits `loss_fn`; `sample` jits one program per
  cascade stage and caches it).
- The reference's python sampling loop (:2242-2279) compiles into a single `lax.scan`
  over (t, t_next) pairs per stage, with CFG, dynamic thresholding, the RePaint
  inpaint-resample inner `lax.fori_loop`, and the posterior step fused into one XLA
  program. No host<->device traffic inside a stage.
- Explicit PRNG keys replace all implicit torch randomness.
- The reference's GPU/CPU unet juggling (`one_unet_in_gpu`, :2011-2028) is unnecessary:
  each stage's jitted program only touches that stage's params; park non-active stage
  params on host with `jax.device_put` when memory-constrained (see `sample`'s
  `unet_params_device` note).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from einops import repeat

from imagen_tpu.models.unet2d import NullUnet, Unet
from imagen_tpu.ops.diffusion_math import GaussianDiffusionContinuousTimes
from imagen_tpu.ops.tensor_utils import (
    cast_uint8_images_to_float,
    normalize_neg_one_to_one,
    resize_image_to,
    right_pad_dims_to,
    unnormalize_zero_to_one,
)
from imagen_tpu.utils.helpers import (
    cast_tuple,
    default,
    exists,
    first,
    identity,
    maybe,
    pad_tuple_to_length,
)


def _l1_loss(pred, target):
    return jnp.abs(pred - target)


def _l2_loss(pred, target):
    return (pred - target) ** 2


def _huber_loss(pred, target, beta: float = 1.0):
    """smooth_l1 with beta=1 (torch default)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff ** 2 / beta, diff - 0.5 * beta)


LOSS_FNS = {'l1': _l1_loss, 'l2': _l2_loss, 'huber': _huber_loss}


_CFG_BATCHED_KWARGS = (
    'text_embeds', 'text_mask', 'cond_images', 'lowres_cond_img',
    'lowres_noise_times', 'self_cond', 'cond_video_frames',
    'post_cond_video_frames',
)


def unet_forward_with_cond_scale(unet, variables, x, time, *, cond_scale=1.,
                                 rngs=None, **kwargs):
    """Classifier-free guidance: lerp from the fully-dropped (null) prediction.

    Reference imagen_pytorch.py:1510-1522, but TPU-first: instead of the reference's
    two sequential forwards, the conditional and null branches run as ONE
    doubled-batch forward (`force_text_drop_mask` selects the null half per sample).
    At sampling batch sizes this keeps the MXU fed and halves per-step overhead.
    In training (EDM preconditioned forward) a nonzero cond_drop_prob rides through.
    """
    cond_drop_prob = kwargs.pop('cond_drop_prob', 0.)

    if cond_scale == 1:
        return unet.apply(variables, x, time, cond_drop_prob=cond_drop_prob,
                          rngs=rngs, **kwargs)

    b = x.shape[0]

    def double(t):
        return jnp.concatenate((t, t), axis=0) if exists(t) else t

    kwargs2 = {k: (double(v) if k in _CFG_BATCHED_KWARGS else v)
               for k, v in kwargs.items()}
    drop_mask = jnp.concatenate(
        (jnp.zeros(b, bool), jnp.ones(b, bool)), axis=0)

    both = unet.apply(
        variables, double(x), double(time),
        force_text_drop_mask=drop_mask, rngs=rngs, **kwargs2)
    logits, null_logits = both[:b], both[b:]
    return null_logits + (logits - null_logits) * cond_scale


def _per_sample_random_crop(key, tensors, crop_size):
    """Paired per-sample random crop of NHWC tensors (same offsets across tensors).

    Replaces the reference's kornia paired RandomCrop (imagen_pytorch.py:2532-2546).
    Like the reference, the pairing covers (x_start, lowres_cond_img) ONLY —
    `cond_images` are deliberately NOT cropped in either framework (the reference
    crops after the cond-image resize, with the cond channels untouched), so a
    user relying on pixel alignment between cond_images and crops must disable
    random_crop_sizes. Documented parity-neutral in VERDICT r2.
    """
    b, h, w, _ = tensors[0].shape
    kh, kw = jax.random.split(key)
    tops = jax.random.randint(kh, (b,), 0, h - crop_size + 1)
    lefts = jax.random.randint(kw, (b,), 0, w - crop_size + 1)

    def crop_one(t, top, left):
        return jax.lax.dynamic_slice(
            t, (top, left, 0), (crop_size, crop_size, t.shape[-1]))

    return tuple(jax.vmap(crop_one)(t, tops, lefts) for t in tensors)


@dataclass
class Imagen:
    """Static cascade config. Attribute names mirror the reference kwargs (:1788-1815)."""
    unets: Union[Unet, Sequence[Any]]
    image_sizes: Union[int, Tuple[int, ...]] = None
    text_encoder_name: str = 'google/t5-v1_1-base'
    text_embed_dim: Optional[int] = None
    channels: int = 3
    timesteps: Union[int, Tuple[int, ...]] = 1000
    cond_drop_prob: float = 0.1
    loss_type: str = 'l2'
    noise_schedules: Union[str, Tuple[str, ...]] = 'cosine'
    pred_objectives: Union[str, Tuple[str, ...]] = 'noise'
    random_crop_sizes: Union[None, int, Tuple[Optional[int], ...]] = None
    lowres_noise_schedule: str = 'linear'
    lowres_sample_noise_level: float = 0.2
    per_sample_random_aug_noise_level: bool = False
    condition_on_text: bool = True
    auto_normalize_img: bool = True
    dynamic_thresholding: Union[bool, Tuple[bool, ...]] = True
    dynamic_thresholding_percentile: float = 0.95
    only_train_unet_number: Optional[int] = None
    temporal_downsample_factor: Union[int, Tuple[int, ...]] = 1
    resize_cond_video_frames: bool = True
    resize_mode: str = 'nearest'
    min_snr_loss_weight: bool = True
    min_snr_gamma: float = 5

    def __post_init__(self):
        if self.loss_type not in LOSS_FNS:
            raise NotImplementedError(f'unknown loss type {self.loss_type}')
        self.loss_fn = LOSS_FNS[self.loss_type]

        self.unconditional = not self.condition_on_text

        unets = cast_tuple(self.unets)
        num_unets = len(unets)
        self.num_unets = num_unets

        timesteps = cast_tuple(self.timesteps, num_unets)

        # noise schedule defaults: cosine, cosine, then linear for the SR tail
        # (reference :1851-1855)
        noise_schedules = cast_tuple(self.noise_schedules)
        noise_schedules = pad_tuple_to_length(noise_schedules, 2, 'cosine')
        noise_schedules = pad_tuple_to_length(noise_schedules, num_unets, 'linear')

        self.noise_schedulers = tuple(
            GaussianDiffusionContinuousTimes(noise_schedule=sched, timesteps=ts)
            for ts, sched in zip(timesteps, noise_schedules))

        self.random_crop_sizes = cast_tuple(self.random_crop_sizes, num_unets)
        assert not exists(first(self.random_crop_sizes)), \
            'random_crop_sizes should be None for the base unet (e.g. (None, 128, 256))'

        self.lowres_noise_schedule_ = GaussianDiffusionContinuousTimes(
            noise_schedule=self.lowres_noise_schedule)

        self.pred_objectives = cast_tuple(self.pred_objectives, num_unets)

        self.text_embed_dim = default(
            self.text_embed_dim,
            lambda: _get_encoded_dim(self.text_encoder_name) if self.condition_on_text else None)

        # reconcile unet conditioning config for the cascade (reference :1895-1905)
        cast_unets = []
        for ind, one_unet in enumerate(unets):
            is_first = ind == 0
            one_unet = one_unet.cast_model_parameters(
                lowres_cond=not is_first,
                cond_on_text=self.condition_on_text,
                text_embed_dim=self.text_embed_dim if self.condition_on_text else None,
                channels=self.channels,
                channels_out=self.channels,
            )
            cast_unets.append(one_unet)
        self.unets = tuple(cast_unets)

        self.image_sizes = cast_tuple(self.image_sizes)
        assert num_unets == len(self.image_sizes), \
            f'{num_unets} unets does not match image_sizes {self.image_sizes}'

        self.sample_channels = cast_tuple(self.channels, num_unets)

        self.is_video = any(getattr(u, 'is_video_unet', False) for u in self.unets)

        lowres_conditions = tuple(u.lowres_cond for u in self.unets)
        assert lowres_conditions == (False, *((True,) * (num_unets - 1))), \
            'first unet must not be lowres-conditioned; the rest must be'

        self.temporal_downsample_factor = cast_tuple(
            self.temporal_downsample_factor, num_unets)
        assert self.temporal_downsample_factor[-1] == 1

        self.can_classifier_guidance = self.cond_drop_prob > 0.

        self.normalize_img = (
            normalize_neg_one_to_one if self.auto_normalize_img else identity)
        self.unnormalize_img = (
            unnormalize_zero_to_one if self.auto_normalize_img else identity)
        self.input_image_range = (0. if self.auto_normalize_img else -1., 1.)

        self.dynamic_thresholding = cast_tuple(self.dynamic_thresholding, num_unets)

        min_snr_loss_weight = cast_tuple(self.min_snr_loss_weight, num_unets)
        min_snr_gamma = cast_tuple(self.min_snr_gamma, num_unets)
        self.min_snr_gamma = tuple(
            (gamma if use else None)
            for use, gamma in zip(min_snr_loss_weight, min_snr_gamma))

        if self.is_video:
            from imagen_tpu.models.video_blocks import resize_video_to
            self.resize_to = functools.partial(
                resize_video_to, method=self.resize_mode)
        else:
            self.resize_to = functools.partial(
                resize_image_to, method=self.resize_mode)

        self._stage_sample_cache = {}

    # --- parameter init ------------------------------------------------------------------

    def get_unet(self, unet_number):
        assert 0 < unet_number <= self.num_unets
        return self.unets[unet_number - 1]

    def encode_text(self, texts, **kwargs):
        """reference imagen_pytorch.py:1889 (partial-bound t5_encode_text)."""
        from imagen_tpu.models.t5 import t5_encode_text
        return t5_encode_text(texts, name=self.text_encoder_name, **kwargs)

    def force_unconditional_(self):
        """Drop text conditioning across the cascade; reference :1978-1983."""
        self.condition_on_text = False
        self.unconditional = True
        self.unets = tuple(
            u if not hasattr(u, 'cond_on_text') else u.clone(cond_on_text=False)
            for u in self.unets)

    def _calc_all_frame_dims(self, frames):
        """Per-stage frame counts from temporal downsample factors;
        reference imagen_pytorch.py:170-185 (calc_all_frame_dims)."""
        if not exists(frames):
            return (None,) * self.num_unets
        dims = []
        for divisor in self.temporal_downsample_factor:
            assert frames % divisor == 0, \
                f'frames {frames} not divisible by temporal factor {divisor}'
            dims.append(frames // divisor)
        return tuple(dims)

    def init_unet_params(self, unet_number, key, *, batch_size=1, text_len=None,
                         image_size=None, video_frames=None):
        """Initialize one unet's variables with correctly-shaped dummy inputs."""
        unet = self.get_unet(unet_number)
        if isinstance(unet, NullUnet):
            return unet.init({'params': key}, jnp.zeros((1, 4, 4, self.channels)))

        index = unet_number - 1
        size = default(image_size, self.image_sizes[index])
        if getattr(unet, 'is_video_unet', False):
            frames = default(video_frames, unet.total_temporal_divisor)
            x = jnp.zeros((batch_size, frames, size, size, self.channels))
        else:
            x = jnp.zeros((batch_size, size, size, self.channels))
        time = jnp.zeros((batch_size,))
        kwargs = {}
        if unet.lowres_cond:
            kwargs['lowres_cond_img'] = jnp.zeros_like(x)
            kwargs['lowres_noise_times'] = time
        if self.condition_on_text:
            text_len = default(text_len, 8)
            kwargs['text_embeds'] = jnp.zeros(
                (batch_size, text_len, self.text_embed_dim))
            kwargs['text_mask'] = jnp.ones((batch_size, text_len), dtype=bool)
        if unet.has_cond_image:
            kwargs['cond_images'] = jnp.zeros(
                (batch_size, size, size, unet.cond_images_channels))
        # jit the init: unjitted flax init dispatches hundreds of tiny eager ops
        # (catastrophic over a remote-device tunnel)
        return jax.jit(
            lambda k: unet.init({'params': k}, x, time, **kwargs))(key)

    def init_params(self, key, **kwargs):
        """Init all unets; returns a tuple of variable pytrees."""
        keys = jax.random.split(key, self.num_unets)
        return tuple(
            self.init_unet_params(i + 1, k, **kwargs) for i, k in enumerate(keys))

    # --- dynamic thresholding ------------------------------------------------------------

    def threshold_x_start(self, x_start, dynamic_threshold=True):
        """Static clamp or dynamic percentile thresholding;
        reference imagen_pytorch.py:2094-2105.

        The percentile is exact torch.quantile semantics (linear interpolation
        between the two bracketing order statistics), computed by radix select —
        32 fused compare+count passes over the |x| bit patterns
        (ops.tensor_utils.nonneg_order_stats) instead of any sort/top_k. At
        SR-1024 shapes `lax.top_k` over the 3.1M-pixel tail was 18.5% of the
        whole sample; the counting passes are ~50x cheaper and bit-identical.
        """
        if not dynamic_threshold:
            return jnp.clip(x_start, -1., 1.)

        from imagen_tpu.ops.tensor_utils import nonneg_order_stats

        flat = jnp.abs(x_start.reshape(x_start.shape[0], -1)).astype(jnp.float32)
        n = flat.shape[-1]
        pos = self.dynamic_thresholding_percentile * (n - 1)
        lo = int(np.floor(pos))
        frac = pos - lo

        if lo >= n - 1:
            s = jnp.max(flat, axis=-1)
        else:
            v_lo, v_hi = nonneg_order_stats(flat, lo)  # x_(lo), x_(lo+1)
            s = v_lo + frac * (v_hi - v_lo)

        s = jnp.clip(s, min=1.)
        s = right_pad_dims_to(x_start, s).astype(x_start.dtype)
        return jnp.clip(x_start, -s, s) / s

    # --- one denoising step --------------------------------------------------------------

    def p_mean_variance(self, unet, variables, x, t, *, noise_scheduler,
                        t_next=None, cond_scale=1., model_output=None,
                        pred_objective='noise', dynamic_threshold=True, **unet_kwargs):
        """Posterior mean/variance of one reverse step; reference :2042-2110."""
        assert not (cond_scale != 1. and not self.can_classifier_guidance), \
            'imagen was not trained with conditional dropout; cannot use cond_scale != 1'

        pred = default(model_output, lambda: unet_forward_with_cond_scale(
            unet, variables, x, noise_scheduler.get_condition(t),
            cond_scale=cond_scale, **unet_kwargs))

        if pred_objective == 'noise':
            x_start = noise_scheduler.predict_start_from_noise(x, t, pred)
        elif pred_objective == 'x_start':
            x_start = pred
        elif pred_objective == 'v':
            x_start = noise_scheduler.predict_start_from_v(x, t, pred)
        else:
            raise ValueError(f'unknown objective {pred_objective}')

        x_start = self.threshold_x_start(x_start, dynamic_threshold)

        mean_and_variance = noise_scheduler.q_posterior(
            x_start=x_start, x_t=x, t=t, t_next=t_next)
        return mean_and_variance, x_start

    def p_sample(self, unet, variables, x, t, *, key, noise_scheduler, t_next=None,
                 cond_scale=1., pred_objective='noise', dynamic_threshold=True,
                 noise=None, **unet_kwargs):
        """One ancestral sampling step; reference :2112-2164.

        `noise` overrides the ancestral noise draw (parity/repro harness hook)."""
        (model_mean, _, model_log_variance), x_start = self.p_mean_variance(
            unet, variables, x, t, noise_scheduler=noise_scheduler, t_next=t_next,
            cond_scale=cond_scale, pred_objective=pred_objective,
            dynamic_threshold=dynamic_threshold, **unet_kwargs)

        noise = default(noise, lambda: jax.random.normal(key, x.shape, x.dtype))
        is_last_sampling_timestep = (t_next == 0)
        nonzero_mask = right_pad_dims_to(
            x, 1. - is_last_sampling_timestep.astype(x.dtype))
        pred_img = model_mean + nonzero_mask * jnp.exp(0.5 * model_log_variance) * noise
        return pred_img, x_start

    # --- whole-stage sampler (one compiled scan) ----------------------------------------

    def _make_stage_sampler(self, unet_index, *, cond_scale, resample_times,
                            has_inpainting, skip_steps, has_init_images, has_text,
                            has_cond_images, video_frames=None,
                            has_cond_video_frames=False,
                            has_post_cond_video_frames=False,
                            has_noise_override=False):
        """Build the jitted sampler for one cascade stage.

        The entire reference loop (imagen_pytorch.py:2168-2289) becomes one
        `lax.scan` over (t, t_next) with the RePaint resample inner `fori_loop`.

        `has_noise_override`: the stage consumes host-fed noise instead of PRNG
        draws — the cross-framework parity harness feeds identical host-drawn
        noise to this sampler and the torch reference. Plain path:
        (init_noise, step_noises[T]). Inpaint/RePaint path:
        (init_noise, inpaint_noises[T,R], step_noises[T,R], renoise_noises[T,R])
        — indexed [t, r] in the reference's draw order (q_sample inpaint noise,
        then the ancestral step noise, then the q_sample_from_to renoise; the
        renoise entry is unused on the last resample iteration / last timestep,
        mirroring the reference skipping that draw, imagen_pytorch.py:2272-2279).
        """
        unet = self.unets[unet_index]
        noise_scheduler = self.noise_schedulers[unet_index]
        pred_objective = self.pred_objectives[unet_index]
        dynamic_threshold = self.dynamic_thresholding[unet_index]
        lowres_cond = unet.lowres_cond

        def stage_sample(variables, key, shape_b, shape_hw, text_embeds, text_mask,
                         cond_images, lowres_cond_img, lowres_noise_times,
                         inpaint_images, inpaint_masks, init_images,
                         cond_video_frames=None, post_cond_video_frames=None,
                         noise_override=None):
            batch = shape_b
            if exists(video_frames):
                shape = (batch, video_frames, shape_hw, shape_hw, self.channels)
            else:
                shape = (batch, shape_hw, shape_hw, self.channels)

            key, init_key = jax.random.split(key)
            inpaint_noises = step_noises = renoise_noises = None
            if has_noise_override:
                if has_inpainting:
                    (init_noise, inpaint_noises, step_noises,
                     renoise_noises) = noise_override
                else:
                    init_noise, step_noises = noise_override
                img = init_noise
            else:
                img = jax.random.normal(init_key, shape)
            if has_init_images:
                img = img + init_images

            t_arr, t_next_arr = noise_scheduler.get_sampling_timesteps(batch)
            if skip_steps:
                t_arr = t_arr[skip_steps:]
                t_next_arr = t_next_arr[skip_steps:]

            unet_kwargs = {}
            if has_text:
                unet_kwargs.update(text_embeds=text_embeds, text_mask=text_mask)
            if has_cond_images:
                unet_kwargs.update(cond_images=cond_images)
            if has_cond_video_frames:
                unet_kwargs.update(cond_video_frames=cond_video_frames)
            if has_post_cond_video_frames:
                unet_kwargs.update(post_cond_video_frames=post_cond_video_frames)
            if lowres_cond:
                unet_kwargs.update(
                    lowres_cond_img=lowres_cond_img,
                    lowres_noise_times=self.lowres_noise_schedule_.get_condition(
                        lowres_noise_times))

            def step(carry, ts):
                img, x_start, key = carry
                times, times_next = ts['t'], ts['tn']
                is_last_timestep = times_next == 0

                def resample_body(i, inner):
                    img, x_start, key = inner
                    r_is_last = i == (resample_times - 1)

                    if has_inpainting:
                        key, nk = jax.random.split(key)
                        inp_noise = (
                            ts['inpaint_noise'][i] if has_noise_override
                            else jax.random.normal(nk, inpaint_images.shape))
                        noised_inpaint, *_ = noise_scheduler.q_sample(
                            inpaint_images, times, inp_noise)
                        img = jnp.where(inpaint_masks, noised_inpaint, img)

                    self_cond = x_start if unet.self_cond else None

                    if has_noise_override:
                        step_noise = (ts['step_noise'][i] if has_inpainting
                                      else ts['step_noise'])
                    else:
                        step_noise = None
                    key, sk = jax.random.split(key)
                    img, x_start = self.p_sample(
                        unet, variables, img, times, key=sk, t_next=times_next,
                        noise_scheduler=noise_scheduler, cond_scale=cond_scale,
                        pred_objective=pred_objective,
                        dynamic_threshold=dynamic_threshold,
                        self_cond=self_cond, noise=step_noise, **unet_kwargs)

                    if has_inpainting and resample_times > 1:
                        key, rk = jax.random.split(key)
                        ren_noise = (
                            ts['renoise_noise'][i] if has_noise_override
                            else jax.random.normal(rk, img.shape))
                        renoised = noise_scheduler.q_sample_from_to(
                            img, times_next, times, ren_noise)
                        renoise_mask = right_pad_dims_to(
                            img, jnp.logical_not(is_last_timestep)) & jnp.logical_not(r_is_last)
                        img = jnp.where(renoise_mask, renoised, img)

                    return (img, x_start, key)

                if resample_times > 1:
                    img, x_start, key = jax.lax.fori_loop(
                        0, resample_times, resample_body, (img, x_start, key))
                else:
                    img, x_start, key = resample_body(
                        resample_times - 1, (img, x_start, key))

                return (img, x_start, key), None

            x_start0 = jnp.zeros_like(img)
            xs = {'t': t_arr, 'tn': t_next_arr}
            if has_noise_override:
                xs['step_noise'] = step_noises
                if has_inpainting:
                    xs['inpaint_noise'] = inpaint_noises
                    xs['renoise_noise'] = renoise_noises
            (img, _, _), _ = jax.lax.scan(step, (img, x_start0, key), xs)

            img = jnp.clip(img, -1., 1.)
            if has_inpainting:
                img = jnp.where(inpaint_masks, inpaint_images, img)
            return self.unnormalize_img(img)

        return jax.jit(stage_sample, static_argnums=(2, 3))

    # --- public sampling API -------------------------------------------------------------

    def sample(
        self,
        params,
        key,
        *,
        texts=None,
        text_masks=None,
        text_embeds=None,
        video_frames=None,
        cond_images=None,
        cond_video_frames=None,
        post_cond_video_frames=None,
        inpaint_videos=None,
        inpaint_images=None,
        inpaint_masks=None,
        inpaint_resample_times=5,
        init_images=None,
        skip_steps=None,
        batch_size=1,
        cond_scale=1.,
        lowres_sample_noise_level=None,
        start_at_unet_number=1,
        start_image_or_video=None,
        stop_at_unet_number=None,
        return_all_unet_outputs=False,
        return_pil_images=False,
        use_tqdm=True,
        noise_override=None,
        offload_inactive_unets=False,
    ):
        """Run the full cascade; reference imagen_pytorch.py:2294-2498.

        `offload_inactive_unets=True` keeps only the ACTIVE stage's params on
        device: each stage's variables are copied HBM-ward just-in-time and the
        device copy is dropped when the stage finishes — the TPU analog of the
        reference's GPU/CPU unet juggling (`one_unet_in_gpu`,
        imagen_pytorch.py:2011-2028). For the memory saving to be real the
        caller's `params` should live on host (e.g. straight from a checkpoint,
        or parked with `parallel.mesh.host_offload`); device-resident inputs
        are already where they need to be and are used as-is.

        `params` is the tuple of per-unet variables. The host loop only orchestrates
        stages; each stage is one compiled program. `use_tqdm` shows per-STAGE
        progress (per-step progress is impossible inside a compiled scan).

        `noise_override`: per-stage list (len == num_unets, entries may be None) of
        (init_noise, step_noises) pairs consumed instead of PRNG draws — lets a
        harness feed identical host-drawn noise to this sampler and the torch
        reference (cross-framework parity / exact repro).
        """
        cond_images = maybe(cast_uint8_images_to_float)(cond_images)

        if exists(texts) and not exists(text_embeds) and not self.unconditional:
            from imagen_tpu.models.t5 import t5_encode_text
            text_embeds, text_masks = t5_encode_text(
                texts, name=self.text_encoder_name, return_attn_mask=True)

        if not self.unconditional:
            assert exists(text_embeds), \
                'text or text encodings must be passed to a conditional imagen'
            text_masks = default(
                text_masks, lambda: jnp.any(text_embeds != 0., axis=-1))
            batch_size = text_embeds.shape[0]
            assert text_embeds.shape[-1] == self.text_embed_dim
        else:
            assert not exists(text_embeds), \
                'unconditional imagen cannot take text embeddings'

        inpaint_images = default(inpaint_videos, inpaint_images)
        has_inpainting = exists(inpaint_images) and exists(inpaint_masks)
        assert not (exists(inpaint_images) ^ exists(inpaint_masks))
        resample_times = inpaint_resample_times if has_inpainting else 1

        if has_inpainting and self.unconditional and batch_size == 1:
            batch_size = inpaint_images.shape[0]

        lowres_sample_noise_level = default(
            lowres_sample_noise_level, self.lowres_sample_noise_level)

        num_unets = self.num_unets
        cond_scale = cast_tuple(cond_scale, num_unets)
        init_images = cast_tuple(init_images, num_unets)
        init_images = [maybe(self.normalize_img)(im) for im in init_images]
        skip_steps = cast_tuple(default(skip_steps, 0), num_unets)

        if noise_override is None:
            noise_override = (None,) * num_unets
        assert len(noise_override) == num_unets, \
            'noise_override must be a per-stage list (entries may be None)'

        # video frame dims per stage (reference :2381-2386)
        if self.is_video and exists(inpaint_images):
            video_frames = inpaint_images.shape[1]
            if inpaint_masks.ndim == 3:  # b h w -> b f h w
                inpaint_masks = repeat(
                    inpaint_masks, 'b h w -> b f h w', f=video_frames)
            assert inpaint_masks.shape[1] == video_frames

        assert not (self.is_video and not exists(video_frames)), \
            'video_frames must be passed for a video imagen'
        all_frame_dims = self._calc_all_frame_dims(video_frames)

        img = None
        if start_at_unet_number > 1:
            assert start_at_unet_number <= num_unets
            assert exists(start_image_or_video), \
                'starting image must be supplied if only doing upscaling'
            prev_image_size = self.image_sizes[start_at_unet_number - 2]
            if self.is_video:
                img = self.resize_to(
                    start_image_or_video, prev_image_size,
                    target_frames=all_frame_dims[start_at_unet_number - 2])
            else:
                img = self.resize_to(start_image_or_video, prev_image_size)

        outputs = []
        from imagen_tpu.utils.helpers import stage_progress
        for unet_number in stage_progress(
                range(1, num_unets + 1), enabled=use_tqdm,
                desc='sampling cascade', total=num_unets):
            if unet_number < start_at_unet_number:
                continue
            index = unet_number - 1
            unet = self.unets[index]
            assert not isinstance(unet, NullUnet), 'cannot sample from a NullUnet'

            image_size = self.image_sizes[index]
            variables = params[index]
            if offload_inactive_unets:
                from imagen_tpu.parallel.mesh import device_restore
                variables = device_restore(variables)
            frame_dim = all_frame_dims[index] if self.is_video else None
            resize_kwargs = (
                dict(target_frames=frame_dim) if self.is_video else {})

            # stage keys derive by static fold_in INSIDE the jitted programs:
            # an eager jax.random.split here costs two host->device round trips
            # per stage over remote-device transports (profiled ~13 ms/sample on
            # the axon tunnel — ~2.5% of a base-64 sample call)
            stage_key = jax.random.fold_in(key, index) if unet.lowres_cond else key

            # temporally downsample video prompt frames for this stage (reference :2431-2436)
            stage_cond_video_frames = cond_video_frames
            stage_post_cond_video_frames = post_cond_video_frames
            if self.is_video and self.resize_cond_video_frames:
                from imagen_tpu.models.video_blocks import scale_video_time
                ds = self.temporal_downsample_factor[index]
                stage_cond_video_frames = maybe(
                    functools.partial(scale_video_time, downsample_scale=ds)
                )(stage_cond_video_frames)
                stage_post_cond_video_frames = maybe(
                    functools.partial(scale_video_time, downsample_scale=ds)
                )(stage_post_cond_video_frames)

            # lowres conditioning from previous stage output (reference :2443-2449)
            lowres_cond_img = lowres_noise_times = None
            if unet.lowres_cond:
                lowres_noise_times = self.lowres_noise_schedule_.get_times(
                    batch_size, lowres_sample_noise_level)
                lowres_cond_img = self.resize_to(img, image_size, **resize_kwargs)
                lowres_cond_img = self.normalize_img(lowres_cond_img)
                lowres_cond_img, *_ = self.lowres_noise_schedule_.q_sample(
                    lowres_cond_img, lowres_noise_times,
                    jax.random.normal(jax.random.fold_in(key, 1000 + index),
                                      lowres_cond_img.shape))

            unet_init_images = init_images[index]
            if exists(unet_init_images):
                unet_init_images = self.resize_to(
                    unet_init_images, image_size, **resize_kwargs)

            stage_inpaint_images = stage_inpaint_masks = None
            if has_inpainting:
                stage_inpaint_images = self.normalize_img(
                    self.resize_to(inpaint_images, image_size, **resize_kwargs))
                stage_inpaint_masks = self.resize_to(
                    inpaint_masks[..., None].astype(jnp.float32), image_size,
                    **resize_kwargs).astype(bool)

            cache_key = (index, cond_scale[index], resample_times, has_inpainting,
                         skip_steps[index], exists(unet_init_images),
                         not self.unconditional, exists(cond_images), frame_dim,
                         exists(stage_cond_video_frames),
                         exists(stage_post_cond_video_frames),
                         exists(noise_override[index]))
            if cache_key not in self._stage_sample_cache:
                self._stage_sample_cache[cache_key] = self._make_stage_sampler(
                    index, cond_scale=cond_scale[index],
                    resample_times=resample_times, has_inpainting=has_inpainting,
                    skip_steps=skip_steps[index],
                    has_init_images=exists(unet_init_images),
                    has_text=not self.unconditional,
                    has_cond_images=exists(cond_images),
                    video_frames=frame_dim,
                    has_cond_video_frames=exists(stage_cond_video_frames),
                    has_post_cond_video_frames=exists(stage_post_cond_video_frames),
                    has_noise_override=exists(noise_override[index]))
            stage_fn = self._stage_sample_cache[cache_key]

            img = stage_fn(
                variables, stage_key, batch_size, image_size, text_embeds, text_masks,
                cond_images, lowres_cond_img, lowres_noise_times,
                stage_inpaint_images, stage_inpaint_masks, unet_init_images,
                stage_cond_video_frames, stage_post_cond_video_frames,
                noise_override[index])

            outputs.append(img)
            if offload_inactive_unets:
                # drop the stage's device copy; the runtime frees the HBM once
                # the dispatched stage program completes
                variables = None

            if exists(stop_at_unet_number) and stop_at_unet_number == unet_number:
                break

        output_index = -1 if not return_all_unet_outputs else slice(None)

        if not return_pil_images:
            return outputs[output_index]

        if not return_all_unet_outputs:
            outputs = outputs[-1:]

        if self.is_video:
            # per-video lists of per-frame PIL images; write to disk with
            # imagen_tpu.utils.video_io.save_video(s) (.gif/.mp4/.npy).
            # Beyond-reference: the reference asserts this unsupported.
            from imagen_tpu.utils.video_io import video_tensor_to_pil_frames
            pil_videos = [
                [video_tensor_to_pil_frames(vid) for vid in out]
                for out in outputs]
            return pil_videos[output_index]

        from PIL import Image
        pil_images = [
            [Image.fromarray(
                np.asarray(jnp.clip(im * 255, 0, 255)).astype(np.uint8))
             for im in out]
            for out in outputs]
        return pil_images[output_index]

    # --- training loss -------------------------------------------------------------------

    def p_losses(self, unet, variables, x_start, times, key, *, noise_scheduler,
                 lowres_cond_img=None, lowres_aug_times=None, text_embeds=None,
                 text_mask=None, cond_images=None, noise=None, pred_objective='noise',
                 min_snr_gamma=None, random_crop_size=None, **kwargs):
        """Denoising loss for one unet; reference imagen_pytorch.py:2500-2638."""
        key, nk, lrk, sck, cdk, cdk2 = jax.random.split(key, 6)
        noise = default(noise, lambda: jax.random.normal(nk, x_start.shape, x_start.dtype))

        x_start = self.normalize_img(x_start)
        lowres_cond_img = maybe(self.normalize_img)(lowres_cond_img)

        # paired random crop for SR stages (reference :2532-2546);
        # video folds frames into batch (per-frame crops, matching the reference's
        # kornia-on-rearranged-frames behavior :2535-2537)
        if exists(random_crop_size):
            key, crop_key = jax.random.split(key)
            is_video_x = x_start.ndim == 5
            frames = x_start.shape[1] if is_video_x else None

            def fold(t):
                return (t.reshape(-1, *t.shape[2:])
                        if is_video_x and exists(t) else t)

            def unfold(t):
                return (t.reshape(-1, frames, *t.shape[1:])
                        if is_video_x and exists(t) else t)

            tensors = [fold(x_start), fold(noise)]
            if exists(lowres_cond_img):
                tensors.append(fold(lowres_cond_img))
            cropped = _per_sample_random_crop(crop_key, tuple(tensors),
                                              random_crop_size)
            x_start, noise = unfold(cropped[0]), unfold(cropped[1])
            if exists(lowres_cond_img):
                lowres_cond_img = unfold(cropped[2])

        x_noisy, log_snr, alpha, sigma = noise_scheduler.q_sample(
            x_start, times, noise)

        lowres_cond_img_noisy = None
        if exists(lowres_cond_img):
            lowres_aug_times = default(lowres_aug_times, times)
            lowres_cond_img_noisy, *_ = self.lowres_noise_schedule_.q_sample(
                lowres_cond_img, lowres_aug_times,
                jax.random.normal(lrk, lowres_cond_img.shape, lowres_cond_img.dtype))

        noise_cond = noise_scheduler.get_condition(times)

        unet_kwargs = dict(
            text_embeds=text_embeds,
            text_mask=text_mask,
            cond_images=cond_images,
            lowres_noise_times=self.lowres_noise_schedule_.get_condition(
                lowres_aug_times),
            lowres_cond_img=lowres_cond_img_noisy,
            cond_drop_prob=self.cond_drop_prob,
            **kwargs,
        )
        unet_kwargs = {k: v for k, v in unet_kwargs.items() if exists(v) or k in (
            'cond_drop_prob',)}

        # self-conditioning 50% of the time (reference :2581-2593)
        if unet.self_cond:
            # distinct keys per rng collection: sharing one key across
            # 'cond_drop' and 'dropout' silently correlates the two streams
            # whenever dropout is enabled
            sc_drop_key, sc_dropout_key = jax.random.split(cdk2)

            def compute_self_cond(_):
                pred = unet.apply(
                    variables, x_noisy, noise_cond, deterministic=False,
                    rngs={'cond_drop': sc_drop_key, 'dropout': sc_dropout_key},
                    **unet_kwargs)
                x0 = (noise_scheduler.predict_start_from_noise(x_noisy, times, pred)
                      if pred_objective == 'noise' else pred)
                return jax.lax.stop_gradient(x0)

            flip = jax.random.bernoulli(sck)
            self_cond_val = jax.lax.cond(
                flip, compute_self_cond,
                lambda _: jnp.zeros_like(x_noisy), operand=None)
            unet_kwargs['self_cond'] = self_cond_val

        pred = unet.apply(
            variables, x_noisy, noise_cond, deterministic=False,
            rngs={'cond_drop': cdk, 'dropout': key}, **unet_kwargs)

        if pred_objective == 'noise':
            target = noise
        elif pred_objective == 'x_start':
            target = x_start
        elif pred_objective == 'v':
            # Progressive Distillation appendix D; fixes color shift in SR unets
            target = alpha * noise - sigma * x_start
        else:
            raise ValueError(f'unknown objective {pred_objective}')

        losses = self.loss_fn(pred.astype(jnp.float32), target.astype(jnp.float32))
        losses = jnp.mean(losses.reshape(losses.shape[0], -1), axis=-1)

        # min-SNR loss reweighting (reference :2623-2636; arXiv 2303.09556)
        snr = jnp.exp(log_snr.astype(jnp.float32))
        maybe_clipped_snr = snr
        if exists(min_snr_gamma):
            maybe_clipped_snr = jnp.clip(snr, max=min_snr_gamma)

        if pred_objective == 'noise':
            loss_weight = maybe_clipped_snr / snr
        elif pred_objective == 'x_start':
            loss_weight = maybe_clipped_snr
        elif pred_objective == 'v':
            loss_weight = maybe_clipped_snr / (snr + 1)

        return jnp.mean(losses * loss_weight)

    def forward(self, params, images, key, *, unet_number=None, texts=None,
                text_embeds=None, text_masks=None, cond_images=None, **kwargs):
        """Training loss entry point; reference imagen_pytorch.py:2640-2734.

        Pure in (params, images, key) — jit/grad over it. `params` may be the
        whole per-unet tuple or a single unet's variables.
        """
        assert not (self.num_unets > 1 and not exists(unet_number)), \
            f'specify unet_number in [1, {self.num_unets}] for a cascade'
        unet_number = default(unet_number, 1)
        assert not exists(self.only_train_unet_number) or \
            self.only_train_unet_number == unet_number

        unet_index = unet_number - 1
        unet = self.unets[unet_index]
        variables = params[unet_index] if isinstance(params, (tuple, list)) else params
        assert not isinstance(unet, NullUnet), 'NullUnet cannot be trained'

        # still images into a video model (reference :2644-2646)
        if self.is_video and images.ndim == 4:
            images = images[:, None]  # b h w c -> b 1 h w c
            kwargs['ignore_time'] = True

        images = cast_uint8_images_to_float(images)
        cond_images = maybe(cast_uint8_images_to_float)(cond_images)

        assert images.shape[-2] == images.shape[-3], 'images must be square'
        assert images.shape[-1] == self.channels

        noise_scheduler = self.noise_schedulers[unet_index]
        min_snr_gamma = self.min_snr_gamma[unet_index]
        pred_objective = self.pred_objectives[unet_index]
        target_image_size = self.image_sizes[unet_index]
        random_crop_size = self.random_crop_sizes[unet_index]
        prev_image_size = self.image_sizes[unet_index - 1] if unet_index > 0 else None

        b = images.shape[0]
        h = images.shape[-2]
        assert h >= target_image_size

        # video frame bookkeeping (reference :2671-2678)
        is_video_input = self.is_video and images.ndim == 5
        ignore_time = kwargs.get('ignore_time', False)
        frames = images.shape[1] if is_video_input else None
        if is_video_input and not ignore_time:
            all_frame_dims = self._calc_all_frame_dims(frames)
            target_frame_size = all_frame_dims[unet_index]
            prev_frame_size = (all_frame_dims[unet_index - 1]
                               if unet_index > 0 else None)
        else:
            target_frame_size = prev_frame_size = None

        def frames_kwargs(fr):
            return dict(target_frames=fr) if (self.is_video and exists(fr)) else {}

        # temporally downsample video prompt frames (reference :2704-2709)
        if self.is_video and self.resize_cond_video_frames:
            from imagen_tpu.models.video_blocks import scale_video_time
            ds = self.temporal_downsample_factor[unet_index]
            for k in ('cond_video_frames', 'post_cond_video_frames'):
                if k in kwargs and exists(kwargs[k]):
                    kwargs[k] = scale_video_time(kwargs[k], downsample_scale=ds)

        key, tk, ek, ak = jax.random.split(key, 4)
        times = noise_scheduler.sample_random_times(tk, b)

        if exists(texts) and not exists(text_embeds) and not self.unconditional:
            from imagen_tpu.models.t5 import t5_encode_text
            text_embeds, text_masks = t5_encode_text(
                texts, name=self.text_encoder_name, return_attn_mask=True)

        if not self.unconditional:
            text_masks = default(
                text_masks, lambda: jnp.any(text_embeds != 0., axis=-1))

        assert not (self.condition_on_text and not exists(text_embeds))
        assert not (not self.condition_on_text and exists(text_embeds))
        if exists(text_embeds):
            assert text_embeds.shape[-1] == self.text_embed_dim

        # lowres degrade-resize conditioning + aug times (reference :2718-2730)
        lowres_cond_img = lowres_aug_times = None
        if exists(prev_image_size):
            lowres_cond_img = self.resize_to(
                images, prev_image_size, clamp_range=self.input_image_range,
                **frames_kwargs(prev_frame_size))
            lowres_cond_img = self.resize_to(
                lowres_cond_img, target_image_size,
                clamp_range=self.input_image_range,
                **frames_kwargs(target_frame_size))

            if self.per_sample_random_aug_noise_level:
                lowres_aug_times = self.lowres_noise_schedule_.sample_random_times(ak, b)
            else:
                lowres_aug_time = self.lowres_noise_schedule_.sample_random_times(ak, 1)
                lowres_aug_times = repeat(lowres_aug_time, '1 -> b', b=b)

        images = self.resize_to(images, target_image_size,
                                **frames_kwargs(target_frame_size))

        return self.p_losses(
            unet, variables, images, times, ek, noise_scheduler=noise_scheduler,
            text_embeds=text_embeds, text_mask=text_masks, cond_images=cond_images,
            lowres_cond_img=lowres_cond_img, lowres_aug_times=lowres_aug_times,
            pred_objective=pred_objective, min_snr_gamma=min_snr_gamma,
            random_crop_size=random_crop_size, **kwargs)

    __call__ = forward


def _get_encoded_dim(name):
    from imagen_tpu.models.t5 import get_encoded_dim
    return get_encoded_dim(name)
