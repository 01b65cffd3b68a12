"""ElucidatedImagen: cascaded EDM (Karras et al. 2022) diffusion, TPU-native.

Capability parity with the reference `ElucidatedImagen`
(/root/reference/imagen_pytorch/elucidated_imagen.py:77-941), redesigned for XLA like
`imagen_tpu.diffusion.imagen.Imagen`:

- Static config dataclass; params live outside; per-unet EDM hyperparams as a
  `Hparams` NamedTuple (reference :54-68,219-234).
- The stochastic churn + 2nd-order Heun sampler (reference :392-545) compiles to one
  `lax.scan` over (sigma, sigma_next, gamma) triples per stage; the Heun correction
  runs under `lax.cond` on sigma_next != 0; RePaint inpaint resampling is the inner
  `fori_loop`.
- Training: log-normal sigma draw, preconditioned forward, lambda(sigma) weighting
  (reference :761-940) as a pure loss function.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from einops import repeat

from imagen_tpu.diffusion.imagen import (
    Imagen,
    _per_sample_random_crop,
    unet_forward_with_cond_scale,
)
from imagen_tpu.models.unet2d import NullUnet, Unet
from imagen_tpu.ops import edm_math
from imagen_tpu.ops.diffusion_math import GaussianDiffusionContinuousTimes
from imagen_tpu.ops.edm_math import Hparams
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
)


@dataclass
class ElucidatedImagen:
    """Attribute names mirror the reference kwargs (elucidated_imagen.py:78-110)."""
    unets: Union[Unet, Sequence[Any]]
    image_sizes: Union[int, Tuple[int, ...]] = None
    text_encoder_name: str = 'google/t5-v1_1-base'
    text_embed_dim: Optional[int] = None
    channels: int = 3
    cond_drop_prob: float = 0.1
    random_crop_sizes: Union[None, int, Tuple[Optional[int], ...]] = None
    resize_mode: str = 'nearest'
    temporal_downsample_factor: Union[int, Tuple[int, ...]] = 1
    resize_cond_video_frames: bool = True
    lowres_sample_noise_level: float = 0.2
    per_sample_random_aug_noise_level: bool = False
    condition_on_text: bool = True
    auto_normalize_img: bool = True
    dynamic_thresholding: Union[bool, Tuple[bool, ...]] = True
    dynamic_thresholding_percentile: float = 0.95
    only_train_unet_number: Optional[int] = None
    lowres_noise_schedule: str = 'linear'
    num_sample_steps: Union[int, Tuple[int, ...]] = 32
    sigma_min: Union[float, Tuple[float, ...]] = 0.002
    sigma_max: Union[float, Tuple[float, ...]] = 80
    sigma_data: Union[float, Tuple[float, ...]] = 0.5
    rho: Union[float, Tuple[float, ...]] = 7
    P_mean: Union[float, Tuple[float, ...]] = -1.2
    P_std: Union[float, Tuple[float, ...]] = 1.2
    S_churn: Union[float, Tuple[float, ...]] = 80
    S_tmin: Union[float, Tuple[float, ...]] = 0.05
    S_tmax: Union[float, Tuple[float, ...]] = 50
    S_noise: Union[float, Tuple[float, ...]] = 1.003

    def __post_init__(self):
        self.unconditional = not self.condition_on_text

        unets = cast_tuple(self.unets)
        num_unets = len(unets)
        self.num_unets = num_unets

        self.random_crop_sizes = cast_tuple(self.random_crop_sizes, num_unets)
        assert not exists(first(self.random_crop_sizes)), \
            'random_crop_sizes should be None for the base unet'

        self.lowres_noise_schedule_ = GaussianDiffusionContinuousTimes(
            noise_schedule=self.lowres_noise_schedule)

        if self.condition_on_text:
            if not exists(self.text_embed_dim):
                from imagen_tpu.models.t5 import get_encoded_dim
                self.text_embed_dim = get_encoded_dim(self.text_encoder_name)
        else:
            self.text_embed_dim = None

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
        assert num_unets == len(self.image_sizes)

        self.sample_channels = cast_tuple(self.channels, num_unets)
        self.is_video = any(getattr(u, 'is_video_unet', False) for u in self.unets)

        lowres_conditions = tuple(u.lowres_cond for u in self.unets)
        assert lowres_conditions == (False, *((True,) * (num_unets - 1)))

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

        # per-unet EDM hyperparameters (reference :219-234)
        hparams = [
            self.num_sample_steps, self.sigma_min, self.sigma_max, self.sigma_data,
            self.rho, self.P_mean, self.P_std, self.S_churn, self.S_tmin,
            self.S_tmax, self.S_noise,
        ]
        hparams = [cast_tuple(hp, num_unets) for hp in hparams]
        self.hparams = [Hparams(*unet_hp) for unet_hp in zip(*hparams)]

        import functools
        if self.is_video:
            from imagen_tpu.models.video_blocks import resize_video_to
            self.resize_to = functools.partial(
                resize_video_to, method=self.resize_mode)
        else:
            self.resize_to = functools.partial(
                resize_image_to, method=self.resize_mode)

        self._stage_sample_cache = {}

    # shared plumbing borrowed from Imagen (identical attribute contracts)
    get_unet = Imagen.get_unet
    init_unet_params = Imagen.init_unet_params
    init_params = Imagen.init_params
    threshold_x_start = Imagen.threshold_x_start
    _calc_all_frame_dims = Imagen._calc_all_frame_dims
    encode_text = Imagen.encode_text
    force_unconditional_ = Imagen.force_unconditional_

    # --- preconditioning -----------------------------------------------------------------

    def preconditioned_network_forward(self, unet, variables, noised_images, sigma, *,
                                       sigma_data, clamp=False, dynamic_threshold=True,
                                       cond_scale=1., rngs=None, **kwargs):
        """EDM eq. (7) preconditioned denoiser; reference elucidated_imagen.py:340-369."""
        batch = noised_images.shape[0]
        if isinstance(sigma, float):
            sigma = jnp.full((batch,), sigma, dtype=noised_images.dtype)

        padded_sigma = right_pad_dims_to(noised_images, sigma)

        net_out = unet_forward_with_cond_scale(
            unet, variables,
            edm_math.c_in(sigma_data, padded_sigma) * noised_images,
            edm_math.c_noise(sigma),
            cond_scale=cond_scale, rngs=rngs, **kwargs)

        out = (edm_math.c_skip(sigma_data, padded_sigma) * noised_images
               + edm_math.c_out(sigma_data, padded_sigma) * net_out)

        if not clamp:
            return out
        return self.threshold_x_start(out, dynamic_threshold)

    def sample_schedule(self, num_sample_steps, rho, sigma_min, sigma_max):
        return edm_math.sample_schedule(num_sample_steps, rho, sigma_min, sigma_max)

    def loss_weight(self, sigma_data, sigma):
        return edm_math.loss_weight(sigma_data, sigma)

    def noise_distribution(self, key, P_mean, P_std, batch_size):
        return edm_math.noise_distribution(key, P_mean, P_std, batch_size)

    # --- one-stage sampler (compiled scan) -----------------------------------------------

    def _make_stage_sampler(self, unet_index, *, cond_scale, resample_times,
                            has_inpainting, skip_steps, has_init_images, has_text,
                            has_cond_images, sigma_min, sigma_max, clamp=True,
                            video_frames=None, has_cond_video_frames=False,
                            has_post_cond_video_frames=False,
                            has_noise_override=False,
                            has_eps_override=False,
                            has_repaint_override=False):
        unet = self.unets[unet_index]
        hp = self.hparams[unet_index]
        dynamic_threshold = self.dynamic_thresholding[unet_index]
        lowres_cond = unet.lowres_cond

        sigma_min = default(sigma_min, hp.sigma_min)
        sigma_max = default(sigma_max, hp.sigma_max)

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

            sigmas = self.sample_schedule(
                hp.num_sample_steps, hp.rho, sigma_min, sigma_max)
            gammas = edm_math.gammas_for_schedule(
                sigmas, hp.num_sample_steps, hp.S_churn, hp.S_tmin, hp.S_tmax)

            # init noise is always drawn at sigma_max (the UNSLICED schedule head),
            # even with skip_steps — matching the reference (elucidated_imagen.py:441-443
            # sets init_sigma = sigmas[0] before applying skip_steps).
            init_sigma = sigmas[0]

            sigma_arr = sigmas[:-1]
            sigma_next_arr = sigmas[1:]
            gamma_arr = gammas[:-1]
            if skip_steps:
                sigma_arr = sigma_arr[skip_steps:]
                sigma_next_arr = sigma_next_arr[skip_steps:]
                gamma_arr = gamma_arr[skip_steps:]

            init_ov = eps_ov = repaint_ov = None
            if isinstance(noise_override, (tuple, list)):
                init_ov, eps_ov, repaint_ov = noise_override
            elif noise_override is not None:
                init_ov = noise_override

            key, init_key = jax.random.split(key)
            if has_noise_override:
                images = init_sigma * init_ov
            else:
                images = init_sigma * jax.random.normal(init_key, shape)
            if has_init_images:
                images = images + init_images

            unet_kwargs = dict(
                sigma_data=hp.sigma_data, clamp=clamp,
                dynamic_threshold=dynamic_threshold, cond_scale=cond_scale)
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

            total_steps = sigma_arr.shape[0]

            # per-(t, r) host-fed draws for cross-framework parity: churn eps
            # and RePaint renoise, each (total_steps, resample_times, *shape),
            # consumed in the reference's draw order (elucidated_imagen.py
            # :489-494 churn, :533-536 repaint)
            if has_eps_override:
                assert eps_ov.shape == (total_steps, resample_times, *shape), \
                    (eps_ov.shape, (total_steps, resample_times, *shape))
            if has_repaint_override:
                assert repaint_ov.shape == (total_steps, resample_times, *shape), \
                    (repaint_ov.shape, (total_steps, resample_times, *shape))

            def step(carry, scanned):
                images, x_start, key = carry
                sigma = scanned['sigma']
                sigma_next = scanned['sigma_next']
                gamma = scanned['gamma']
                step_ind = scanned['ind']
                is_last_timestep = step_ind == (total_steps - 1)

                def resample_body(i, inner):
                    images, x_start, key = inner
                    r_is_last = i == (resample_times - 1)

                    key, ek = jax.random.split(key)
                    if has_eps_override:
                        eps = hp.S_noise * scanned['eps'][i]
                    else:
                        eps = hp.S_noise * jax.random.normal(ek, shape)  # stochastic churn

                    sigma_hat = sigma + gamma * sigma
                    added_noise = jnp.sqrt(
                        jnp.maximum(sigma_hat ** 2 - sigma ** 2, 0.)) * eps
                    images_hat = images + added_noise

                    self_cond = x_start if unet.self_cond else None

                    if has_inpainting:
                        images_hat = jnp.where(
                            inpaint_masks, inpaint_images + added_noise, images_hat)

                    model_output = self.preconditioned_network_forward(
                        unet, variables, images_hat, sigma_hat * jnp.ones(batch),
                        self_cond=self_cond, **unet_kwargs)

                    denoised_over_sigma = (images_hat - model_output) / sigma_hat
                    images_next = images_hat + (sigma_next - sigma_hat) * denoised_over_sigma

                    # Heun 2nd-order correction unless sigma_next == 0
                    def heun(_):
                        sc = model_output if unet.self_cond else None
                        model_output_next = self.preconditioned_network_forward(
                            unet, variables, images_next,
                            sigma_next * jnp.ones(batch),
                            self_cond=sc, **unet_kwargs)
                        denoised_prime = (images_next - model_output_next) / sigma_next
                        corrected = images_hat + 0.5 * (sigma_next - sigma_hat) * (
                            denoised_over_sigma + denoised_prime)
                        return corrected, model_output_next

                    def euler(_):
                        return images_next, model_output

                    images_out, x_start_out = jax.lax.cond(
                        sigma_next != 0, heun, euler, operand=None)

                    if has_inpainting and resample_times > 1:
                        key, rk = jax.random.split(key)
                        if has_repaint_override:
                            repaint_noise = scanned['repaint'][i]
                        else:
                            repaint_noise = jax.random.normal(rk, shape)
                        renoised = images_out + (sigma - sigma_next) * repaint_noise
                        renoise = jnp.logical_not(
                            jnp.logical_or(r_is_last, is_last_timestep))
                        images_out = jnp.where(renoise, renoised, images_out)

                    return (images_out, x_start_out, key)

                if resample_times > 1:
                    images, x_start, key = jax.lax.fori_loop(
                        0, resample_times, resample_body, (images, x_start, key))
                else:
                    images, x_start, key = resample_body(
                        resample_times - 1, (images, x_start, key))

                return (images, x_start, key), None

            x_start0 = jnp.zeros_like(images)
            xs = dict(sigma=sigma_arr, sigma_next=sigma_next_arr,
                      gamma=gamma_arr, ind=jnp.arange(total_steps))
            if has_eps_override:
                xs['eps'] = eps_ov
            if has_repaint_override:
                xs['repaint'] = repaint_ov
            (images, _, _), _ = jax.lax.scan(
                step, (images, x_start0, key), xs)

            images = jnp.clip(images, -1., 1.)
            if has_inpainting:
                images = jnp.where(inpaint_masks, inpaint_images, images)
            return self.unnormalize_img(images)

        return jax.jit(stage_sample, static_argnums=(2, 3))

    # --- public sampling -----------------------------------------------------------------

    def sample(
        self,
        params,
        key,
        *,
        texts=None,
        text_masks=None,
        text_embeds=None,
        cond_images=None,
        cond_video_frames=None,
        post_cond_video_frames=None,
        inpaint_videos=None,
        inpaint_images=None,
        inpaint_masks=None,
        inpaint_resample_times=5,
        init_images=None,
        skip_steps=None,
        sigma_min=None,
        sigma_max=None,
        video_frames=None,
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
        """Full-cascade EDM sampling; reference elucidated_imagen.py:549-751.

        `noise_override`: per-stage list (entries may be None) consumed instead
        of PRNG draws — parity/repro harness hook. Each entry is either a
        unit-normal INIT noise array (the schedule's sigma_max scaling is
        applied inside), or a dict with optional keys:
          'init':    (*shape) init draw,
          'eps':     (num_steps, resample_times, *shape) per-(t, r) churn draws
                     (reference elucidated_imagen.py:489-494; S_noise applied
                     inside),
          'repaint': (num_steps, resample_times, *shape) per-(t, r) RePaint
                     renoise draws (reference :533-536)."""
        cond_images = maybe(cast_uint8_images_to_float)(cond_images)

        if exists(texts) and not exists(text_embeds) and not self.unconditional:
            from imagen_tpu.models.t5 import t5_encode_text
            text_embeds, text_masks = t5_encode_text(
                texts, name=self.text_encoder_name, return_attn_mask=True)

        if not self.unconditional:
            assert exists(text_embeds)
            text_masks = default(
                text_masks, lambda: jnp.any(text_embeds != 0., axis=-1))
            batch_size = text_embeds.shape[0]
            assert text_embeds.shape[-1] == self.text_embed_dim
        else:
            assert not exists(text_embeds)

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
        sigma_min = cast_tuple(sigma_min, num_unets)
        sigma_max = cast_tuple(sigma_max, num_unets)

        if noise_override is None:
            noise_override = (None,) * num_unets
        assert len(noise_override) == num_unets, \
            'noise_override must be a per-stage list (entries may be None)'

        if self.is_video and exists(inpaint_images):
            video_frames = inpaint_images.shape[1]
            if inpaint_masks.ndim == 3:
                inpaint_masks = jnp.repeat(
                    inpaint_masks[:, None], video_frames, axis=1)
            assert inpaint_masks.shape[1] == video_frames

        assert not (self.is_video and not exists(video_frames)), \
            'video_frames must be passed for a video imagen'
        all_frame_dims = self._calc_all_frame_dims(video_frames)

        img = None
        if start_at_unet_number > 1:
            assert start_at_unet_number <= num_unets
            assert exists(start_image_or_video)
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
                desc='sampling cascade (EDM)', total=num_unets):
            if unet_number < start_at_unet_number:
                continue
            index = unet_number - 1
            unet = self.unets[index]
            assert not isinstance(unet, NullUnet), 'cannot sample from null unet'

            image_size = self.image_sizes[index]
            variables = params[index]
            if offload_inactive_unets:
                # just-in-time device copy of the active stage only (see
                # Imagen.sample; reference one_unet_in_gpu analog)
                from imagen_tpu.parallel.mesh import device_restore
                variables = device_restore(variables)
            frame_dim = all_frame_dims[index] if self.is_video else None
            resize_kwargs = (
                dict(target_frames=frame_dim) if self.is_video else {})

            # static fold_in instead of an eager 3-way split: see imagen.py's
            # stage loop — eager PRNG ops cost host<->device round trips per stage
            stage_key = jax.random.fold_in(key, index) if unet.lowres_cond else key

            stage_cond_video_frames = cond_video_frames
            stage_post_cond_video_frames = post_cond_video_frames
            if self.is_video and self.resize_cond_video_frames:
                import functools
                from imagen_tpu.models.video_blocks import scale_video_time
                ds = self.temporal_downsample_factor[index]
                stage_cond_video_frames = maybe(
                    functools.partial(scale_video_time, downsample_scale=ds)
                )(stage_cond_video_frames)
                stage_post_cond_video_frames = maybe(
                    functools.partial(scale_video_time, downsample_scale=ds)
                )(stage_post_cond_video_frames)

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

            # normalize the override entry to an (init, eps, repaint) triple
            stage_override = noise_override[index]
            if isinstance(stage_override, dict):
                stage_override = (stage_override.get('init'),
                                  stage_override.get('eps'),
                                  stage_override.get('repaint'))
            elif exists(stage_override):
                stage_override = (stage_override, None, None)
            else:
                stage_override = (None, None, None)
            override_flags = tuple(exists(x) for x in stage_override)

            cache_key = (index, cond_scale[index], resample_times, has_inpainting,
                         skip_steps[index], exists(unet_init_images),
                         not self.unconditional, exists(cond_images),
                         sigma_min[index], sigma_max[index], frame_dim,
                         exists(stage_cond_video_frames),
                         exists(stage_post_cond_video_frames),
                         override_flags)
            if cache_key not in self._stage_sample_cache:
                self._stage_sample_cache[cache_key] = self._make_stage_sampler(
                    index, cond_scale=cond_scale[index],
                    resample_times=resample_times, has_inpainting=has_inpainting,
                    skip_steps=skip_steps[index],
                    has_init_images=exists(unet_init_images),
                    has_text=not self.unconditional,
                    has_cond_images=exists(cond_images),
                    sigma_min=sigma_min[index], sigma_max=sigma_max[index],
                    video_frames=frame_dim,
                    has_cond_video_frames=exists(stage_cond_video_frames),
                    has_post_cond_video_frames=exists(stage_post_cond_video_frames),
                    has_noise_override=override_flags[0],
                    has_eps_override=override_flags[1],
                    has_repaint_override=override_flags[2])
            stage_fn = self._stage_sample_cache[cache_key]

            img = stage_fn(
                variables, stage_key, batch_size, image_size, text_embeds, text_masks,
                cond_images, lowres_cond_img, lowres_noise_times,
                stage_inpaint_images, stage_inpaint_masks, unet_init_images,
                stage_cond_video_frames, stage_post_cond_video_frames,
                stage_override)

            outputs.append(img)
            if offload_inactive_unets:
                variables = None  # free the stage's device copy

            if exists(stop_at_unet_number) and stop_at_unet_number == unet_number:
                break

        output_index = -1 if not return_all_unet_outputs else slice(None)

        if not return_pil_images:
            return outputs[output_index]

        if not return_all_unet_outputs:
            outputs = outputs[-1:]

        if self.is_video:
            # per-video lists of per-frame PIL images; see
            # imagen_tpu.utils.video_io.save_video(s) for .gif/.mp4/.npy export
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

    # --- training ------------------------------------------------------------------------

    def forward(self, params, images, key, *, unet_number=None, texts=None,
                text_embeds=None, text_masks=None, cond_images=None,
                sigmas=None, noise=None, **kwargs):
        """EDM training loss; reference elucidated_imagen.py:761-940.

        `sigmas`/`noise` override the log-normal sigma draw and the unit noise
        (parity/repro harness hooks — the cross-framework tests feed identical
        host-drawn values to this loss and the torch reference)."""
        assert not (self.num_unets > 1 and not exists(unet_number))
        unet_number = default(unet_number, 1)
        assert not exists(self.only_train_unet_number) or \
            self.only_train_unet_number == unet_number

        unet_index = unet_number - 1
        unet = self.unets[unet_index]
        variables = params[unet_index] if isinstance(params, (tuple, list)) else params
        assert not isinstance(unet, NullUnet), 'NullUnet cannot be trained'

        # still images into a video model (reference elucidated_imagen.py:772-774)
        if self.is_video and images.ndim == 4:
            images = images[:, None]
            kwargs['ignore_time'] = True

        images = cast_uint8_images_to_float(images)
        cond_images = maybe(cast_uint8_images_to_float)(cond_images)

        assert images.shape[-2] == images.shape[-3]
        assert images.shape[-1] == self.channels

        target_image_size = self.image_sizes[unet_index]
        random_crop_size = self.random_crop_sizes[unet_index]
        prev_image_size = self.image_sizes[unet_index - 1] if unet_index > 0 else None
        hp = self.hparams[unet_index]

        batch_size = images.shape[0]
        assert images.shape[-2] >= target_image_size

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

        if self.is_video and self.resize_cond_video_frames:
            from imagen_tpu.models.video_blocks import scale_video_time
            ds = self.temporal_downsample_factor[unet_index]
            for k in ('cond_video_frames', 'post_cond_video_frames'):
                if k in kwargs and exists(kwargs[k]):
                    kwargs[k] = scale_video_time(kwargs[k], downsample_scale=ds)

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

        key, ak, sk, nk, ck, sck, cdk, cdk2 = jax.random.split(key, 8)

        # lowres conditioning (degrade-resize) + aug times
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
                lowres_aug_times = self.lowres_noise_schedule_.sample_random_times(
                    ak, batch_size)
            else:
                lowres_aug_time = self.lowres_noise_schedule_.sample_random_times(ak, 1)
                lowres_aug_times = repeat(lowres_aug_time, '1 -> b', b=batch_size)

        images = self.resize_to(images, target_image_size,
                                **frames_kwargs(target_frame_size))

        images = self.normalize_img(images)
        lowres_cond_img = maybe(self.normalize_img)(lowres_cond_img)

        if exists(random_crop_size):
            is_video_x = images.ndim == 5
            nframes = images.shape[1] if is_video_x else None

            def fold(t):
                return (t.reshape(-1, *t.shape[2:])
                        if is_video_x and exists(t) else t)

            def unfold(t):
                return (t.reshape(-1, nframes, *t.shape[1:])
                        if is_video_x and exists(t) else t)

            if exists(lowres_cond_img):
                cropped = _per_sample_random_crop(
                    ck, (fold(images), fold(lowres_cond_img)), random_crop_size)
                images, lowres_cond_img = unfold(cropped[0]), unfold(cropped[1])
            else:
                (cropped,) = _per_sample_random_crop(
                    ck, (fold(images),), random_crop_size)
                images = unfold(cropped)

        lowres_cond_img_noisy = None
        if exists(lowres_cond_img):
            key, lrk = jax.random.split(key)
            lowres_cond_img_noisy, *_ = self.lowres_noise_schedule_.q_sample(
                lowres_cond_img, lowres_aug_times,
                jax.random.normal(lrk, lowres_cond_img.shape, lowres_cond_img.dtype))

        # log-normal sigma draw + noising (alphas are 1 in EDM)
        sigmas = default(sigmas, lambda: self.noise_distribution(
            sk, hp.P_mean, hp.P_std, batch_size))
        padded_sigmas = right_pad_dims_to(images, sigmas)

        noise = default(noise, lambda: jax.random.normal(
            nk, images.shape, images.dtype))
        noised_images = images + padded_sigmas * noise

        unet_kwargs = dict(
            sigma_data=hp.sigma_data,
            text_embeds=text_embeds,
            text_mask=text_masks,
            cond_images=cond_images,
            lowres_noise_times=self.lowres_noise_schedule_.get_condition(
                lowres_aug_times),
            lowres_cond_img=lowres_cond_img_noisy,
            cond_drop_prob=self.cond_drop_prob,
            **kwargs,
        )
        unet_kwargs = {k: v for k, v in unet_kwargs.items()
                       if exists(v) or k in ('cond_drop_prob',)}

        # self-conditioning coin flip (reference :911-921)
        if unet.self_cond:
            # distinct keys per rng collection (see imagen.p_losses)
            sc_drop_key, sc_dropout_key = jax.random.split(cdk2)

            def compute_self_cond(_):
                pred_x0 = self.preconditioned_network_forward(
                    unet, variables, noised_images, sigmas,
                    deterministic=False,
                    rngs={'cond_drop': sc_drop_key, 'dropout': sc_dropout_key},
                    **unet_kwargs)
                return jax.lax.stop_gradient(pred_x0)

            flip = jax.random.bernoulli(sck)
            unet_kwargs['self_cond'] = jax.lax.cond(
                flip, compute_self_cond,
                lambda _: jnp.zeros_like(noised_images), operand=None)

        denoised_images = self.preconditioned_network_forward(
            unet, variables, noised_images, sigmas,
            deterministic=False,
            rngs={'cond_drop': cdk, 'dropout': key}, **unet_kwargs)

        losses = (denoised_images.astype(jnp.float32)
                  - images.astype(jnp.float32)) ** 2
        losses = jnp.mean(losses.reshape(losses.shape[0], -1), axis=-1)
        losses = losses * self.loss_weight(hp.sigma_data, sigmas)
        return jnp.mean(losses)

    __call__ = forward
