"""Fixed-shape sampling server: precompiled samplers + request padding.

A convenience wrapper beyond the reference (which only offers ad-hoc
`.sample()` calls) for latency-sensitive use of a trained cascade:

- loads a self-describing checkpoint (EMA weights preferred),
- warms up the per-stage compiled samplers at startup for a fixed serving
  batch size and each cond_scale in `cond_scales` (first-compile latency is
  minutes; serving requests must not pay it),
- pads incoming requests to the compiled batch size so every call hits the
  XLA executable cache (static shapes — no recompiles in steady state),
- optionally encodes raw text through the frozen T5 service,
- serializes device access with a lock so multiple threads can call
  `generate` safely.

Scope (honest): this is single-process, one request batch at a time — there
is no request queue, no dynamic batching across callers, and no
multi-replica routing. Warmup covers the text-conditional image/video path;
a request using an unwarmed `cond_scale` (or the cond_images / inpaint
paths, which this server does not expose) recompiles every stage on first
use. Put a real scheduler in front of it for production traffic.
"""
from __future__ import annotations

import threading

import jax
import jax.numpy as jnp
import numpy as np

from imagen_tpu.utils.helpers import cast_tuple, default, exists


class ImagenServer:
    """Fixed-shape sampling server around an (imagen, params) pair."""

    def __init__(self, imagen, params, *, batch_size=4, text_len=256,
                 cond_scale=3., cond_scales=None,
                 lowres_sample_noise_level=None, seed=0,
                 video_frames=8, warmup=True):
        self.imagen = imagen
        self.params = params
        self.batch_size = batch_size
        self.text_len = text_len
        self.cond_scale = cond_scale
        # every cond_scale the server should be able to serve without a
        # first-request compile stall; warmed at startup
        self.cond_scales = tuple(cast_tuple(default(cond_scales, cond_scale)))
        self.lowres_sample_noise_level = lowres_sample_noise_level
        self.video_frames = video_frames
        self.rng = jax.random.PRNGKey(seed)
        self._lock = threading.Lock()

        if warmup:
            self.warmup()

    @classmethod
    def from_checkpoint(cls, checkpoint_path, *, load_ema=True, **kwargs):
        from imagen_tpu.utils.load import load_imagen_from_checkpoint
        imagen, params = load_imagen_from_checkpoint(
            checkpoint_path, load_ema_if_available=load_ema)
        return cls(imagen, params, **kwargs)

    def warmup(self):
        """Compile every cascade stage for the serving shape at every warmed
        cond_scale (blocking)."""
        dummy_embeds = jnp.zeros(
            (self.batch_size, self.text_len, self.imagen.text_embed_dim))
        dummy_masks = jnp.ones((self.batch_size, self.text_len), bool)
        for scale in self.cond_scales:
            out = self._sample(
                dummy_embeds, dummy_masks, jax.random.PRNGKey(0), scale)
            jax.block_until_ready(out)
        return self

    def _sample(self, text_embeds, text_masks, key, cond_scale):
        kwargs = {}
        if self.imagen.is_video:
            kwargs['video_frames'] = self.video_frames
        return self.imagen.sample(
            self.params, key, text_embeds=text_embeds, text_masks=text_masks,
            cond_scale=cond_scale,
            lowres_sample_noise_level=self.lowres_sample_noise_level,
            use_tqdm=False, **kwargs)

    def _pad_request(self, text_embeds, text_masks):
        """Pad/truncate a request to the compiled (batch_size, text_len) shape."""
        n = text_embeds.shape[0]
        assert n <= self.batch_size, \
            f'request batch {n} exceeds serving batch {self.batch_size}; chunk it'

        t = text_embeds.shape[1]
        if t < self.text_len:
            text_embeds = jnp.pad(
                text_embeds, ((0, 0), (0, self.text_len - t), (0, 0)))
            text_masks = jnp.pad(
                text_masks, ((0, 0), (0, self.text_len - t)),
                constant_values=False)
        elif t > self.text_len:
            text_embeds = text_embeds[:, :self.text_len]
            text_masks = text_masks[:, :self.text_len]

        if n < self.batch_size:
            pad_n = self.batch_size - n
            text_embeds = jnp.concatenate(
                (text_embeds, jnp.zeros((pad_n, *text_embeds.shape[1:]),
                                        text_embeds.dtype)))
            # padding rows attend nothing real; keep one True to avoid all-masked rows
            pad_mask = jnp.zeros((pad_n, self.text_len), bool).at[:, 0].set(True)
            text_masks = jnp.concatenate((text_masks, pad_mask))
        return text_embeds, text_masks, n

    def generate(self, *, texts=None, text_embeds=None, text_masks=None,
                 key=None, cond_scale=None):
        """Sample images for up to `batch_size` prompts. Returns (n, H, W, C) in [0,1].

        `cond_scale` defaults to the server's; a value outside the warmed
        `cond_scales` still works but pays a first-use compile of every stage.
        """
        cond_scale = default(cond_scale, self.cond_scale)
        if exists(texts):
            assert not exists(text_embeds)
            from imagen_tpu.models.t5 import t5_encode_text
            text_embeds, text_masks = t5_encode_text(
                texts, name=self.imagen.text_encoder_name, return_attn_mask=True)

        assert exists(text_embeds), 'texts or text_embeds required'
        text_masks = default(
            text_masks, lambda: jnp.any(text_embeds != 0., axis=-1))

        text_embeds, text_masks, n = self._pad_request(
            jnp.asarray(text_embeds), jnp.asarray(text_masks))

        with self._lock:
            if key is None:
                self.rng, key = jax.random.split(self.rng)
            out = self._sample(text_embeds, text_masks, key, cond_scale)
        return np.asarray(out[:n])
