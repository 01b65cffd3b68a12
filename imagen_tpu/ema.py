"""Functional exponential moving average of parameters.

Capability parity with ema-pytorch's `EMA` as used by the reference trainer
(trainer.py:343-344, update at :923-925): same decay schedule
`1 - (1 + step/inv_gamma)^-power` clamped to [min_value, beta], `update_after_step`
warm-start copy, and `update_every` thinning — but expressed as a pure pytree update
that runs *inside* the jitted train step (the reference updates post-step on host).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class EMAConfig:
    beta: float = 0.9999
    update_after_step: int = 100
    update_every: int = 10
    inv_gamma: float = 1.0
    power: float = 2 / 3
    min_value: float = 0.0


def ema_decay(config: EMAConfig, step):
    """Current decay value given the number of EMA update calls so far."""
    epoch = jnp.clip((step - config.update_after_step - 1).astype(jnp.float32), min=0.)
    value = 1 - (1 + epoch / config.inv_gamma) ** -config.power
    value = jnp.where(epoch <= 0, 0., value)
    return jnp.clip(value, config.min_value, config.beta)


def ema_update(config: EMAConfig, ema_params, new_params, step):
    """One (possibly thinned) EMA update; pure, jit-safe.

    `step` counts calls to this function (the reference calls once per optimizer
    step). Non-update steps pass ema through unchanged; warm-start steps copy the
    online params (decay 0).
    """
    should_update = (step % config.update_every) == 0
    decay = ema_decay(config, step)

    def lerp(e, p):
        new_e = e * decay + p.astype(e.dtype) * (1 - decay)
        return jnp.where(should_update, new_e, e)

    return jax.tree_util.tree_map(lerp, ema_params, new_params)
