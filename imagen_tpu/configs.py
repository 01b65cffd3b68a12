"""Pydantic v2 config system.

Capability parity with the reference configs.py
(/root/reference/imagen_pytorch/configs.py:1-178): `extra="allow"` passthrough models
mirroring constructor kwargs, `.create()` builders that attach `_config` for
self-describing checkpoints, and the same JSON shape as `default_config.json`.

Fixed vs reference: `ImagenTrainerConfig.create` references an undefined `video`
variable upstream (configs.py:176) — here the flag is threaded properly.
"""
from __future__ import annotations

from enum import Enum
from typing import List, Optional, Tuple, Union

from pydantic import BaseModel, ConfigDict, model_validator

from imagen_tpu.models.t5 import DEFAULT_T5_NAME, get_encoded_dim


def ListOrTuple(inner_type):
    return Union[List[inner_type], Tuple[inner_type]]


def SingleOrList(inner_type):
    return Union[inner_type, ListOrTuple(inner_type)]


class NoiseSchedule(Enum):
    cosine = 'cosine'
    linear = 'linear'


class AllowExtraBaseModel(BaseModel):
    model_config = ConfigDict(extra='allow', use_enum_values=True)


class NullUnetConfig(BaseModel):
    is_null: bool

    def create(self):
        from imagen_tpu.models.unet2d import NullUnet
        return NullUnet()


class UnetConfig(AllowExtraBaseModel):
    dim: int
    dim_mults: ListOrTuple(int)
    text_embed_dim: int = get_encoded_dim(DEFAULT_T5_NAME)
    cond_dim: Optional[int] = None
    channels: int = 3
    attn_dim_head: int = 32
    attn_heads: int = 16

    def create(self):
        from imagen_tpu.models.unet2d import Unet
        return Unet(**_tuplify(self.model_dump()))


class Unet3DConfig(AllowExtraBaseModel):
    dim: int
    dim_mults: ListOrTuple(int)
    text_embed_dim: int = get_encoded_dim(DEFAULT_T5_NAME)
    cond_dim: Optional[int] = None
    channels: int = 3
    attn_dim_head: int = 32
    attn_heads: int = 16

    def create(self):
        from imagen_tpu.models.unet3d import Unet3D
        return Unet3D(**_tuplify(self.model_dump()))


def _tuplify(d):
    """Lists from JSON -> tuples (flax module attrs must be hashable)."""
    return {k: tuple(v) if isinstance(v, list) else v for k, v in d.items()}


def _build_unets(unet_configs, unets_kwargs, is_video):
    from imagen_tpu.models.unet2d import NullUnet, Unet
    unets = []
    for unet, unet_kwargs in zip(unet_configs, unets_kwargs):
        if isinstance(unet, NullUnetConfig):
            unets.append(NullUnet())
        elif is_video:
            from imagen_tpu.models.unet3d import Unet3D
            unets.append(Unet3D(**_tuplify(unet_kwargs)))
        else:
            unets.append(Unet(**_tuplify(unet_kwargs)))
    return unets


class ImagenConfig(AllowExtraBaseModel):
    unets: ListOrTuple(Union[UnetConfig, Unet3DConfig, NullUnetConfig])
    image_sizes: ListOrTuple(int)
    video: bool = False
    timesteps: SingleOrList(int) = 1000
    noise_schedules: SingleOrList(NoiseSchedule) = 'cosine'
    text_encoder_name: str = DEFAULT_T5_NAME
    channels: int = 3
    loss_type: str = 'l2'
    cond_drop_prob: float = 0.5

    @model_validator(mode='after')
    def check_image_sizes(self):
        if len(self.image_sizes) != len(self.unets):
            raise ValueError(
                f'image sizes length {len(self.image_sizes)} must match the '
                f'number of unets {len(self.unets)}')
        return self

    def create(self):
        from imagen_tpu.diffusion.imagen import Imagen
        decoder_kwargs = self.model_dump()
        unets_kwargs = decoder_kwargs.pop('unets')
        is_video = decoder_kwargs.pop('video', False)

        unets = _build_unets(self.unets, unets_kwargs, is_video)

        imagen = Imagen(tuple(unets), **_tuplify(decoder_kwargs))
        imagen._config = self.model_dump().copy()
        return imagen


class ElucidatedImagenConfig(AllowExtraBaseModel):
    unets: ListOrTuple(Union[UnetConfig, Unet3DConfig, NullUnetConfig])
    image_sizes: ListOrTuple(int)
    video: bool = False
    text_encoder_name: str = DEFAULT_T5_NAME
    channels: int = 3
    cond_drop_prob: float = 0.5
    num_sample_steps: SingleOrList(int) = 32
    sigma_min: SingleOrList(float) = 0.002
    sigma_max: SingleOrList(float) = 80
    sigma_data: SingleOrList(float) = 0.5
    rho: SingleOrList(float) = 7
    P_mean: SingleOrList(float) = -1.2
    P_std: SingleOrList(float) = 1.2
    S_churn: SingleOrList(float) = 80
    S_tmin: SingleOrList(float) = 0.05
    S_tmax: SingleOrList(float) = 50
    S_noise: SingleOrList(float) = 1.003

    @model_validator(mode='after')
    def check_image_sizes(self):
        if len(self.image_sizes) != len(self.unets):
            raise ValueError(
                f'image sizes length {len(self.image_sizes)} must match the '
                f'number of unets {len(self.unets)}')
        return self

    def create(self):
        from imagen_tpu.diffusion.elucidated import ElucidatedImagen
        decoder_kwargs = self.model_dump()
        unets_kwargs = decoder_kwargs.pop('unets')
        is_video = decoder_kwargs.pop('video', False)

        unets = _build_unets(self.unets, unets_kwargs, is_video)

        imagen = ElucidatedImagen(tuple(unets), **_tuplify(decoder_kwargs))
        imagen._config = self.model_dump().copy()
        return imagen


class ParallelConfig(BaseModel):
    """Declarative multi-chip layout — the config-file face of `parallel/mesh.py`.

    The reference delegates parallelism to Accelerate's environment (SURVEY.md
    §2.3), invisible to its config system; on TPU the mesh IS the strategy, so
    it belongs in the config: `{"trainer": {"parallel": {"data": 8, "fsdp":
    true}}}` gives a config/CLI user data parallelism + ZeRO-3 without writing
    any mesh code.

    - data: devices on the 'data' axis (None = all devices / `model`)
    - model: tensor-parallel axis size (Megatron column sharding of big kernels)
    - fsdp: ZeRO-3 — shard params+moments+EMA 1/data per device (True, or an
      int = min leaf size in elements to shard)
    - shard_optimizer_states: ZeRO-1 — shard only the optimizer moments
    """
    data: Optional[int] = None
    model: int = 1
    fsdp: Union[bool, int] = False
    shard_optimizer_states: Union[bool, int] = False

    def create_mesh(self):
        from imagen_tpu.parallel.mesh import create_mesh
        return create_mesh(data=self.data, model=self.model)

    def trainer_kwargs(self):
        return dict(mesh=self.create_mesh(), fsdp=self.fsdp,
                    shard_optimizer_states=self.shard_optimizer_states)


def apply_parallel(trainer_kwargs: dict) -> dict:
    """Pop a 'parallel' block (dict or ParallelConfig) out of trainer kwargs
    and expand it into mesh/fsdp/shard_optimizer_states — the ONE place the
    declarative block maps to ImagenTrainer kwargs (shared by
    `ImagenTrainerConfig.create` and the CLI's `_build_trainer`)."""
    parallel = trainer_kwargs.pop('parallel', None)
    if parallel is None:
        return trainer_kwargs
    if not isinstance(parallel, ParallelConfig):
        parallel = ParallelConfig(**parallel)
    trainer_kwargs.update(parallel.trainer_kwargs())
    return trainer_kwargs


class ImagenTrainerConfig(AllowExtraBaseModel):
    imagen: dict
    elucidated: bool = False
    video: bool = False
    use_ema: bool = True
    lr: SingleOrList(float) = 1e-4
    eps: SingleOrList(float) = 1e-8
    beta1: float = 0.9
    beta2: float = 0.99
    max_grad_norm: Optional[float] = None
    weight_decay: SingleOrList(float) = 0.0
    group_wd_params: bool = True
    warmup_steps: SingleOrList(Optional[int]) = None
    cosine_decay_max_steps: SingleOrList(Optional[int]) = None
    parallel: Optional[ParallelConfig] = None

    def create(self):
        from imagen_tpu.trainer import ImagenTrainer
        trainer_kwargs = self.model_dump()

        imagen_config = trainer_kwargs.pop('imagen')
        elucidated = trainer_kwargs.pop('elucidated')
        video = trainer_kwargs.pop('video')
        trainer_kwargs['parallel'] = self.parallel
        trainer_kwargs = apply_parallel(trainer_kwargs)

        imagen_config_klass = ElucidatedImagenConfig if elucidated else ImagenConfig
        imagen = imagen_config_klass(**{**imagen_config, 'video': video}).create()

        return ImagenTrainer(imagen, **trainer_kwargs)
