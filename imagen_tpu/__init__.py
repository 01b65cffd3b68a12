"""Public API surface, mirroring the reference __init__.py:1-21."""
from imagen_tpu.version import __version__

from imagen_tpu.models.unet2d import (
    Unet,
    NullUnet,
    BaseUnet64,
    SRUnet256,
    SRUnet1024,
)

from imagen_tpu.diffusion.imagen import Imagen
from imagen_tpu.diffusion.elucidated import ElucidatedImagen

from imagen_tpu.trainer import ImagenTrainer

from imagen_tpu.configs import (
    UnetConfig,
    Unet3DConfig,
    NullUnetConfig,
    ImagenConfig,
    ElucidatedImagenConfig,
    ImagenTrainerConfig,
    ParallelConfig,
)

from imagen_tpu.utils.load import load_imagen_from_checkpoint


def __getattr__(name):
    # lazy imports: video stack and serving runtime
    if name == 'Unet3D':
        from imagen_tpu.models.unet3d import Unet3D
        return Unet3D
    if name == 'ImagenServer':
        from imagen_tpu.serving import ImagenServer
        return ImagenServer
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
