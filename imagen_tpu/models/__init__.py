from imagen_tpu.models.unet2d import (
    Unet,
    NullUnet,
    BaseUnet64,
    SRUnet256,
    SRUnet1024,
)
