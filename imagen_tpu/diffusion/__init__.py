from imagen_tpu.diffusion.imagen import Imagen, unet_forward_with_cond_scale
