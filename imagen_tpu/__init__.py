from imagen_tpu.version import __version__
