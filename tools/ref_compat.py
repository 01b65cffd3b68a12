"""Import the PyTorch reference (/root/reference) in-process for parity testing.

The test image lacks a few of the reference's heavyweight deps (beartype, kornia,
torchvision, ema-pytorch, pytorch-warmup). None of them participate in the code
paths the parity harness exercises (Unet.forward, Imagen.sample /
ElucidatedImagen.sample with precomputed text embeds), so minimal stand-ins are
installed into sys.modules before the reference package is imported:

- beartype: identity decorator + typing passthrough (reference uses it only as a
  runtime type checker, imagen_pytorch.py:4,2293).
- kornia.augmentation.RandomCrop: only constructed when random_crop_size is set
  (imagen_pytorch.py:2532-2546); the stub raises if actually used.
- torchvision.transforms.ToPILImage: only used for return_pil_images
  (imagen_pytorch.py:2496); stub raises if used.

This module NEVER copies reference code — it imports the reference itself as the
ground-truth oracle for numerical parity (BASELINE.md north star).
"""
from __future__ import annotations

import importlib.machinery
import sys
import types


def _stub_module(name):
    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec (used by transformers'
    # availability probes) doesn't choke on the stub
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod

REFERENCE_PATH = '/root/reference'


def _unused(name):
    def raiser(*a, **k):
        raise RuntimeError(f'{name} stub was called; parity harness should not reach it')
    return raiser


def _install_stubs():
    if 'beartype' not in sys.modules:
        bt = _stub_module('beartype')
        bt.beartype = lambda fn: fn
        bt_typing = _stub_module('beartype.typing')
        import typing
        for attr in dir(typing):
            if not attr.startswith('_'):
                setattr(bt_typing, attr, getattr(typing, attr))
        bt.typing = bt_typing
        sys.modules['beartype'] = bt
        sys.modules['beartype.typing'] = bt_typing

    if 'kornia' not in sys.modules:
        kornia = _stub_module('kornia')
        aug = _stub_module('kornia.augmentation')
        aug.RandomCrop = _unused('kornia.augmentation.RandomCrop')
        kornia.augmentation = aug
        sys.modules['kornia'] = kornia
        sys.modules['kornia.augmentation'] = aug

    if 'torchvision' not in sys.modules:
        tv = _stub_module('torchvision')
        transforms = _stub_module('torchvision.transforms')
        transforms.ToPILImage = _unused('torchvision.transforms.ToPILImage')
        transforms.Compose = _unused('torchvision.transforms.Compose')
        tv.transforms = transforms
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.transforms'] = transforms

    for name in ('ema_pytorch', 'pytorch_warmup'):
        if name not in sys.modules:
            mod = _stub_module(name)
            mod.EMA = _unused(f'{name}.EMA')
            sys.modules[name] = mod


def load_reference():
    """Returns the reference `imagen_pytorch` package, importing it on first call.

    Zero-egress environment: the reference evaluates
    `get_encoded_dim(DEFAULT_T5_NAME)` at class-definition time
    (imagen_pytorch.py:1117, imagen_video.py:1230), which normally fetches the
    T5 config from the HF hub. We import `imagen_pytorch.t5` alone first and
    pre-seed its `T5_CONFIGS` singleton cache with an offline T5Config carrying
    the known d_model (768 for t5-v1_1-base), so the package imports cleanly.
    """
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    # Load t5.py by file path (importing `imagen_pytorch.t5` normally would run
    # the package __init__ first, which is exactly what needs the seeded cache),
    # register it under its canonical name, and seed the singleton.
    if 'imagen_pytorch.t5' not in sys.modules:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            'imagen_pytorch.t5', f'{REFERENCE_PATH}/imagen_pytorch/t5.py')
        ref_t5 = importlib.util.module_from_spec(spec)
        sys.modules['imagen_pytorch.t5'] = ref_t5
        spec.loader.exec_module(ref_t5)
    else:
        ref_t5 = sys.modules['imagen_pytorch.t5']
    if ref_t5.DEFAULT_T5_NAME not in ref_t5.T5_CONFIGS:
        from transformers import T5Config
        ref_t5.T5_CONFIGS[ref_t5.DEFAULT_T5_NAME] = dict(
            config=T5Config(d_model=768))

    import imagen_pytorch  # noqa: the reference package
    return imagen_pytorch
