"""ctypes bindings for the native data-pipeline library (imagen_io.cpp).

Builds the shared library on demand with g++ (no pybind11 needed) and caches it next
to the source. Falls back gracefully (`available() == False`) when no toolchain or
libjpeg is present; callers (imagen_tpu.data) then use the PIL path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'imagen_io.cpp')
_LIB = os.path.join(_HERE, 'libimagen_io.so')

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = [
        'g++', '-O3', '-shared', '-fPIC', _SRC, '-o', _LIB,
        '-ljpeg', '-lpthread',
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.imagen_io_decode_one.restype = ctypes.c_int
            lib.imagen_io_decode_one.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float)]
            lib.imagen_io_decode_batch.restype = ctypes.c_int
            lib.imagen_io_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32)]
            _lib = lib
        except Exception:
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def jpeg_decode_resize(data: bytes, size: int, hflip: bool = False):
    """Decode one JPEG -> (size, size, 3) float32 [0,1] HWC, or None on failure."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((size, size, 3), np.float32)
    ok = lib.imagen_io_decode_one(
        data, len(data), size, int(hflip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if ok else None


def jpeg_decode_resize_batch(datas, size: int, hflips=None, num_threads=None):
    """Decode a list of JPEG byte strings -> ((n, size, size, 3) f32, ok mask)."""
    lib = _load()
    if lib is None:
        return None, None
    n = len(datas)
    num_threads = num_threads or min(os.cpu_count() or 1, 16)

    arr_t = ctypes.c_char_p * n
    ptrs = arr_t(*datas)
    lens = (ctypes.c_int64 * n)(*[len(d) for d in datas])
    flips = (ctypes.c_int32 * n)(
        *[int(f) for f in (hflips if hflips is not None else [0] * n)])
    out = np.empty((n, size, size, 3), np.float32)
    ok = np.empty((n,), np.int32)

    lib.imagen_io_decode_batch(
        ptrs, lens, n, size, flips, num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out, ok.astype(bool)
