"""ctypes binding for the native bicubic resampler (native/resize.cc).

Shares libgar_native.so with the RLE codec (data/rle_native.py does the
build/load). ctypes releases the GIL for the call's duration, so the
PrefetchLoader's worker threads (data/loader.py) resize concurrently —
the same division of labor as the reference's torchvision C++ resize under
DataLoader workers (configs/gar_1b.py:110-120).
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from .rle_native import _load

_READY = False


def _lib() -> Optional[ctypes.CDLL]:
    global _READY
    lib = _load()
    if lib is None or not hasattr(lib, "gar_resize_bicubic"):
        return None
    if not _READY:
        lib.gar_resize_bicubic.restype = None
        lib.gar_resize_bicubic.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
        ]
        _READY = True
    return lib


def available() -> bool:
    return _lib() is not None


def resize_bicubic_native(
    img: np.ndarray, out_h: int, out_w: int,
    antialias: bool = True, n_threads: int = 0,
) -> Optional[np.ndarray]:
    """(H, W[, C]) any dtype -> (out_h, out_w[, C]) float64, or None when the
    native library is unavailable. Same math as data/resize.py."""
    lib = _lib()
    if lib is None:
        return None
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, c = img.shape
    src = np.ascontiguousarray(img, np.float64)
    out = np.empty((out_h, out_w, c), np.float64)
    lib.gar_resize_bicubic(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), out_h, out_w,
        1 if antialias else 0, n_threads,
    )
    return out[:, :, 0] if squeeze else out
