"""ctypes binding for the native RLE codec (native/rle.cc).

Auto-builds the shared library on first use if a toolchain is present;
falls back silently to the numpy implementation (data/rle.py) otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_ROOT = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_ROOT, "libgar_native.so"))
    srcs = [
        os.path.abspath(os.path.join(_ROOT, f))
        for f in ("rle.cc", "resize.cc")
        if os.path.exists(os.path.join(_ROOT, f))
    ]
    stale = os.path.exists(so) and any(
        os.path.getmtime(s) > os.path.getmtime(so) for s in srcs
    )
    if (not os.path.exists(so)) or stale:
        if not srcs:
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 "-o", so] + srcs,
                check=True, capture_output=True,
            )
        except Exception:
            if not os.path.exists(so):
                return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.rle_decode_counts.restype = ctypes.c_longlong
    lib.rle_decode_counts.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
    ]
    lib.rle_runs_to_mask.restype = ctypes.c_int
    lib.rle_runs_to_mask.argtypes = [
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
        ctypes.c_longlong, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.rle_mask_to_runs.restype = ctypes.c_longlong
    lib.rle_mask_to_runs.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_rle_native(rle: Dict) -> Optional[np.ndarray]:
    """Native decode; returns None when the library is unavailable or the
    counts are already a list (nothing to accelerate)."""
    lib = _load()
    if lib is None:
        return None
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = counts.encode("ascii")
    if not isinstance(counts, (bytes, bytearray)):
        return None
    buf = bytes(counts)
    runs = np.zeros(len(buf) + 2, np.int64)
    m = lib.rle_decode_counts(
        buf, len(buf),
        runs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), len(runs),
    )
    if m < 0:
        raise ValueError(f"native counts decode failed ({m})")
    mask = np.zeros((h, w), np.uint8)
    rc = lib.rle_runs_to_mask(
        runs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), m,
        h, w, mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError("native RLE expansion failed: runs do not cover h*w")
    return mask


def encode_runs_native(mask: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    m8 = np.ascontiguousarray(mask, np.uint8)
    h, w = m8.shape
    out = np.zeros(h * w + 2, np.int64)
    m = lib.rle_mask_to_runs(
        m8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), len(out),
    )
    if m < 0:
        raise ValueError("native RLE encode overflow")
    return out[:m]
