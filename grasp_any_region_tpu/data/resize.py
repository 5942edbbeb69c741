"""Host-side image resampling: separable bicubic (antialiased) and nearest.

The reference resizes with torchvision's tensor bicubic+antialias
(image_processing_perception_lm_fast.py:268-290, resample=BICUBIC) for RGB
and NEAREST for the prompt-id matrix (GraspAnyRegion_Dataset.py:123-128).
Both torchvision-antialias and PIL implement the same classic algorithm:
separable convolution with the Keys bicubic kernel (a = -0.5), filter
support scaled by the downsampling factor, weights normalized per output
pixel. This is an independent numpy implementation of that algorithm,
golden-tested against PIL in tests/test_data.py; resize_bicubic dispatches
to the multithreaded C++ version (native/resize.cc, same math) when the
native library is available.
"""

from __future__ import annotations

import numpy as np

_A = -0.5  # Keys cubic coefficient (PIL/torchvision convention)


def _cubic(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (_A + 2.0) * ax3 - (_A + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, _A * ax3 - 5.0 * _A * ax2 + 8.0 * _A * ax - 4.0 * _A, 0.0),
    )
    return w


def _axis_weights(in_size: int, out_size: int, antialias: bool = True):
    """Per-output-pixel (indices, weights) along one axis, PIL convention."""
    scale = in_size / out_size
    support = 2.0  # bicubic support
    filterscale = max(scale, 1.0) if antialias else 1.0
    support = support * filterscale
    ksize = int(np.ceil(support)) * 2 + 2

    out = np.arange(out_size, dtype=np.float64)
    center = (out + 0.5) * scale  # source-space center
    # PIL window convention: xmin = int(center - support + 0.5) clipped,
    # xmax = min(int(center + support + 0.5), in_size)
    xmin = np.floor(center - support + 0.5).astype(np.int64)
    xmin = np.clip(xmin, 0, None)
    xmax = np.minimum(np.floor(center + support + 0.5).astype(np.int64), in_size)
    sizes = xmax - xmin

    idx = xmin[:, None] + np.arange(ksize)[None, :]  # (out, ksize)
    valid = np.arange(ksize)[None, :] < sizes[:, None]
    idx_c = np.clip(idx, 0, in_size - 1)
    x = (idx + 0.5 - center[:, None]) / filterscale
    w = _cubic(x) * valid
    wsum = w.sum(axis=1, keepdims=True)
    wsum[wsum == 0] = 1.0
    w = w / wsum
    return idx_c, w.astype(np.float64)


def resize_bicubic(
    img: np.ndarray, out_h: int, out_w: int, antialias: bool = True,
    use_native: bool = True,
) -> np.ndarray:
    """img (H, W, C) or (H, W) float/uint8 -> (out_h, out_w[, C]) float64.

    Caller clamps/casts (PIL clamps uint8; the model pipeline keeps float).
    """
    if use_native:
        from .resize_native import resize_bicubic_native

        out = resize_bicubic_native(img, out_h, out_w, antialias)
        if out is not None:
            return out
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, c = img.shape
    data = img.astype(np.float64)

    # horizontal pass
    idx, wt = _axis_weights(w, out_w, antialias)
    data = _apply_axis(data, idx, wt, axis=1)
    # vertical pass
    idx, wt = _axis_weights(h, out_h, antialias)
    data = _apply_axis(data, idx, wt, axis=0)
    return data[:, :, 0] if squeeze else data


def _apply_axis(data: np.ndarray, idx: np.ndarray, wt: np.ndarray, axis: int) -> np.ndarray:
    """Weighted gather-sum along `axis`. data (H, W, C)."""
    if axis == 1:
        g = data[:, idx, :]  # (H, out, k, C)
        return np.einsum("hokc,ok->hoc", g, wt, optimize=True)
    g = data[idx, :, :]  # (out, k, W, C)
    return np.einsum("okwc,ok->owc", g, wt, optimize=True)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """PIL NEAREST convention: src = floor(dst * scale) with affine center
    mapping (matches PIL's (x + 0.5) * scale truncation)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) + 0.5) * (h / out_h), h - 1).astype(np.int64)
    xs = np.minimum((np.arange(out_w) + 0.5) * (w / out_w), w - 1).astype(np.int64)
    return img[ys[:, None], xs[None, :]]
