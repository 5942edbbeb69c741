"""RoIAlign — pure-XLA gather + bilinear, exact torchvision semantics.

Replaces the C++/CUDA `torchvision.ops.roi_align` used by the reference's
feature replay (grasp_any_region.py:335-342; hf_models/modeling_gar.py:389-396)
with a fully-vectorized JAX implementation:

  * `aligned=True` half-pixel convention (coords = box*scale - 0.5)
  * `sampling_ratio=2` fixed 2x2 sample grid per output bin
  * out-of-range sample points (y < -1 or y > H) contribute 0
  * boundary samples collapse to the last row/col (torchvision's
    `y_low >= H-1` branch)

Unlike the reference, which launches one roi_align per region in a Python
loop, this op is batched over all regions at once: boxes (R, 4) against a
single feature map -> (R, C, out_h, out_w). With static out 16x16 and
sampling_ratio 2 the gather footprint is 32x32x4 points/region — tiny, and
XLA fuses the whole thing into one kernel; no Pallas needed (it is gather
bound, not FLOP bound).

NOTE on the reference's calling convention: grasp_any_region.py:316-329
converts boxes to *feature* coordinates and then ALSO passes
spatial_scale=feat/orig to torchvision, so boxes are scaled twice (a bug the
released checkpoints were trained with). This op is the correct primitive;
the compat behavior lives in models/replay.py where both conventions are
supported.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample feat (C, H, W) at float points ys/xs (...,) -> (..., C).

    Exact torchvision `bilinear_interpolate` semantics.
    """
    c, h, w = feat.shape
    oob = (ys < -1.0) | (ys > h) | (xs < -1.0) | (xs > w)
    y = jnp.maximum(ys, 0.0)
    x = jnp.maximum(xs, 0.0)
    y_low = jnp.floor(y).astype(jnp.int32)
    x_low = jnp.floor(x).astype(jnp.int32)

    y_clamp = y_low >= h - 1
    x_clamp = x_low >= w - 1
    y_low = jnp.where(y_clamp, h - 1, y_low)
    x_low = jnp.where(x_clamp, w - 1, x_low)
    y_high = jnp.where(y_clamp, h - 1, y_low + 1)
    x_high = jnp.where(x_clamp, w - 1, x_low + 1)
    y = jnp.where(y_clamp, y_low.astype(y.dtype), y)
    x = jnp.where(x_clamp, x_low.astype(x.dtype), x)

    ly = y - y_low
    lx = x - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx

    fm = feat.reshape(c, h * w)  # gather on flattened spatial dim

    def take(yy, xx):
        idx = yy * w + xx  # (...,)
        return fm[:, idx.reshape(-1)].T.reshape(*idx.shape, c)

    v1 = take(y_low, x_low)
    v2 = take(y_low, x_high)
    v3 = take(y_high, x_low)
    v4 = take(y_high, x_high)
    out = (
        (hy * hx)[..., None] * v1
        + (hy * lx)[..., None] * v2
        + (ly * hx)[..., None] * v3
        + (ly * lx)[..., None] * v4
    )
    return jnp.where(oob[..., None], 0.0, out)


def roi_align(
    feat: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: tuple[int, int] = (16, 16),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """RoIAlign over one feature map.

    feat: (C, H, W) float32
    boxes: (R, 4) [x1, y1, x2, y2] in box coordinates (scaled by
        spatial_scale internally, like torchvision)
    Returns (R, C, out_h, out_w) float32.
    """
    assert sampling_ratio > 0, "adaptive sampling_ratio not supported (GAR uses 2)"
    feat = feat.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32)
    ph, pw = output_size
    sr = sampling_ratio
    offset = 0.5 if aligned else 0.0

    start_w = boxes[:, 0] * spatial_scale - offset  # (R,)
    start_h = boxes[:, 1] * spatial_scale - offset
    end_w = boxes[:, 2] * spatial_scale - offset
    end_h = boxes[:, 3] * spatial_scale - offset
    roi_w = end_w - start_w
    roi_h = end_h - start_h
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_h = roi_h / ph  # (R,)
    bin_w = roi_w / pw

    iy = (jnp.arange(sr, dtype=jnp.float32) + 0.5) / sr  # (sr,)
    py = jnp.arange(ph, dtype=jnp.float32)  # (ph,)
    # ys: (R, ph, sr)
    ys = start_h[:, None, None] + (py[None, :, None] + 0.0) * bin_h[:, None, None] \
        + iy[None, None, :] * bin_h[:, None, None]
    xs = start_w[:, None, None] + (py[None, :pw, None] + 0.0) * bin_w[:, None, None] \
        + iy[None, None, :] * bin_w[:, None, None]
    if pw != ph:
        px = jnp.arange(pw, dtype=jnp.float32)
        xs = start_w[:, None, None] + px[None, :, None] * bin_w[:, None, None] \
            + iy[None, None, :] * bin_w[:, None, None]

    # full sample grid: (R, ph, sr, pw, sr)
    yy = ys[:, :, :, None, None]
    xx = xs[:, None, None, :, :]
    yy, xx = jnp.broadcast_arrays(yy, xx)
    vals = _bilinear_gather(feat, yy, xx)  # (R, ph, sr, pw, sr, C)
    out = vals.mean(axis=(2, 4))  # (R, ph, pw, C)
    return out.transpose(0, 3, 1, 2)
