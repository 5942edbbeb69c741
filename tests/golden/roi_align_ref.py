"""Independent numpy reference for RoIAlign with torchvision semantics.

Written from the published algorithm description (Mask R-CNN paper + the
torchvision op's documented `aligned=True` / `sampling_ratio` behavior), used
as the golden oracle for grasp_any_region_tpu.ops.roi_align.
"""

import numpy as np


def bilinear(feat, y, x):
    c, h, w = feat.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(c, feat.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low = int(np.floor(y))
    x_low = int(np.floor(x))
    if y_low >= h - 1:
        y_low = y_high = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_low = x_high = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    return (
        hy * hx * feat[:, y_low, x_low]
        + hy * lx * feat[:, y_low, x_high]
        + ly * hx * feat[:, y_high, x_low]
        + ly * lx * feat[:, y_high, x_high]
    )


def roi_align_np(feat, boxes, output_size, spatial_scale=1.0, sampling_ratio=2,
                 aligned=True):
    c = feat.shape[0]
    ph, pw = output_size
    out = np.zeros((len(boxes), c, ph, pw), np.float64)
    offset = 0.5 if aligned else 0.0
    for r, (x1, y1, x2, y2) in enumerate(boxes):
        sw = x1 * spatial_scale - offset
        sh = y1 * spatial_scale - offset
        ew = x2 * spatial_scale - offset
        eh = y2 * spatial_scale - offset
        roi_w, roi_h = ew - sw, eh - sh
        if not aligned:
            roi_w, roi_h = max(roi_w, 1.0), max(roi_h, 1.0)
        bin_h, bin_w = roi_h / ph, roi_w / pw
        for i in range(ph):
            for j in range(pw):
                acc = np.zeros(c, np.float64)
                for iy in range(sampling_ratio):
                    for ix in range(sampling_ratio):
                        y = sh + i * bin_h + (iy + 0.5) * bin_h / sampling_ratio
                        x = sw + j * bin_w + (ix + 0.5) * bin_w / sampling_ratio
                        acc += bilinear(feat.astype(np.float64), y, x)
                out[r, :, i, j] = acc / (sampling_ratio ** 2)
    return out
