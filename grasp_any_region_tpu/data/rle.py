"""COCO run-length-encoded mask codec, pure numpy.

Replaces the pycocotools C extension used throughout the reference
(GraspAnyRegion_Dataset.py:252-263, GAR-Bench/inference.py:137-139) for the
data plane. Implements the COCO format from its public spec:

  * masks flatten column-major (Fortran order)
  * `counts` alternates runs of 0s / 1s, starting with the 0-run
  * compressed counts use 5-bit continuation chunks offset by 48 ('0'),
    with values beyond the first two delta-encoded against counts[i-2]

Vectorized run-length extraction; the LEB-style codec loops only over runs
(thousands at most). A C++ extension for bulk decode lives in
native/ (optional speedup; this is the reference implementation).
"""

from __future__ import annotations

from typing import Dict, List, Union

import numpy as np


def _decode_counts(data: bytes) -> List[int]:
    counts: List[int] = []
    i = 0
    n = len(data)
    while i < n:
        x = 0
        k = 0
        more = True
        while more:
            c = data[i] - 48
            i += 1
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[len(counts) - 2]
        counts.append(x)
    return counts


def _encode_counts(counts: List[int]) -> bytes:
    out = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            if c & 0x10:
                more = x != -1
            else:
                more = x != 0
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


def decode_rle(rle: Dict, use_native: bool = True) -> np.ndarray:
    """COCO RLE dict -> (H, W) uint8 mask.

    Compressed counts route through the C++ codec when built
    (native/rle.cc via data/rle_native.py); numpy otherwise."""
    if use_native:
        from .rle_native import decode_rle_native

        try:
            out = decode_rle_native(rle)
            if out is not None:
                return out
        except ValueError:
            raise
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = counts.encode("ascii")
    if isinstance(counts, (bytes, bytearray)):
        counts = _decode_counts(bytes(counts))
    counts = np.asarray(counts, np.int64)
    total = int(counts.sum())
    assert total == h * w, f"RLE covers {total} pixels, expected {h * w}"
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    return flat.reshape((h, w), order="F")


def encode_rle(mask: np.ndarray, compress: bool = True) -> Dict:
    """(H, W) binary mask -> COCO RLE dict."""
    h, w = mask.shape
    flat = np.asarray(mask, np.uint8).reshape(-1, order="F")
    # run boundaries
    changes = np.nonzero(np.diff(flat))[0] + 1
    boundaries = np.concatenate([[0], changes, [flat.size]])
    runs = np.diff(boundaries).tolist()
    if flat.size and flat[0] == 1:
        runs = [0] + runs
    if not flat.size:
        runs = [0]
    if compress:
        return {"size": [h, w], "counts": _encode_counts([int(r) for r in runs])}
    return {"size": [h, w], "counts": [int(r) for r in runs]}


def rle_area(rle: Dict) -> int:
    m = decode_rle(rle)
    return int(m.sum())


def decode_any(rle_or_list: Union[Dict, List[Dict]]) -> List[np.ndarray]:
    """Mirror the reference's list-or-dict handling
    (GraspAnyRegion_Dataset.py:252-263)."""
    if isinstance(rle_or_list, dict):
        return [decode_rle(rle_or_list)]
    return [decode_rle(r) for r in rle_or_list]


def polygon_to_mask(polygons: List[List[float]], height: int, width: int) -> np.ndarray:
    """COCO polygon segmentation -> (H, W) binary mask.

    Replaces pycocotools frPyObjects+merge+decode (Ferret-Bench/inference.py
    :68-72). Even-odd scanline fill at pixel centers, union over polygon
    parts. Boundary pixels may differ from pycocotools by <=1 px (COCO
    rasterizes a 5x-upsampled boundary), which is below the 28-px feature
    granularity the masks feed into.
    """
    mask = np.zeros((height, width), np.uint8)
    ys = np.arange(height) + 0.5
    for poly in polygons:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)  # (N, 2) x,y
        if len(pts) < 3:
            continue
        x0 = pts[:, 0]
        y0 = pts[:, 1]
        x1 = np.roll(x0, -1)
        y1 = np.roll(y0, -1)
        # for each scanline, find x-crossings of each edge
        with np.errstate(divide="ignore", invalid="ignore"):
            # edge crosses scanline yc if min(y0,y1) <= yc < max(y0,y1)
            cond = ((y0[None, :] <= ys[:, None]) & (y1[None, :] > ys[:, None])) | (
                (y1[None, :] <= ys[:, None]) & (y0[None, :] > ys[:, None])
            )
            t = (ys[:, None] - y0[None, :]) / (y1[None, :] - y0[None, :])
            xs = x0[None, :] + t * (x1[None, :] - x0[None, :])
        for row in range(height):
            cross = np.sort(xs[row][cond[row]])
            for a, b in zip(cross[0::2], cross[1::2]):
                lo = int(np.ceil(a - 0.5))
                hi = int(np.ceil(b - 0.5))
                if hi > lo:
                    mask[row, max(lo, 0) : min(hi, width)] = 1
    return mask


def segmentation_to_mask(seg, height: int, width: int) -> np.ndarray:
    """Any COCO segmentation (RLE dict, uncompressed dict, or polygon list)."""
    if isinstance(seg, dict):
        return decode_rle(seg)
    return polygon_to_mask(seg, height, width)
